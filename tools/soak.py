#!/usr/bin/env python
"""Cross-format soak: the paper's core correctness check, automated.

The reference validates itself by observing that all four formats return
the same match count for the same query (SURVEY §4). This tool synthesizes
a dataset, runs the full experiment grid (bbox S/L/XL x {full, density},
class {6, 19}, GPS-time range) through the REAL engine for every format,
and asserts:

  - all four formats agree on every cell
  - full bbox cells also match an independent NumPy f64 oracle
  - density cells match the exact reference-math key oracle

Usage: python tools/soak.py [--points-per-file N] [--files K] [--tpu]
(defaults run on CPU; --tpu uses whatever jax.default_backend() is)
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--points-per-file", type=int, default=300_000)
    parser.add_argument("--files", type=int, default=3)
    parser.add_argument("--tpu", action="store_true",
                        help="run on the default backend instead of forcing CPU")
    parser.add_argument("--block-size", type=int, default=65_536)
    args = parser.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from adhoc_queries_pointclouds_tpu.engine import run_query
    from adhoc_queries_pointclouds_tpu.formats import open_point_cloud, synth
    from adhoc_queries_pointclouds_tpu.models.query import (
        BoundsQuery, ClassQuery, DensityConfig, QueryPlan, TimeRangeQuery,
    )
    from adhoc_queries_pointclouds_tpu.ops.density import GridSpec3D
    from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

    formats = ("las", "laz", "last", "lazer")
    root = Path(tempfile.mkdtemp(prefix="aqpc_soak_"))
    print(f"synthesizing {args.files} x {args.points_per_file} points "
          f"(point format 1: gps) in {root}...", file=sys.stderr)
    files = synth.write_dataset(
        root, n_files=args.files, points_per_file=args.points_per_file,
        seed=12345, formats=formats, point_format=1,
    )

    worlds, gps = [], []
    for p in files["las"]:
        r = open_point_cloud(p)
        worlds.append(r.positions_world())
        gps.append(r.column("gps_time").copy())
        r.close()
    total = np.concatenate(worlds)
    tmin, tmax = total.min(axis=0), total.max(axis=0)
    span = tmax - tmin

    boxes = {
        "s": AABB(tuple(tmin + 0.40 * span), tuple(tmin + 0.48 * span)),
        "l": AABB(tuple(tmin + 0.10 * span), tuple(tmin + 0.70 * span)),
        "xl": AABB(tuple(tmin - 0.01 * span), tuple(tmax + 0.01 * span)),
    }
    cell = float(span.max() / 23.0)
    allg = np.concatenate(gps)
    t0q, t1q = float(np.quantile(allg, 0.2)), float(np.quantile(allg, 0.8))

    cells_run = 0
    failures = 0
    t_start = time.perf_counter()

    def run_cell(name, plan, oracle=None):
        nonlocal cells_run, failures
        counts = {}
        for fmt in formats:
            res = run_query(root / fmt, plan, block_size=args.block_size,
                            use_index=False)
            counts[fmt] = res.match_count
        agree = len(set(counts.values())) == 1
        ok = agree and (oracle is None or counts["las"] == oracle)
        cells_run += 1
        if not ok:
            failures += 1
        state = "OK " if ok else "FAIL"
        want = f" oracle={oracle}" if oracle is not None else ""
        print(f"{state} {name}: {counts}{want}")

    for size, box in boxes.items():
        oracle = sum(int(np.sum(box.contains_points(w))) for w in worlds)
        run_cell(f"bbox_{size}_full", QueryPlan(bounds=BoundsQuery(box)), oracle)
        grid = GridSpec3D.create(box, cell)
        keys = []
        for w in worlds:
            m = box.contains_points(w)
            if m.any():
                k, _ = grid.exact_keys_d2(w[m])
                keys.append(k)
        density_oracle = len(np.unique(np.concatenate(keys))) if keys else 0
        run_cell(
            f"bbox_{size}_lod",
            QueryPlan(bounds=BoundsQuery(box), density=DensityConfig(cell)),
            density_oracle,
        )
    for cls in (6, 19):
        oracle = 0
        for p in files["las"]:
            r = open_point_cloud(p)
            oracle += int(np.sum(r.column("classification") == cls))
            r.close()
        run_cell(f"class_{cls}", QueryPlan(classification=ClassQuery(cls)), oracle)
    time_oracle = int(np.count_nonzero((allg >= t0q) & (allg < t1q)))
    run_cell("time_range", QueryPlan(time_range=TimeRangeQuery(t0q, t1q)),
             time_oracle)

    dt = time.perf_counter() - t_start
    print(f"\n{cells_run} cells x {len(formats)} formats in {dt:.1f}s, "
          f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
