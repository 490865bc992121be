"""Real 2-process jax.distributed parity run (CPU backend, gloo collectives).

The reference's only parallelism is a single-process rayon fan-out
(/root/reference/query/src/main.rs:146-183); SURVEY §2.5 lifts that to
multi-host. parallel/distributed.py is the lift, but until this harness its
cross-process paths (_allreduce_max/_allreduce_sum/_allgather_keys,
jax.make_array_from_process_local_data across a process boundary, per-host
shard readback in distributed_collect) only ever ran with process_count==1,
where they short-circuit. This script actually runs them: it spawns TWO
worker processes, each with 4 forced CPU devices, joined via
`jax.distributed.initialize("127.0.0.1:<port>", num_processes=2)` — an
8-device global mesh spanning a real process boundary — and asserts exact
parity with the single-process engine for every query kind:

  - bbox / class / GPS-time counts   (global-mesh psum over gloo)
  - bbox collect + writeback         (per-host shard readback; disjoint
                                      per-host LAS outputs whose union is
                                      exactly the single-process hit set)
  - density file-scope               (count all-reduce)
  - density global-scope             (winner-key all-gather + union)
  - density with no bbox             (grid from the GLOBAL header union)
  - sidecar-index pruning            (clustered + indexed manifest: the
                                      unified engine path must skip blocks
                                      on BOTH hosts, counts unchanged)
  - density global write-back        (cross-host winner resolution; the
                                      union of per-host dumps equals the
                                      single-process winner point set)

Usage:
  python tools/dist2.py                 # parent: generate, spawn, verify
  python tools/dist2.py --json OUT      # also dump a machine-readable report

Exit 0 = all parity assertions passed in a genuine 2-process run.
Used by tests/test_dist2.py (which skips gracefully where distributed CPU
init is unavailable).
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

BOX = ((100200.0, 200300.0, 10.0), (102900.0, 200900.0, 70.0))
TIME_RANGE = (100_000.0, 700_000.0)
CLASS = 6
DENSITY_CELL = 50.0
DENSITY_CELL_NOBOX = 150.0
BLOCK = 1 << 14
# clustered + indexed manifest: a corner box over Morton-ordered files so
# the sidecar index can actually skip blocks
SMALL_BOX = ((100650.0, 200650.0, 0.0), (100980.0, 200980.0, 100.0))
BLOCK_IDX = 1 << 12


def free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


# ----------------------------------------------------------------- worker --

WORKER_BODY = r"""
import json, os, sys
# 4 forced CPU devices per process -> 8-device global mesh over 2 processes
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    ).strip() + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

cfg = json.loads(sys.argv[1])
jax.distributed.initialize(
    f"127.0.0.1:{cfg['port']}", num_processes=2, process_id=cfg["pid"]
)
assert jax.process_count() == 2, "not a real multi-process run"
assert jax.device_count() == 8 and jax.local_device_count() == 4

from pathlib import Path
from adhoc_queries_pointclouds_tpu.models.query import (
    BoundsQuery, ClassQuery, DensityConfig, QueryPlan, TimeRangeQuery,
)
from adhoc_queries_pointclouds_tpu.parallel import distributed
from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

data = Path(cfg["data"])
box = AABB(tuple(cfg["box"][0]), tuple(cfg["box"][1]))
out = {}

out["bbox_count"] = distributed.distributed_count(
    data, QueryPlan(bounds=BoundsQuery(box)), block_size=cfg["block"]
)
out["class_count"] = distributed.distributed_count(
    data, QueryPlan(classification=ClassQuery(cfg["cls"])), block_size=cfg["block"]
)
out["time_count"] = distributed.distributed_count(
    data, QueryPlan(time_range=TimeRangeQuery(*cfg["time"])), block_size=cfg["block"]
)

out_dir = Path(cfg["out_dir"]) / f"host{cfg['pid']}"
out_dir.mkdir(parents=True, exist_ok=True)
total, emitter = distributed.distributed_collect(
    data, QueryPlan(bounds=BoundsQuery(box), output_dir=out_dir),
    block_size=cfg["block"], output_dir=out_dir,
)
out["collect_total"] = total
out["collect_files"] = [str(p) for p in emitter.output_files]

out["density_file"] = distributed.distributed_density(
    data, QueryPlan(bounds=BoundsQuery(box),
                    density=DensityConfig(cfg["cell"], "file")),
    block_size=cfg["block"],
)
out["density_global"] = distributed.distributed_density(
    data, QueryPlan(bounds=BoundsQuery(box),
                    density=DensityConfig(cfg["cell"], "global")),
    block_size=cfg["block"],
)
# no bbox: shared grid must come from the union of ALL hosts' headers
out["density_nobox"] = distributed.distributed_density(
    data, QueryPlan(classification=ClassQuery(cfg["cls"]),
                    density=DensityConfig(cfg["cell_nobox"], "global")),
    block_size=cfg["block"],
)

# sidecar-index pruning through the unified engine path (round-4: the
# distributed driver IS run_query + DistStepComm, so the clustered +
# pre-indexed manifest must produce index_skipped_blocks on every host)
small = AABB(tuple(cfg["small_box"][0]), tuple(cfg["small_box"][1]))
res = distributed.distributed_query(
    Path(cfg["data_idx"]), QueryPlan(bounds=BoundsQuery(small)),
    block_size=cfg["block_idx"],
)
out["indexed_count"] = res.match_count
out["index_skipped_blocks"] = int(res.timer.counts.get("index_skipped_blocks", 0))

# density global-scope winner write-back (cross-host key resolution)
dd_out = Path(cfg["out_dir"]) / "density"
dd_out.mkdir(parents=True, exist_ok=True)
out["density_written"] = distributed.distributed_density(
    data, QueryPlan(bounds=BoundsQuery(box),
                    density=DensityConfig(cfg["cell"], "global"),
                    output_dir=dd_out),
    block_size=cfg["block"],
)

out["process_count"] = jax.process_count()
Path(cfg["result"]).write_text(json.dumps(out))
print(f"worker {cfg['pid']} done: {out}", flush=True)
"""


def run_workers(data: Path, out_dir: Path, tmp: Path, timeout: float) -> list[dict]:
    port = free_port()
    procs, results = [], []
    for pid in range(2):
        result = tmp / f"result_{pid}.json"
        cfg = {
            "pid": pid, "port": port, "data": str(data), "block": BLOCK,
            "box": BOX, "cls": CLASS, "time": TIME_RANGE,
            "cell": DENSITY_CELL, "cell_nobox": DENSITY_CELL_NOBOX,
            "out_dir": str(out_dir), "result": str(result),
            "data_idx": str(data.parent.parent / "data_idx" / "last"),
            "small_box": SMALL_BOX, "block_idx": BLOCK_IDX,
        }
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        # Worker output goes to a FILE, not a pipe: the two workers are
        # coupled through gloo collectives, so sequentially draining pipes
        # can deadlock (worker 1 blocks on a full 64 KiB pipe, worker 0
        # blocks in a collective waiting for worker 1).
        logf = open(tmp / f"worker_{pid}.log", "w+")
        p = subprocess.Popen(
            [sys.executable, "-c", WORKER_BODY, json.dumps(cfg)],
            env=env, cwd=str(REPO),
            stdout=logf, stderr=subprocess.STDOUT, text=True,
        )
        procs.append((p, result, logf))
    for p, result, logf in procs:
        try:
            p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q, _, _ in procs:
                q.kill()
            raise RuntimeError("distributed worker timed out")
    for p, result, logf in procs:
        logf.seek(0)
        out = logf.read()
        logf.close()
        if p.returncode != 0:
            raise RuntimeError(f"worker failed (rc={p.returncode}):\n{out[-4000:]}")
        results.append(json.loads(result.read_text()))
    return results


# ----------------------------------------------------------------- parent --

def expected_single_process(data: Path) -> dict:
    """Single-process engine truth (this process, CPU backend)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from adhoc_queries_pointclouds_tpu.engine import run_query
    from adhoc_queries_pointclouds_tpu.models.query import (
        BoundsQuery, ClassQuery, DensityConfig, QueryPlan, TimeRangeQuery,
    )
    from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

    box = AABB(BOX[0], BOX[1])
    exp = {
        "bbox_count": run_query(
            data, QueryPlan(bounds=BoundsQuery(box)), block_size=BLOCK
        ).match_count,
        "class_count": run_query(
            data, QueryPlan(classification=ClassQuery(CLASS)), block_size=BLOCK
        ).match_count,
        "time_count": run_query(
            data, QueryPlan(time_range=TimeRangeQuery(*TIME_RANGE)),
            block_size=BLOCK,
        ).match_count,
        "density_file": run_query(
            data,
            QueryPlan(bounds=BoundsQuery(box),
                      density=DensityConfig(DENSITY_CELL, "file")),
            block_size=BLOCK,
        ).match_count,
        "density_global": run_query(
            data,
            QueryPlan(bounds=BoundsQuery(box),
                      density=DensityConfig(DENSITY_CELL, "global")),
            block_size=BLOCK,
        ).match_count,
        "density_nobox": run_query(
            data,
            QueryPlan(classification=ClassQuery(CLASS),
                      density=DensityConfig(DENSITY_CELL_NOBOX, "global")),
            block_size=BLOCK,
        ).match_count,
    }
    exp["collect_total"] = exp["bbox_count"]

    # clustered + indexed manifest: single-process truth for the small box
    data_idx = data.parent.parent / "data_idx" / "last"
    exp["indexed_count"] = run_query(
        data_idx, QueryPlan(bounds=BoundsQuery(AABB(*map(tuple, SMALL_BOX)))),
        block_size=BLOCK_IDX,
    ).match_count

    # density global-scope winner truth: the engine's own merged output
    exp_dd = data.parent.parent / "exp_density"
    exp_dd.mkdir(parents=True, exist_ok=True)
    run_query(
        data,
        QueryPlan(bounds=BoundsQuery(box),
                  density=DensityConfig(DENSITY_CELL, "global"),
                  output_dir=exp_dd),
        block_size=BLOCK,
    )
    exp["density_written"] = exp["density_global"]
    return exp


def verify(results: list[dict], exp: dict, data: Path, tmp: Path) -> dict:
    import numpy as np

    from adhoc_queries_pointclouds_tpu.formats import LasFile
    from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

    report = {"expected": exp, "workers": results}
    for key in ("bbox_count", "class_count", "time_count", "collect_total",
                "density_file", "density_global", "density_nobox",
                "indexed_count", "density_written"):
        vals = [r[key] for r in results]
        assert vals[0] == vals[1] == exp[key], (
            f"{key}: workers={vals} expected={exp[key]}"
        )
        assert exp[key] > 0, f"{key}: degenerate zero-match query"
    assert all(r["process_count"] == 2 for r in results)

    # per-host written LAS outputs: every point in-box, disjoint hosts
    # (manifest shards don't overlap), union == single-process hit count
    box = AABB(BOX[0], BOX[1])
    written = 0
    host_files = [r["collect_files"] for r in results]
    assert all(host_files), f"a host wrote no output: {host_files}"
    for files in host_files:
        for f in files:
            back = LasFile(Path(f))
            w = back.positions_world()
            assert np.all(box.contains_points(w)), f"out-of-box point in {f}"
            written += back.point_count
            back.close()
    assert written == exp["bbox_count"], (written, exp["bbox_count"])
    report["written_points"] = written

    # the unified engine path must have pruned blocks via the sidecar index
    # (the corner box lives in ONE host's manifest shard; the other host's
    # file is header-prefiltered before the index is even consulted)
    skipped = [r["index_skipped_blocks"] for r in results]
    assert sum(skipped) > 0, (
        f"no index pruning through the distributed path: {results}"
    )
    report["index_skipped_blocks"] = skipped

    # density global write-back: union of per-host winner dumps must equal
    # the single-process engine's merged winner point set exactly
    def las_rows(paths):
        rows = []
        for f in paths:
            back = LasFile(Path(f))
            w = back.positions_world()
            rows += [tuple(np.round(p, 9)) for p in w]
            back.close()
        return sorted(rows)

    exp_rows = las_rows(sorted((tmp / "exp_density").glob("*.las")))
    got_rows = las_rows(sorted((tmp / "out" / "density").glob("host*/*.las")))
    assert len(exp_rows) == exp["density_global"], (
        len(exp_rows), exp["density_global"]
    )
    assert got_rows == exp_rows, (
        f"distributed density winner set diverges: {len(got_rows)} vs "
        f"{len(exp_rows)} points"
    )
    report["density_written_points"] = len(got_rows)
    return report


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--points", type=int, default=20_000)
    ap.add_argument("--timeout", type=float, default=420.0)
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory(prefix="aqpc_dist2_") as td:
        tmp = Path(td)
        from adhoc_queries_pointclouds_tpu.formats import synth

        synth.write_dataset(
            tmp / "data", n_files=args.files, points_per_file=args.points,
            seed=97, formats=("last",), point_format=1,
        )
        data = tmp / "data" / "last"
        # clustered + pre-indexed manifest for the pruning assertion
        from adhoc_queries_pointclouds_tpu import index as index_mod
        from adhoc_queries_pointclouds_tpu.formats import open_point_cloud

        synth.write_dataset(
            tmp / "data_idx", n_files=2, points_per_file=args.points,
            seed=98, formats=("last",), clustered=True,
        )
        for f in sorted((tmp / "data_idx" / "last").glob("*.last")):
            r = open_point_cloud(f)
            # index blocks at the engine block size: the default INDEX_BLOCK
            # would cover these small fixture files with a single row
            blocks, bmp, gps = index_mod.build_index(r, index_block=BLOCK_IDX)
            index_mod.save_index(f, blocks, bmp, gps, index_block=BLOCK_IDX,
                                 n_points=r.point_count)
            r.close()
        results = run_workers(data, tmp / "out", tmp, args.timeout)
        exp = expected_single_process(data)
        report = verify(results, exp, data, tmp)
        print("PASS: 2-process distributed parity — "
              + ", ".join(f"{k}={v}" for k, v in exp.items()))
        if args.json:
            args.json.write_text(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
