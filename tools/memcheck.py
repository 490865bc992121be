#!/usr/bin/env python
"""Streaming-memory validation at scale.

Runs a worst-case collect (a box matching EVERY point, write-back + LAS
output) over a dataset far larger than any single block and reports peak
RSS. The claim under test: host memory stays O(block + spool cap), never
O(hits) — the reference buffers all hits in RAM (collect_points.rs:14-44),
which for the paper's XL query (~2.6 B points) cannot work.

Usage: python tools/memcheck.py [--points N] [--files K]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def anon_mib() -> float:
    """Anonymous RSS only: ru_maxrss/VmRSS include file-backed mmap pages
    (the dataset itself, reclaimable), which would mask or fake a leak."""
    for line in open("/proc/self/status"):
        if line.startswith("RssAnon:"):
            return int(line.split()[1]) / 1024.0
    return 0.0


class AnonPeak:
    def __init__(self):
        self.peak = anon_mib()
        self._stop = False
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        while not self._stop:
            self.peak = max(self.peak, anon_mib())
            time.sleep(0.05)

    def stop(self) -> float:
        self._stop = True
        self._t.join()
        return max(self.peak, anon_mib())


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", type=int, default=50_000_000)
    parser.add_argument("--files", type=int, default=4)
    parser.add_argument("--spool-mb", type=float, default=128.0)
    args = parser.parse_args()

    import os

    os.environ["AQPC_SPOOL_MB"] = str(args.spool_mb)
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from adhoc_queries_pointclouds_tpu.engine import run_query
    from adhoc_queries_pointclouds_tpu.formats import synth
    from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, QueryPlan
    from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

    per_file = args.points // args.files
    root = Path(tempfile.mkdtemp(prefix="aqpc_mem_"))
    print(f"writing {args.files} x {per_file / 1e6:.0f}M LAST points...",
          file=sys.stderr)
    t0 = time.perf_counter()
    synth.write_dataset(root, n_files=args.files, points_per_file=per_file,
                        formats=("last",), seed=0)
    print(f"dataset written in {time.perf_counter() - t0:.0f}s, "
          f"baseline anon RSS {anon_mib():.0f} MiB", file=sys.stderr)

    out = root / "out"
    out.mkdir()
    box = AABB((-1e12,) * 3, (1e12,) * 3)  # matches every point
    base = anon_mib()
    tracker = AnonPeak()
    t0 = time.perf_counter()
    res = run_query(root / "last", QueryPlan(bounds=BoundsQuery(box),
                                             output_dir=out),
                    use_index=False)
    dt = time.perf_counter() - t0
    peak = tracker.stop()
    written = sum(f.stat().st_size for f in out.glob("*.las"))
    hits_bytes = res.match_count * 33  # spool record size
    print(
        f"collected {res.match_count / 1e6:.1f}M hits (100% match) in {dt:.0f}s "
        f"({res.match_count / dt / 1e6:.1f} Mpts/s); wrote "
        f"{written / 1048576:.0f} MiB of LAS"
    )
    print(
        f"peak anon RSS {peak:.0f} MiB (baseline {base:.0f} MiB); "
        f"materializing all hits would need >= {hits_bytes / 1048576:.0f} MiB"
    )
    # The design working set is a CONSTANT w.r.t. hit count:
    #   prefetch window (12 blocks x ~24 MiB of columns)
    # + in-flight device steps (3 x rows x block x 12 B operands)
    # + spool RAM cap + gather chunks + allocator slack  ~= 1.0-1.4 GiB.
    # Streaming holds iff the peak stays within that constant budget (and
    # therefore below materializing the hits once they exceed it).
    budget = 2048.0
    ok = (peak - base) < budget
    print(
        "STREAMING OK (bounded working set)" if ok
        else f"STREAMING FAIL (working set exceeded {budget:.0f} MiB budget)"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
