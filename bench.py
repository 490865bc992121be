#!/usr/bin/env python
"""Headline benchmark: fused bbox predicate-scan throughput on one chip.

Prints exactly ONE JSON line to stdout:
  {"metric": "bbox_scan_throughput", "value": <Mpts/s>, "unit": "Mpts/s",
   "vs_baseline": <ratio>}

The baseline is a single-pass vectorized NumPy scan of the same int32
predicate on the host CPU — a faithful stand-in for the reference's
`--optimized` Rust loop (query/src/search/las.rs:101-119), which is likewise
a memory-bound integer-compare pass over mmap'd columns (the Rust binary
itself cannot run here: no cargo in this image). BASELINE.md's north star is
>10x points/sec/chip over that scan.

Diagnostics (device, sizes, end-to-end engine throughput) go to stderr so
stdout stays machine-readable.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

N_POINTS = 32 * 1024 * 1024  # 32M points resident per scan (384 MiB xyz)
WARMUP = 3
ITERS = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def numpy_baseline(x, y, z, lo, hi) -> float:
    """Single-pass vectorized int32 bbox scan on host; returns pts/sec."""
    def scan():
        m = (x >= lo[0]) & (x <= hi[0])
        m &= (y >= lo[1]) & (y <= hi[1])
        m &= (z >= lo[2]) & (z <= hi[2])
        return int(np.count_nonzero(m))

    scan()  # warm page cache / allocator
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        count = scan()
    dt = (time.perf_counter() - t0) / reps
    log(f"numpy baseline: {count} hits, {len(x) / dt / 1e6:.1f} Mpts/s")
    return len(x) / dt


def device_scan(x, y, z, lo, hi) -> float:
    import jax
    import jax.numpy as jnp

    from adhoc_queries_pointclouds_tpu.ops import predicate

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    impl = "pallas" if on_tpu else "jnp"
    log(f"device: {jax.devices()[0]} (backend={backend}, impl={impl})")

    dx = jax.device_put(x)
    dy = jax.device_put(y)
    dz = jax.device_put(z)
    dlo = jax.device_put(lo)
    dhi = jax.device_put(hi)
    n = np.int32(len(x))

    def run():
        return predicate.bbox_count(dx, dy, dz, dlo, dhi, n, impl=impl)

    for _ in range(WARMUP):
        c = run()
    c.block_until_ready()
    count = int(c)

    t0 = time.perf_counter()
    results = [run() for _ in range(ITERS)]
    results[-1].block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    pps = len(x) / dt
    gbs = pps * 12 / 1e9
    log(f"device scan: {count} hits, {pps / 1e6:.1f} Mpts/s ({gbs:.1f} GB/s of HBM reads)")
    return pps


def end_to_end(tmpdir: Path) -> None:
    """Streaming engine throughput on a small synthetic LAST dataset (info only)."""
    from adhoc_queries_pointclouds_tpu.engine import run_query
    from adhoc_queries_pointclouds_tpu.formats import synth
    from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, QueryPlan
    from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

    ds = tmpdir / "last"
    if not ds.exists():
        log("generating end-to-end dataset (4 x 4M points, LAST)...")
        synth.write_dataset(
            tmpdir, n_files=4, points_per_file=4_000_000, formats=("last",), seed=0
        )
    box = AABB((100200.0, 200300.0, 10.0), (103400.0, 200800.0, 60.0))
    plan = QueryPlan(bounds=BoundsQuery(box))
    res = run_query(ds, plan)  # warm (compile + page cache)
    t0 = time.perf_counter()
    res = run_query(ds, plan)
    dt = time.perf_counter() - t0
    total_pts = 16_000_000
    log(
        f"end-to-end streaming: {res.match_count} hits over {total_pts / 1e6:.0f} Mpts "
        f"in {dt:.2f}s = {total_pts / dt / 1e6:.1f} Mpts/s "
        f"({res.total_file_bytes / dt / 1048576.0:.0f} MiB/s of file bytes)"
    )


def main() -> None:
    rng = np.random.default_rng(0)
    log(f"generating {N_POINTS / 1e6:.0f}M random int32 points...")
    x = rng.integers(-(2**30), 2**30, N_POINTS, dtype=np.int64).astype(np.int32)
    y = rng.integers(-(2**30), 2**30, N_POINTS, dtype=np.int64).astype(np.int32)
    z = rng.integers(-(2**30), 2**30, N_POINTS, dtype=np.int64).astype(np.int32)
    lo = np.array([-(2**29), -(2**28), -(2**29)], np.int32)
    hi = np.array([2**29, 2**28, 2**27], np.int32)

    baseline_pps = numpy_baseline(x, y, z, lo, hi)
    device_pps = device_scan(x, y, z, lo, hi)

    try:
        end_to_end(Path(".bench_data"))
    except Exception as e:  # end-to-end is informational; never fail the bench
        log(f"end-to-end bench skipped: {e}")

    print(
        json.dumps(
            {
                "metric": "bbox_scan_throughput",
                "value": round(device_pps / 1e6, 1),
                "unit": "Mpts/s",
                "vs_baseline": round(device_pps / baseline_pps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
