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

# 8M points per scan: large enough to dwarf dispatch overhead, small enough
# to keep device interactions short on a flaky tunnel
N_POINTS = 8 * 1024 * 1024
WARMUP = 3
ITERS = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def wait_device_healthy(budget_s: float = 240.0) -> None:
    """The tunneled axon TPU intermittently stalls for minutes; gate the
    heavy benchmark section on a trivial-dispatch probe so a bad window
    delays rather than poisons the measurement."""
    import jax

    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        t0 = time.perf_counter()
        try:
            jax.jit(lambda v: v + 1)(jnp_scalar()).block_until_ready()
            dt = time.perf_counter() - t0
            if dt < 5.0:
                if attempt:
                    log(f"device healthy again after {attempt} probe(s)")
                return
        except Exception as e:
            log(f"health probe error: {e}")
        attempt += 1
        if time.monotonic() > deadline:
            log("device still slow after probe budget; proceeding anyway")
            return
        log(f"device slow (probe {attempt}); waiting 20s...")
        time.sleep(20.0)


def jnp_scalar():
    import jax.numpy as jnp

    return jnp.float32(1.0)


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
    """Time ITERS scans with distinct bounds inside ONE device dispatch.

    A lax.fori_loop keeps the measurement on-device: host<->device round
    trips (large and flaky over the tunneled axon backend) are paid once,
    and distinct bounds per iteration defeat any execution memoization that
    would fake above-speed-of-light numbers.
    """
    import jax
    import jax.numpy as jnp

    from adhoc_queries_pointclouds_tpu.ops import predicate

    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"device: {jax.devices()[0]} (backend={backend})")
    wait_device_healthy()

    # Generate the columns ON DEVICE: bulk H2D transfers are the op most
    # prone to multi-minute stalls on the tunneled backend, and a kernel
    # throughput measurement doesn't need host data. Same distribution as
    # the numpy baseline, so selectivity matches.
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(0)
    kx, ky, kz = jax.random.split(key, 3)
    shape = (len(x),)
    dx = jax.random.randint(kx, shape, -(2**30), 2**30, dtype=jnp.int32)
    dy = jax.random.randint(ky, shape, -(2**30), 2**30, dtype=jnp.int32)
    dz = jax.random.randint(kz, shape, -(2**30), 2**30, dtype=jnp.int32)
    dlo = jax.device_put(lo)
    dhi = jax.device_put(hi)
    n = jnp.asarray(len(x), jnp.int32)
    jax.block_until_ready([dx, dy, dz, dlo, dhi])
    log(f"device data generated in {time.perf_counter() - t0:.1f}s")

    def make_multi(impl):
        def one(hi_k):
            if impl == "pallas":
                return predicate.bbox_count_pallas(dx, dy, dz, dlo, hi_k, n)
            return predicate.bbox_count_jnp(dx, dy, dz, dlo, hi_k, n)

        @jax.jit
        def multi(hi0):
            def body(k, acc):
                return acc + one(hi0 + k)

            return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

        return multi

    def measure(impl):
        multi = make_multi(impl)
        int(multi(dhi))  # warm (compile); int() forces real completion —
        # block_until_ready can return early on this backend
        t0 = time.perf_counter()
        total = int(multi(dhi + 1))
        dt = (time.perf_counter() - t0) / ITERS
        return len(x) / dt, total

    candidates = ["jnp", "pallas"] if on_tpu else ["jnp"]
    best = 0.0
    best_impl = "jnp"
    for impl in candidates:
        try:
            pps, total = measure(impl)
        except Exception as e:
            log(f"impl {impl} failed: {e}")
            continue
        log(
            f"device scan [{impl}]: {pps / 1e6:.1f} Mpts/s "
            f"({pps * 12 / 1e9:.1f} GB/s reads), checksum {total}"
        )
        if pps > best:
            best, best_impl = pps, impl
    log(f"best impl: {best_impl}")
    return best


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
    import os

    import jax

    if not os.environ.get("AQPC_NO_COMPILE_CACHE"):
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.expanduser("~"), ".cache", "aqpc_jax"),
            )
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:
            pass

    rng = np.random.default_rng(0)
    log(f"generating {N_POINTS / 1e6:.0f}M random int32 points...")
    x = rng.integers(-(2**30), 2**30, N_POINTS, dtype=np.int64).astype(np.int32)
    y = rng.integers(-(2**30), 2**30, N_POINTS, dtype=np.int64).astype(np.int32)
    z = rng.integers(-(2**30), 2**30, N_POINTS, dtype=np.int64).astype(np.int32)
    lo = np.array([-(2**29), -(2**28), -(2**29)], np.int32)
    hi = np.array([2**29, 2**28, 2**27], np.int32)

    baseline_pps = numpy_baseline(x, y, z, lo, hi)
    device_pps = device_scan(x, y, z, lo, hi)

    # informational streaming bench; opt-in because a flaky tunnel window
    # can stall the engine's H2D transfers past the driver's time budget
    if os.environ.get("AQPC_BENCH_E2E"):
        try:
            end_to_end(Path(".bench_data"))
        except Exception as e:
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
