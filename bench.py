#!/usr/bin/env python
"""Headline benchmark: fused bbox predicate-scan throughput on one chip.

Prints exactly ONE JSON line to stdout:
  {"metric": "bbox_scan_throughput", "value": <Mpts/s>, "unit": "Mpts/s",
   "vs_baseline": <ratio>, "extras": {...}}

extras carries the full per-round measurement set:
  - roofline_copy_gbs / roofline_reduce_gbs: device memcpy and pure int32
    reduction bandwidth — the measured device ceiling the kernel number
    should be judged against (NOT assumed from spec sheets)
  - kernel_mpts / kernel_gbs / kernel_pct_of_reduce: the fused scan and how
    close it runs to the measured reduction ceiling
  - e2e_mpts / e2e_mibs: the STREAMING ENGINE on a synthetic LAST dataset
    (mmap -> decode-ahead feeder -> sharded device scan), the number that
    corresponds to the reference's headline MiB/s metric (main.rs:309-316)

The baseline is a single-pass vectorized NumPy scan of the same int32
predicate on the host CPU — a faithful stand-in for the reference's
`--optimized` Rust loop (query/src/search/las.rs:101-119), which is likewise
a memory-bound integer-compare pass over mmap'd columns (the Rust binary
itself cannot run here: no cargo in this image). BASELINE.md's north star is
>10x points/sec/chip over that scan.

Diagnostics go to stderr so stdout stays machine-readable.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

# Host-side baseline size: large enough for a stable NumPy number.
N_POINTS = 8 * 1024 * 1024
# Device-resident kernel measurement size: the per-dispatch floor on this
# backend is ~2-4 ms (tools/bboxprobe.py), so small scans measure the floor,
# not the kernel — 8M under-reported the kernel ~3x in round 3. 64M
# amortizes the floor below ~10% of scan time. Data is generated on device,
# so the tunnel link never sees these bytes.
KERNEL_POINTS = int(os.environ.get("AQPC_BENCH_KERNEL_PTS", str(64 * 1024 * 1024)))
WARMUP = 3
ITERS = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


_T0 = time.monotonic()


def _deadline() -> float:
    """Soft wall-clock budget: optional stages are skipped past this point
    so a tunnel stall window can't starve the JSON line entirely."""
    return _T0 + float(os.environ.get("AQPC_BENCH_BUDGET_S", "420"))


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
    n_pts = KERNEL_POINTS if on_tpu else len(x)
    key = jax.random.PRNGKey(0)
    kx, ky, kz = jax.random.split(key, 3)
    shape = (n_pts,)
    dx = jax.random.randint(kx, shape, -(2**30), 2**30, dtype=jnp.int32)
    dy = jax.random.randint(ky, shape, -(2**30), 2**30, dtype=jnp.int32)
    dz = jax.random.randint(kz, shape, -(2**30), 2**30, dtype=jnp.int32)
    dlo = jax.device_put(lo)
    dhi = jax.device_put(hi)
    n = jnp.asarray(n_pts, jnp.int32)
    jax.block_until_ready([dx, dy, dz, dlo, dhi])
    log(f"device data generated in {time.perf_counter() - t0:.1f}s")

    # NOTE: the big arrays ride as jit ARGUMENTS — closing over them bakes
    # them into the program as constants, which the tunneled remote-compile
    # endpoint must upload (and rejects above ~100 MB with HTTP 413).
    def make_multi(impl):
        def one(a, b, c, hi_k):
            if impl == "pallas":
                return predicate.bbox_count_pallas(a, b, c, dlo, hi_k, n)
            return predicate.bbox_count_jnp(a, b, c, dlo, hi_k, n)

        @jax.jit
        def multi(a, b, c, hi0):
            def body(k, acc):
                return acc + one(a, b, c, hi0 + k)

            return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

        return multi

    def measure(impl):
        multi = make_multi(impl)
        int(multi(dx, dy, dz, dhi))  # warm (compile); int() forces real
        # completion — block_until_ready can return early on this backend
        t0 = time.perf_counter()
        total = int(multi(dx, dy, dz, dhi + 1))
        dt = (time.perf_counter() - t0) / ITERS
        return n_pts / dt, total

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

    # classification scan (1 B/point, single stream): the paper's key
    # LAST-format win; should run nearer the pure-reduction roofline than
    # the 3-stream bbox scan
    try:
        dcls = jax.random.randint(
            jax.random.PRNGKey(3), shape, 0, 32, dtype=jnp.int32
        ).astype(jnp.uint8)
        jax.block_until_ready(dcls)

        def one_cls(c, t):
            if on_tpu:
                return predicate.class_count_pallas(c, t, n)
            return predicate.class_count_jnp(c, t, n)

        @jax.jit
        def multi_cls(c, t0):
            def body(k, acc):
                return acc + one_cls(c, t0 + k)

            return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

        int(multi_cls(dcls, jnp.int32(1)))
        t0 = time.perf_counter()
        int(multi_cls(dcls, jnp.int32(2)))
        dt = (time.perf_counter() - t0) / ITERS
        global _CLASS_PPS
        _CLASS_PPS = n_pts / dt
        log(
            f"class scan [unpacked]: {_CLASS_PPS / 1e6:.1f} Mpts/s "
            f"({_CLASS_PPS / 1e9:.2f} GB/s of u8 reads)"
        )
    except Exception as e:
        log(f"class scan measure failed: {e}")

    # 4x-packed class scan: same bytes viewed as int32 words, 4 points per
    # VPU lane — lifts the element-rate bound of the unpacked u8 scan
    try:
        dwords = jax.lax.bitcast_convert_type(
            dcls.reshape(-1, 4), jnp.int32
        )
        jax.block_until_ready(dwords)
        nv32 = jnp.asarray(n, jnp.int32)

        def one_packed(w, t):
            if on_tpu:
                return predicate.class_count_packed_pallas(w, t, nv32)
            return predicate.class_count_packed_jnp(w, t, nv32)

        @jax.jit
        def multi_packed(w, t0):
            def body(k, acc):
                return acc + one_packed(w, t0 + k)

            return jax.lax.fori_loop(0, ITERS, body, jnp.int32(0))

        chk_packed = int(multi_packed(dwords, jnp.int32(1)))
        chk_unpacked = int(multi_cls(dcls, jnp.int32(1)))
        assert chk_packed == chk_unpacked, (chk_packed, chk_unpacked)
        t0 = time.perf_counter()
        int(multi_packed(dwords, jnp.int32(2)))
        dt = (time.perf_counter() - t0) / ITERS
        global _CLASS_PACKED_PPS
        _CLASS_PACKED_PPS = n_pts / dt
        log(
            f"class scan [packed x4]: {_CLASS_PACKED_PPS / 1e6:.1f} Mpts/s "
            f"({_CLASS_PACKED_PPS / 1e9:.2f} GB/s of u8 reads, "
            f"{_CLASS_PACKED_PPS / max(_CLASS_PPS, 1):.2f}x unpacked)"
        )
    except Exception as e:
        log(f"packed class scan measure failed: {e}")
    return best


_CLASS_PPS = 0.0
_CLASS_PACKED_PPS = 0.0


def roofline() -> dict:
    """Measured device bandwidth ceilings: elementwise copy-like traffic and
    a pure int32 reduction, each timed as one fori_loop dispatch with
    completion forced through a scalar fetch (block_until_ready can return
    early on the tunneled backend). The kernel's GB/s should be judged
    against these numbers, not against a spec sheet."""
    import jax
    import jax.numpy as jnp

    n = 64 * 1024 * 1024  # 256 MiB of int32
    iters = 8
    # x must be an ARGUMENT of the jitted fns, not a closure: closed-over
    # arrays are baked into the program as literals, which the tunneled
    # remote-compile endpoint rejects (HTTP 413) and which would let XLA
    # constant-fold the traffic away.
    x = jax.random.randint(jax.random.PRNGKey(1), (n,), -100, 100, dtype=jnp.int32)
    jax.block_until_ready(x)

    @jax.jit
    def copy_loop(arr, v0):
        def body(k, a):
            return a + k  # reads n*4, writes n*4 per iteration

        return jax.lax.fori_loop(0, iters, body, arr + v0)[0]

    @jax.jit
    def reduce_loop(arr, v0):
        def body(k, acc):
            return acc + jnp.sum(arr + k, dtype=jnp.int32)  # reads n*4

        return jax.lax.fori_loop(0, iters, body, v0)

    out = {}
    try:
        int(copy_loop(x, jnp.int32(0)))  # warm
        t0 = time.perf_counter()
        int(copy_loop(x, jnp.int32(1)))
        dt = (time.perf_counter() - t0) / iters
        out["roofline_copy_gbs"] = round(8.0 * n / dt / 1e9, 1)
    except Exception as e:
        log(f"roofline copy probe failed: {e}")
    try:
        int(reduce_loop(x, jnp.int32(0)))
        t0 = time.perf_counter()
        int(reduce_loop(x, jnp.int32(1)))
        dt = (time.perf_counter() - t0) / iters
        out["roofline_reduce_gbs"] = round(4.0 * n / dt / 1e9, 1)
    except Exception as e:
        log(f"roofline reduce probe failed: {e}")
    # host->device transfer ceiling: the streaming engine's e2e number is
    # bounded by this (12 B/point of coordinates must cross the link)
    try:
        host = np.random.default_rng(2).integers(
            -100, 100, 16 * 1024 * 1024, dtype=np.int64
        ).astype(np.int32)  # 64 MiB
        d = jax.device_put(host)
        jax.block_until_ready(d)  # warm path
        t0 = time.perf_counter()
        d = jax.device_put(host)
        int(d[0])  # force materialization on device
        dt = time.perf_counter() - t0
        out["h2d_gbs"] = round(host.nbytes / dt / 1e9, 2)
    except Exception as e:
        log(f"h2d probe failed: {e}")
    log(
        f"roofline: copy {out.get('roofline_copy_gbs', '?')} GB/s, "
        f"reduce {out.get('roofline_reduce_gbs', '?')} GB/s, "
        f"h2d {out.get('h2d_gbs', '?')} GB/s"
    )
    return out


def end_to_end(tmpdir: Path) -> dict:
    """Streaming engine throughput on a synthetic LAST dataset — the number
    comparable to the reference's headline MiB/s report (main.rs:309-316):
    file bytes on disk -> mmap columns -> decode-ahead feeder -> sharded
    device scan -> count."""
    from adhoc_queries_pointclouds_tpu.engine import run_query
    from adhoc_queries_pointclouds_tpu.formats import synth
    from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, QueryPlan
    from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

    ds = tmpdir / "last"
    total_pts = 16_000_000
    if not ds.exists():
        log("generating end-to-end dataset (4 x 4M points, LAST)...")
        synth.write_dataset(
            tmpdir, n_files=4, points_per_file=4_000_000, formats=("last",), seed=0
        )
    box = AABB((100200.0, 200300.0, 10.0), (103400.0, 200800.0, 60.0))
    plan = QueryPlan(bounds=BoundsQuery(box))

    def timed_count(label):
        res = run_query(ds, plan, use_index=False)  # warm (compile + cache)
        t0 = time.perf_counter()
        res = run_query(ds, plan, use_index=False)
        dt = time.perf_counter() - t0
        return res, dt

    # packed transport (byte-planar residuals, the default) vs raw int32:
    # the same link carries ~3-9 B/pt instead of 12
    prev_pack = os.environ.get("AQPC_PACK")
    os.environ["AQPC_PACK"] = "0"
    try:
        res_u, dt_u = timed_count("unpacked")
    finally:
        if prev_pack is None:
            os.environ.pop("AQPC_PACK", None)
        else:
            os.environ["AQPC_PACK"] = prev_pack
    res, dt = timed_count("packed")
    assert res.match_count == res_u.match_count, (res.match_count, res_u.match_count)
    mpts = total_pts / dt / 1e6
    mpts_u = total_pts / dt_u / 1e6
    mibs = res.total_file_bytes / dt / 1048576.0
    log(
        f"end-to-end streaming: {res.match_count} hits over {total_pts / 1e6:.0f} Mpts "
        f"in {dt:.2f}s = {mpts:.1f} Mpts/s ({mibs:.0f} MiB/s of file bytes; "
        f"packed transport, {mpts / max(mpts_u, 1e-9):.2f}x over raw-int32 "
        f"{mpts_u:.1f} Mpts/s — the link is the roofline)"
    )
    out = {
        "e2e_mpts": round(mpts, 1),
        "e2e_mibs": round(mibs, 1),
        "e2e_packed_mpts": round(mpts, 1),
        "e2e_unpacked_mpts": round(mpts_u, 1),
        "e2e_packed_speedup": round(mpts / max(mpts_u, 1e-9), 2),
    }
    if time.monotonic() > _deadline():
        log("budget exhausted; skipping collect/density e2e")
        return out

    # collect path (mesh compaction + streamed gather) and f64-exact density
    # path, so the round artifact audits every engine mode
    import tempfile

    from adhoc_queries_pointclouds_tpu.models.query import DensityConfig

    with tempfile.TemporaryDirectory() as td:
        cplan = QueryPlan(bounds=BoundsQuery(box), output_dir=Path(td))
        run_query(ds, cplan, use_index=False)  # warm
        t0 = time.perf_counter()
        cres = run_query(ds, cplan, use_index=False)
        dt = time.perf_counter() - t0
        out["e2e_collect_mpts"] = round(total_pts / dt / 1e6, 1)
        log(f"e2e collect+writeback: {cres.match_count} hits in {dt:.2f}s")
    if time.monotonic() > _deadline():
        log("budget exhausted; skipping density e2e")
        return out
    dplan = QueryPlan(bounds=BoundsQuery(box), density=DensityConfig(100.0))
    run_query(ds, dplan, use_index=False)  # warm
    t0 = time.perf_counter()
    dres = run_query(ds, dplan, use_index=False)
    dt = time.perf_counter() - t0
    out["e2e_density_mpts"] = round(total_pts / dt / 1e6, 1)
    log(f"e2e density: {dres.match_count} cells in {dt:.2f}s")

    if time.monotonic() > _deadline():
        return out
    # serving mode: dataset resident in HBM, one dispatch per ad-hoc query —
    # the interactive story the reference's cold-cache protocol cannot offer
    try:
        from adhoc_queries_pointclouds_tpu.parallel.resident import ResidentDataset

        rds = ResidentDataset.load(ds, attrs=("position",))
        int(rds.count(plan))  # warm
        reps = 20
        t0 = time.perf_counter()
        for k in range(reps):
            rds.count(plan)
        dt = (time.perf_counter() - t0) / reps
        out["resident_ms_per_query"] = round(dt * 1e3, 2)
        out["resident_mpts_per_query"] = round(rds.total_points / dt / 1e6, 1)
        log(
            f"resident serving: {dt * 1e3:.2f} ms/query over "
            f"{rds.total_points / 1e6:.0f} Mpts in HBM "
            f"({rds.total_points / dt / 1e9:.2f} Gpts/s/query)"
        )
    except Exception as e:
        log(f"resident serving bench skipped: {e}")
    return out


def inflight_comparison(tmpdir: Path) -> dict:
    """Decode-bound (LAZER) engine scan with AQPC_INFLIGHT=1 vs 3: measures
    the win from overlapping host decode + H2D with the device scan. Opt-in
    (AQPC_BENCH_INFLIGHT=1): queued transfers can wedge the tunneled axon
    backend for minutes, so this belongs on real hardware."""
    import os

    import adhoc_queries_pointclouds_tpu.engine as eng
    from adhoc_queries_pointclouds_tpu.engine import run_query
    from adhoc_queries_pointclouds_tpu.formats import synth
    from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, QueryPlan
    from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

    ds = tmpdir / "lazer"
    if not ds.exists():
        log("generating LAZER dataset for the inflight comparison...")
        synth.write_dataset(
            tmpdir, n_files=4, points_per_file=4_000_000, formats=("lazer",), seed=0
        )
    box = AABB((100200.0, 200300.0, 10.0), (103400.0, 200800.0, 60.0))
    plan = QueryPlan(bounds=BoundsQuery(box))
    out = {}
    saved = eng.MAX_INFLIGHT_STEPS
    try:
        for inflight in (1, 3):
            eng.MAX_INFLIGHT_STEPS = inflight
            run_query(ds, plan, use_index=False)  # warm
            t0 = time.perf_counter()
            run_query(ds, plan, use_index=False)
            dt = time.perf_counter() - t0
            out[f"e2e_lazer_inflight{inflight}_mpts"] = round(16_000_000 / dt / 1e6, 1)
    finally:
        eng.MAX_INFLIGHT_STEPS = saved
    if "e2e_lazer_inflight1_mpts" in out and "e2e_lazer_inflight3_mpts" in out:
        out["inflight_speedup"] = round(
            out["e2e_lazer_inflight3_mpts"] / out["e2e_lazer_inflight1_mpts"], 2
        )
    log(f"inflight comparison: {out}")
    return out


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

    extras = {}
    try:
        extras.update(roofline())
    except Exception as e:
        log(f"roofline probes skipped: {e}")
    extras["kernel_mpts"] = round(device_pps / 1e6, 1)
    extras["kernel_gbs"] = round(device_pps * 12 / 1e9, 1)
    if _CLASS_PPS:
        extras["kernel_class_unpacked_mpts"] = round(_CLASS_PPS / 1e6, 1)
    best_class = max(_CLASS_PPS, _CLASS_PACKED_PPS)
    if best_class:
        extras["kernel_class_mpts"] = round(best_class / 1e6, 1)
        extras["kernel_class_gbs"] = round(best_class / 1e9, 2)
    if extras.get("roofline_reduce_gbs"):
        extras["kernel_pct_of_reduce"] = round(
            100.0 * extras["kernel_gbs"] / extras["roofline_reduce_gbs"], 1
        )

    # streaming engine measurement (disable with AQPC_BENCH_NO_E2E=1 if a
    # flaky tunnel window stalls H2D transfers past the driver's budget)
    if not os.environ.get("AQPC_BENCH_NO_E2E"):
        try:
            extras.update(end_to_end(Path(".bench_data")))
        except Exception as e:
            log(f"end-to-end bench skipped: {e}")

    if os.environ.get("AQPC_BENCH_INFLIGHT"):
        try:
            extras.update(inflight_comparison(Path(".bench_data")))
        except Exception as e:
            log(f"inflight comparison skipped: {e}")

    print(
        json.dumps(
            {
                "metric": "bbox_scan_throughput",
                "value": round(device_pps / 1e6, 1),
                "unit": "Mpts/s",
                "vs_baseline": round(device_pps / baseline_pps, 2),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
