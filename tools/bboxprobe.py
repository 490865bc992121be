"""Bbox-kernel roofline probe series (VERDICT r2 item 5).

Round-2 finding: the bbox (12 B/pt) and class (1 B/pt) Pallas scans both ran
~2.8 Gpts/s — identical POINTS/s despite 12x different bytes — i.e. the
saturated resource was per-point, not bandwidth. The suspects, probed here
head-to-head on the live backend:

  reduce    pure jnp.sum over int32 (the device's reduction roofline)
  smem      the library kernel: per-grid-step tile -> SMEM scalar reduce
  acc       probe variant: elementwise VMEM accumulator, ONE reduce at the
            last grid step (a wash across windows -> library keeps smem)
  acc_nomask  acc without the index-mask iota chain (bounds the mask cost)
  jnp       the XLA-fused jnp path
  class_*   the 1 B/pt class scan, unpacked vs 4x-packed

Verdict from three windows x two sizes (committed in
docs/SAMPLE_RESULTS.md): scan time = ~2-4 ms dispatch floor + bytes at
~the copy roofline; at 64 Mpts the bbox kernel runs ~100 GB/s of reads
(~= the measured elementwise ceiling), and window-to-window swing (+-40%)
dwarfs every kernel variant (+-10%). The round-2 '48.6% of reduce' figure
was the floor + cross-window comparison, not a kernel deficiency.

Methodology matches bench.py: ITERS scans with distinct bounds inside one
lax.fori_loop dispatch, completion forced via int() (block_until_ready
returns early on the tunneled backend).

Usage: python tools/bboxprobe.py [--n 16777216] [--iters 8]
Results from the real chip are committed in docs/SAMPLE_RESULTS.md.
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adhoc_queries_pointclouds_tpu.ops import predicate as P

TILE_ROWS, LANES = P.TILE_ROWS, P.LANES


# --- VMEM-accumulator variants (probe-only): accumulate the mask element-
# wise into a VMEM tile and reduce once at the last grid step, instead of
# the library's per-step tile -> SMEM scalar reduce. Measured across three
# tunnel windows these are a wash vs the SMEM pattern (see
# docs/SAMPLE_RESULTS.md), so the library keeps the simpler form. -------


def _bbox_kernel_acc(bounds_ref, nvalid_ref, x_ref, y_ref, z_ref,
                     out_ref, acc_ref):
    i = pl.program_id(0)
    row = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, LANES), 1)
    gidx = (i * TILE_ROWS + row) * LANES + col
    m = gidx < nvalid_ref[0]
    x = x_ref[:]
    m &= (x >= bounds_ref[0]) & (x <= bounds_ref[3])
    y = y_ref[:]
    m &= (y >= bounds_ref[1]) & (y <= bounds_ref[4])
    z = z_ref[:]
    m &= (z >= bounds_ref[2]) & (z <= bounds_ref[5])

    @pl.when(i == 0)
    def _():
        acc_ref[:] = m.astype(jnp.int32)

    @pl.when(i != 0)
    def _():
        acc_ref[:] += m.astype(jnp.int32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0, 0] = jnp.sum(acc_ref[:], dtype=jnp.int32)


def _bbox_kernel_acc_nomask(bounds_ref, nvalid_ref, x_ref, y_ref, z_ref,
                            out_ref, acc_ref):
    i = pl.program_id(0)
    x = x_ref[:]
    m = (x >= bounds_ref[0]) & (x <= bounds_ref[3])
    y = y_ref[:]
    m &= (y >= bounds_ref[1]) & (y <= bounds_ref[4])
    z = z_ref[:]
    m &= (z >= bounds_ref[2]) & (z <= bounds_ref[5])

    @pl.when(i == 0)
    def _():
        acc_ref[:] = m.astype(jnp.int32)

    @pl.when(i != 0)
    def _():
        acc_ref[:] += m.astype(jnp.int32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0, 0] = jnp.sum(acc_ref[:], dtype=jnp.int32)


def _call_bbox(kernel, x2, y2, z2, bounds, nvalid, grid, scratch):
    coord_spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(grid,),
            in_specs=[coord_spec, coord_spec, coord_spec],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=(
                [pltpu.VMEM((TILE_ROWS, LANES), jnp.int32)] if scratch else []
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(bounds, nvalid, x2, y2, z2)[0, 0]


@functools.partial(jax.jit, static_argnames=("variant",))
def bbox_probe(x, y, z, lo, hi, n_valid, variant: str):
    n = x.shape[0]
    rows = n // LANES
    grid = rows // TILE_ROWS
    bounds = jnp.concatenate([lo.astype(jnp.int32), hi.astype(jnp.int32)])
    nvalid = jnp.asarray(n_valid, jnp.int32).reshape(1)
    x2, y2, z2 = (a.reshape(rows, LANES) for a in (x, y, z))
    if variant == "acc":
        return _call_bbox(_bbox_kernel_acc, x2, y2, z2, bounds, nvalid, grid, True)
    return _call_bbox(_bbox_kernel_acc_nomask, x2, y2, z2, bounds, nvalid, grid, True)


def timed(one_fn, data, iters: int, label: str, pts: int,
          checks: dict | None = None):
    """Time `iters` calls inside one dispatch; returns points/s.

    `data` (a tuple of arrays) is passed as jit ARGUMENTS — closing over the
    arrays would bake them into the program as literals, which the tunneled
    remote-compile endpoint rejects above ~100 MB (HTTP 413)."""

    @jax.jit
    def multi(args, d):
        def body(k, acc):
            return acc + one_fn(args, d + k)

        return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

    chk = int(multi(data, jnp.int32(0)))  # compile + warm
    if checks is not None:
        checks[label] = chk
    t0 = time.perf_counter()
    int(multi(data, jnp.int32(1)))
    dt = (time.perf_counter() - t0) / iters
    pps = pts / dt
    print(f"{label:28s} {pps / 1e6:10.1f} Mpts/s   {dt * 1e3:8.2f} ms/scan",
          flush=True)
    return pps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16 * 1024 * 1024)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    n, iters = args.n, args.iters
    assert n % (TILE_ROWS * LANES) == 0

    print(f"device: {jax.devices()[0]} backend={jax.default_backend()} "
          f"n={n // 2**20} Mpts iters={iters}")
    key = jax.random.PRNGKey(0)
    kx, ky, kz = jax.random.split(key, 3)
    x = jax.random.randint(kx, (n,), -(2**30), 2**30, dtype=jnp.int32)
    y = jax.random.randint(ky, (n,), -(2**30), 2**30, dtype=jnp.int32)
    z = jax.random.randint(kz, (n,), -(2**30), 2**30, dtype=jnp.int32)
    cls = jax.random.randint(jax.random.PRNGKey(3), (n,), 0, 32,
                             dtype=jnp.int32).astype(jnp.uint8)
    words = jax.lax.bitcast_convert_type(cls.reshape(-1, 4), jnp.int32)
    lo = jnp.array([-(2**29)] * 3, jnp.int32)
    hi = jnp.array([2**29] * 3, jnp.int32)
    nv = jnp.asarray(n, jnp.int32)
    jax.block_until_ready([x, y, z, cls, words])

    results: dict[str, float] = {}
    checks: dict[str, int] = {}
    xyz = (x, y, z)

    # device reduction roofline, element rate
    r = timed(lambda a, d: jnp.sum(a[0] + d, dtype=jnp.int32), xyz, iters,
              "reduce (jnp.sum int32)", n)
    results["reduce_els"] = r

    results["bbox_smem"] = timed(
        lambda a, d: P.bbox_count_pallas(*a, lo, hi + d, nv),
        xyz, iters, "bbox pallas [smem-scalar]", n, checks)
    results["bbox_acc"] = timed(
        lambda a, d: bbox_probe(*a, lo, hi + d, nv, variant="acc"),
        xyz, iters, "bbox pallas [vmem-acc]", n, checks)
    results["bbox_acc_nomask"] = timed(
        lambda a, d: bbox_probe(*a, lo, hi + d, nv, variant="acc_nomask"),
        xyz, iters, "bbox pallas [acc, no mask]", n, checks)
    results["bbox_jnp"] = timed(
        lambda a, d: P.bbox_count_jnp(*a, lo, hi + d, nv),
        xyz, iters, "bbox jnp [XLA]", n, checks)

    assert checks["bbox pallas [smem-scalar]"] == checks["bbox pallas [vmem-acc]"] \
        == checks["bbox pallas [acc, no mask]"] == checks["bbox jnp [XLA]"], checks

    cchecks: dict[str, int] = {}
    results["class_smem"] = timed(
        lambda a, d: P.class_count_pallas(a[0], jnp.int32(1) + d - d, nv),
        (cls,), iters, "class pallas [smem-scalar]", n, cchecks)
    results["class_packed"] = timed(
        lambda a, d: P.class_count_packed_pallas(a[0], jnp.int32(1) + d - d, nv),
        (words,), iters, "class packed x4 [byte-sum]", n, cchecks)
    assert len(set(cchecks.values())) == 1, cchecks

    red_gbs = results["reduce_els"] * 4 / 1e9
    acc_gbs = results["bbox_acc"] * 12 / 1e9
    print(f"\nreduce roofline: {red_gbs:.1f} GB/s | bbox [vmem-acc]: "
          f"{acc_gbs:.1f} GB/s = {100 * acc_gbs / red_gbs:.1f}% of reduce | "
          f"acc/smem speedup {results['bbox_acc'] / results['bbox_smem']:.2f}x")


if __name__ == "__main__":
    main()
