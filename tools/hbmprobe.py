"""Asymptotic HBM-bandwidth probe series (VERDICT r3 item 3).

Question under test: the engine's measured device ceiling is ~264 GB/s of
total traffic (copy: 132 read + 132 write; the bbox kernel's 221 GB/s of
reads is consistent with the same cap), while v5e-class silicon is specced
~819 GB/s. Is the tunneled/virtualized backend capped at ~1/3 of spec, or
does the kernel have 2-3x headroom nobody has chased?

Method — everything the r3 verdict asked for:

  * SIZE SWEEP with a slope fit. Each (op, size) is timed as one fori_loop
    dispatch of ITERS passes (completion forced via int(); see CLAUDE.md on
    block_until_ready). A least-squares fit of time(n) = floor + n*slope
    across sizes separates the 2-4 ms dispatch floor from the marginal
    byte rate; asymptotic GB/s = bytes_per_element / slope. A flat
    asymptote across ops/dtypes/sizes = backend cap; a rising one = kernel
    headroom.
  * TOTAL-BYTES accounting. Every rate is reads+writes, so ops of different
    shape are comparable: copy (loop-carried arr+k) = 8 B/el, reduce = 4,
    two-operand add = 12, int8 reduce = 1, f32 copy = 8.
  * >=256 MB operands (default sweep tops out at 256M els = 1 GiB int32).
  * SAME-WINDOW rounds. All (op, size) cells are visited round-robin
    ROUNDS times; the per-cell MIN is used for the fit (tunnel noise is
    strictly additive stalls, so min is the clean sample).

All data is generated on device: the tunnel link never sees these bytes,
and the arrays ride as jit arguments (closures would be baked as literals
and rejected by the remote-compile endpoint above ~100 MB).

Usage: python tools/hbmprobe.py [--sizes 16,32,64,128,256] [--iters 8]
       [--rounds 3] [--ops copy_i32,reduce_i32,...]
Committed results from the real chip live in docs/SAMPLE_RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def build_ops(iters: int):
    import jax
    import jax.numpy as jnp

    def carry_loop(init_fn, body_fn):
        """ITERS full-array passes: init counts as pass 1."""

        @jax.jit
        def run(args, v0):
            return jax.lax.fori_loop(
                0, iters - 1, lambda k, arr: body_fn(arr, k, args),
                init_fn(args, v0))[0]

        return run

    def scalar_loop(one_fn):
        @jax.jit
        def run(args, v0):
            def body(k, acc):
                return acc + one_fn(args, v0 + k)

            return jax.lax.fori_loop(0, iters, body, jnp.int32(0))

        return run

    # op name -> (total bytes/element, make_args(n, key), loop)
    return {
        # loop-carried elementwise add: n*4 rd + n*4 wr per pass
        "copy_i32": (8, lambda n, k: (_rand_i32(k, n),), carry_loop(
            lambda a, v0: a[0] + v0, lambda arr, k, a: arr + k)),
        "copy_f32": (8, lambda n, k: (_rand_i32(k, n).astype("float32"),),
                     carry_loop(lambda a, v0: a[0] + v0.astype("float32"),
                                lambda arr, k, a: arr + k.astype("float32"))),
        # pure reduction: n*4 rd, scalar out. maximum(a, d), NOT a + d: the
        # linear form factors to sum(a) + n*d, which XLA hoists out of the
        # fori_loop — the "probe" then measures one pass, not ITERS (seen
        # as read3 "1535 GB/s", above silicon spec). max can't be factored.
        "reduce_i32": (4, lambda n, k: (_rand_i32(k, n),), scalar_loop(
            lambda a, d: jnp.sum(jnp.maximum(a[0], d), dtype=jnp.int32))),
        # 1 B/el reduction — element-rate vs byte-rate discriminator
        "reduce_i8": (1, lambda n, k: (_rand_i32(k, n).astype("int8"),),
                      scalar_loop(lambda a, d: jnp.sum(
                          jnp.maximum(a[0], d.astype(jnp.int8)),
                          dtype=jnp.int32))),
        # two-operand add, loop-carried: 2n*4 rd + n*4 wr per pass
        "add2_i32": (12, lambda n, k: (_rand_i32(k, n), _rand_i32(k + 1, n)),
                     carry_loop(lambda a, v0: a[0] + v0,
                                lambda arr, k, a: arr + a[1] + k)),
        # 3-stream pure read + reduce: the bbox kernel's exact traffic mix
        "read3_i32": (12, lambda n, k: tuple(_rand_i32(k + i, n)
                                             for i in range(3)),
                      scalar_loop(lambda a, d: jnp.sum(
                          jnp.maximum(a[0], d) + jnp.maximum(a[1], d)
                          + jnp.maximum(a[2], d), dtype=jnp.int32))),
        # the engine's fused bbox predicate (3 streams rd): 12 B/pt
        "bbox": (12, _bbox_args, _bbox_loop(scalar_loop)),
    }


def _rand_i32(key_int: int, n: int):
    import jax
    import jax.numpy as jnp

    return jax.random.randint(jax.random.PRNGKey(key_int), (n,),
                              -(2**30), 2**30, dtype=jnp.int32)


def _bbox_args(n: int, k: int):
    return tuple(_rand_i32(k + i, n) for i in range(3))


def _bbox_loop(scalar_loop):
    import jax.numpy as jnp

    from adhoc_queries_pointclouds_tpu.ops import predicate as P

    lo = jnp.array([-(2**29)] * 3, jnp.int32)
    hi = jnp.array([2**29] * 3, jnp.int32)

    def one(a, d):
        import jax

        f = (P.bbox_count_pallas if jax.default_backend() == "tpu"
             else P.bbox_count_jnp)
        return f(a[0], a[1], a[2], lo, hi + d,
                 jnp.asarray(a[0].shape[0], jnp.int32))

    return scalar_loop(one)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16,32,64,128,256",
                    help="comma list, in M elements")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--ops", default="copy_i32,copy_f32,reduce_i32,"
                                     "reduce_i8,add2_i32,bbox")
    ap.add_argument("--json", type=Path, default=None,
                    help="also write the table + fits to this JSON file")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sizes = [int(s) * 1024 * 1024 for s in args.sizes.split(",")]
    iters, rounds = args.iters, args.rounds
    ops = build_ops(iters)
    names = [o for o in args.ops.split(",") if o in ops]
    print(f"device: {jax.devices()[0]} backend={jax.default_backend()} "
          f"sizes={[s // 2**20 for s in sizes]}M iters={iters} "
          f"rounds={rounds}", flush=True)

    # One size at a time (all ops' operands for 256M els is ~8 GiB HBM —
    # holding every size at once would blow the 16 GiB budget). Within a
    # size, ops are greedily grouped so the group's combined operands stay
    # under ~11 GiB (at 512M els all ops together need ~20 GiB): ops in one
    # group share a round-robin window; cross-group/-size comparisons rely
    # on the per-cell min absorbing window drift.
    operand_bytes = {"copy_i32": 4, "copy_f32": 4, "reduce_i32": 4,
                     "reduce_i8": 1, "add2_i32": 8, "read3_i32": 12,
                     "bbox": 12}
    hbm_budget = 11 * 2**30
    times: dict[tuple[str, int], list[float]] = {}
    for n in sizes:
        groups, cur, cur_bytes = [], [], 0
        for name in names:
            b = operand_bytes.get(name, 12) * n
            if cur and cur_bytes + b > hbm_budget:
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append(name)
            cur_bytes += b
        if cur:
            groups.append(cur)
        for group in groups:
            cells = {}
            for name in group:
                bpe, make, loop = ops[name]
                data = make(n, sum(map(ord, name)) % 97)
                jax.block_until_ready(data)
                loop(data, jnp.int32(0))  # compile + warm
                cells[name] = (data, loop)
            for r in range(rounds):
                for name, (data, loop) in cells.items():
                    t0 = time.perf_counter()
                    int(loop(data, jnp.int32(1 + r)))
                    times.setdefault((name, n), []).append(
                        (time.perf_counter() - t0) / iters)
            del cells
        print(f"size {n // 2**20}M done", flush=True)

    # Per-op slope fit: t(n) = floor + slope * n  (min over rounds per cell)
    report = {}
    print(f"\n{'op':12s} {'B/el':>4s} " +
          " ".join(f"{s // 2**20:>7d}M" for s in sizes) +
          f" {'asym GB/s':>10s} {'floor ms':>9s}")
    for name in names:
        bpe = ops[name][0]
        ts = [min(times[(name, n)]) for n in sizes]
        A = np.vstack([np.ones(len(sizes)), np.array(sizes, float)]).T
        floor, slope = np.linalg.lstsq(A, np.array(ts), rcond=None)[0]
        asym = bpe / max(slope, 1e-15) / 1e9
        per_size = [bpe * n / t / 1e9 for n, t in zip(sizes, ts)]
        print(f"{name:12s} {bpe:>4d} " +
              " ".join(f"{g:8.1f}" for g in per_size) +
              f" {asym:10.1f} {floor * 1e3:9.2f}")
        report[name] = {
            "bytes_per_el": bpe,
            "gbs_by_size": {str(n // 2**20) + "M": round(g, 1)
                            for n, g in zip(sizes, per_size)},
            "asymptotic_gbs": round(asym, 1),
            "dispatch_floor_ms": round(floor * 1e3, 2),
        }

    asyms = [v["asymptotic_gbs"] for v in report.values()]
    lo_a, hi_a = min(asyms), max(asyms)
    verdict = ("FLAT: every op/dtype asymptotes to the same total-traffic "
               "rate -> backend/HBM cap, no kernel headroom"
               if hi_a < 1.35 * lo_a else
               "SPREAD: some ops exceed others by >35% -> the slower ones "
               "have headroom; chase the gap")
    print(f"\nasymptote spread: {lo_a:.0f}..{hi_a:.0f} GB/s total -> {verdict}")
    if args.json:
        args.json.write_text(json.dumps(
            {"device": str(jax.devices()[0]), "sizes_m": [s // 2**20 for s in sizes],
             "iters": iters, "rounds": rounds, "ops": report,
             "spread": [lo_a, hi_a], "verdict": verdict}, indent=1))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
