"""Device-op tests: predicate kernels (jnp + pallas-interpret), compaction,
density segment-min — each against a NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu.ops import (
    GridSpec3D,
    bbox_count,
    block_density_candidates,
    class_count,
    compact,
    merge_winners_host,
)
from adhoc_queries_pointclouds_tpu.ops.predicate import (
    MIN_BLOCK_MULTIPLE,
    bbox_count_jnp,
    bbox_mask_jnp,
    class_count_jnp,
)
from adhoc_queries_pointclouds_tpu.utils.aabb import AABB


def _random_block(n, seed=0, pad_to=None):
    rng = np.random.default_rng(seed)
    pad_to = pad_to or n
    x = np.zeros(pad_to, np.int32)
    y = np.zeros(pad_to, np.int32)
    z = np.zeros(pad_to, np.int32)
    x[:n] = rng.integers(-(2**30), 2**30, n, dtype=np.int64).astype(np.int32)
    y[:n] = rng.integers(-(2**30), 2**30, n, dtype=np.int64).astype(np.int32)
    z[:n] = rng.integers(-(2**30), 2**30, n, dtype=np.int64).astype(np.int32)
    return x, y, z


class TestPredicates:
    def test_bbox_count_vs_oracle(self):
        n = 10_000
        x, y, z = _random_block(n, seed=1)
        lo = np.array([-(2**29), -(2**28), -(2**30)], np.int32)
        hi = np.array([2**29, 2**30, 2**27], np.int32)
        oracle = int(
            np.sum(
                (x >= lo[0]) & (x <= hi[0])
                & (y >= lo[1]) & (y <= hi[1])
                & (z >= lo[2]) & (z <= hi[2])
            )
        )
        got = int(bbox_count(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
                             jnp.asarray(lo), jnp.asarray(hi), n, impl="jnp"))
        assert got == oracle

    def test_bbox_count_respects_n_valid(self):
        n = 1000
        x, y, z = _random_block(n, seed=2, pad_to=4096)
        lo = np.full(3, -(2**31), np.int32)
        hi = np.full(3, 2**31 - 1, np.int32)
        # full int32 box matches everything valid — padding must not count
        got = int(bbox_count(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
                             jnp.asarray(lo), jnp.asarray(hi), n, impl="jnp"))
        assert got == n

    def test_bbox_pallas_interpret_matches_jnp(self):
        n = MIN_BLOCK_MULTIPLE  # one tile
        x, y, z = _random_block(n - 321, seed=3, pad_to=n)
        lo = np.array([-(2**29), 0, -(2**30)], np.int32)
        hi = np.array([2**29, 2**30 - 1, 0], np.int32)
        args = (jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
                jnp.asarray(lo), jnp.asarray(hi), n - 321)
        ref = int(bbox_count(*args, impl="jnp"))
        got = int(bbox_count(*args, impl="pallas_interpret"))
        assert got == ref

    def test_class_count_vs_oracle(self):
        rng = np.random.default_rng(4)
        cls = rng.integers(0, 8, 50_000, dtype=np.int64).astype(np.uint8)
        got = int(class_count(jnp.asarray(cls), jnp.asarray(3), len(cls), impl="jnp"))
        assert got == int(np.sum(cls == 3))
        # class 19 never present (paper's "noclass" experiment)
        got19 = int(class_count(jnp.asarray(cls), jnp.asarray(19), len(cls), impl="jnp"))
        assert got19 == 0

    def test_class_pallas_interpret_matches_jnp(self):
        n = MIN_BLOCK_MULTIPLE
        rng = np.random.default_rng(5)
        cls = rng.integers(0, 8, n, dtype=np.int64).astype(np.uint8)
        nv = n - 4567
        ref = int(class_count(jnp.asarray(cls), jnp.asarray(6), nv, impl="jnp"))
        got = int(class_count(jnp.asarray(cls), jnp.asarray(6), nv, impl="pallas_interpret"))
        assert got == ref


class TestCompaction:
    def test_compact_indices_sorted_and_exact(self):
        rng = np.random.default_rng(6)
        mask = rng.random(8192) < 0.1
        cnt = int(mask.sum())
        cap = compact.pow2_bucket(cnt, 8192)
        idx, got_cnt = compact.compact_indices(jnp.asarray(mask), cap=cap)
        assert int(got_cnt) == cnt
        np.testing.assert_array_equal(np.asarray(idx)[:cnt], np.nonzero(mask)[0])
        assert np.all(np.asarray(idx)[cnt:] == 8192)

    def test_pow2_bucket(self):
        assert compact.pow2_bucket(0, 1024) == 0
        assert compact.pow2_bucket(1, 1024) == 1
        assert compact.pow2_bucket(3, 1024) == 4
        assert compact.pow2_bucket(1024, 1024) == 1024
        assert compact.pow2_bucket(1025, 1024) == 1024


class TestDensity:
    """Device candidate selection + host-exact f64 resolution vs an
    independent oracle that replicates the reference SparseGrid math
    (grid_sampling.rs:18-105) including `as u64` truncation/saturation and
    the per-axis bit-mask key wrap."""

    @staticmethod
    def _oracle(world, bounds, cell_size):
        """dict of masked-key -> (d2, first-strictly-closest index)."""
        bmin = np.asarray(bounds.min, np.float64)
        ext = np.asarray(bounds.max, np.float64) - bmin
        ncf = np.ceil(ext / cell_size)
        dims = np.maximum(ncf, 0.0)
        bits = []
        for v in ncf:
            b = np.ceil(np.log2(v)) if v > 0 else -np.inf
            bits.append(int(max(b, 0.0)) if np.isfinite(b) else 0)
        masks = [(1 << b) - 1 for b in bits]
        cells = {}
        for i in range(len(world)):
            with np.errstate(divide="ignore", invalid="ignore"):
                r = (world[i] - bmin) * dims / ext
            c = []
            for v in r:
                if np.isnan(v) or v < 0:
                    c.append(0)
                elif v >= 2.0**64:
                    c.append(2**64 - 1)
                else:
                    c.append(int(v))
            key = (
                (c[0] & masks[0])
                | ((c[1] & masks[1]) << bits[0])
                | ((c[2] & masks[2]) << (bits[0] + bits[1]))
            )
            center = (np.asarray(c, np.float64) + 0.5) * cell_size + bmin
            d2 = float(np.sum((world[i] - center) ** 2))
            if key not in cells or d2 < cells[key][0]:
                cells[key] = (d2, i)
        return cells

    @staticmethod
    def _run(raw, scale, offset, bounds, cell, mask=None, base=0, state=None,
             file_idx=0, cap=None):
        from adhoc_queries_pointclouds_tpu.ops.density import (
            GridSpec3D, block_density_candidates, merge_winners_host,
        )

        grid = GridSpec3D.create(bounds, cell)
        tables = {
            k: jnp.asarray(v) for k, v in grid.file_tables(scale, offset).items()
        }
        n = len(raw)
        m = jnp.ones(n, bool) if mask is None else jnp.asarray(mask)
        cap = cap or max(n, 1)
        cnt, idx = block_density_candidates(
            jnp.asarray(raw[:, 0]), jnp.asarray(raw[:, 1]), jnp.asarray(raw[:, 2]),
            m, n, tables, cap=cap,
        )
        c = int(cnt)
        assert c <= cap
        local = np.asarray(idx[:c], np.int64)
        world = raw[local].astype(np.float64) * np.asarray(scale) + np.asarray(offset)
        winners = grid.make_winners(world, local + base, file_idx)
        return merge_winners_host(state, winners), grid

    def test_single_point(self):
        bounds = AABB((-5.0, -5.0, -5.0), (5.0, 5.0, 5.0))
        raw = np.array([[-45, -46, -47]], np.int32)  # world (-4.5,-4.6,-4.7)
        state, _ = self._run(raw, (0.1, 0.1, 0.1), (0.0, 0.0, 0.0), bounds, 1.0)
        assert len(state) == 1 and state["gidx"][0] == 0

    def test_same_cell_keeps_closest_to_center(self):
        # reference test grid_sampling.rs:181-208
        bounds = AABB((-5.0, -5.0, -5.0), (5.0, 5.0, 5.0))
        raw = np.array([[-48, -46, -47], [-45, -44, -46]], np.int32)
        state, _ = self._run(raw, (0.1, 0.1, 0.1), (0.0, 0.0, 0.0), bounds, 1.0)
        assert len(state) == 1 and state["gidx"][0] == 1

    def test_different_cells_kept(self):
        bounds = AABB((-5.0, -5.0, -5.0), (5.0, 5.0, 5.0))
        raw = np.array([[-45, -46, -47], [-35, -45, -44]], np.int32)
        state, _ = self._run(raw, (0.1, 0.1, 0.1), (0.0, 0.0, 0.0), bounds, 1.0)
        assert len(state) == 2

    def test_masked_sampling(self):
        bounds = AABB((0.0, 0.0, 0.0), (10.0, 10.0, 10.0))
        raw = np.array([[1, 1, 1], [2, 2, 2], [3, 3, 3]], np.int32)
        mask = np.array([False, True, False])
        state, _ = self._run(raw, (1.0,) * 3, (0.0,) * 3, bounds, 10.0, mask=mask)
        assert len(state) == 1 and state["gidx"][0] == 1

    def test_oracle_random(self):
        rng = np.random.default_rng(7)
        n = 5_000
        scale, offset = (0.001, 0.001, 0.001), (100.0, 200.0, 0.0)
        bounds = AABB((100.0, 200.0, 0.0), (110.0, 210.0, 5.0))
        raw = rng.integers(0, 10_001, (n, 3), dtype=np.int64).astype(np.int32)
        raw[:, 2] //= 2
        state, _ = self._run(raw, scale, offset, bounds, 1.0)
        world = raw.astype(np.float64) * scale + np.asarray(offset)
        oracle = self._oracle(world, bounds, 1.0)
        assert sorted(state["gidx"].tolist()) == sorted(v[1] for v in oracle.values())

    def test_boundary_epsilon_points_exact(self):
        """Points at the closest representable coordinates around every cell
        boundary (and exactly ON f64-exact boundaries) must land in the
        reference's f64 cell — no tolerance. This is where a pure-f32 kernel
        diverges; the exact integer boundary tables must not."""
        from adhoc_queries_pointclouds_tpu.ops.density import GridSpec3D

        scale, offset = (0.001, 0.002, 0.0005), (100.0, -50.0, 3.0)
        bounds = AABB((100.0, -50.0, 3.0), (107.3, -42.7, 9.1))
        cell = 0.7300000000000001
        grid = GridSpec3D.create(bounds, cell)
        tables = grid.file_tables(scale, offset)
        pts = []
        for ax, name in enumerate("xyz"):
            b = tables[f"b{name}"].astype(np.int64)
            interior = b[(b > -2**31) & (b < 2**31 - 1)]
            for t in interior[1:-1]:
                for delta in (-1, 0, 1):
                    v = int(np.clip(t + delta, -2**31 + 1, 2**31 - 2))
                    p = [5000, 5000, 5000]
                    p[ax] = v
                    pts.append(p)
        raw = np.asarray(pts, np.int32)
        state, _ = self._run(raw, scale, offset, bounds, cell)
        world = raw.astype(np.float64) * scale + np.asarray(offset)
        oracle = self._oracle(world, bounds, cell)
        assert sorted(state["gidx"].tolist()) == sorted(v[1] for v in oracle.values())

    def test_exact_integer_boundaries(self):
        """World coordinates that are exactly representable on cell edges:
        scale 0.001, cell 1.0 -> every 1000th raw coord sits exactly on a
        boundary in f64."""
        bounds = AABB((0.0, 0.0, 0.0), (10.0, 10.0, 10.0))
        vals = [0, 999, 1000, 1001, 4999, 5000, 5001, 9999, 10000]
        raw = np.asarray(
            [[a, b, c] for a in vals for b in vals for c in vals], np.int32
        )
        state, _ = self._run(raw, (0.001,) * 3, (0.0,) * 3, bounds, 1.0)
        world = raw.astype(np.float64) * 0.001
        oracle = self._oracle(world, bounds, 1.0)
        assert sorted(state["gidx"].tolist()) == sorted(v[1] for v in oracle.values())

    def test_max_face_pow2_wrap(self):
        """dims = 8 (power of two): a point exactly on the max face truncates
        to cell 8, whose 3-bit mask wraps to 0 — it must compete with cell-0
        points under the reference's key-wrap semantics, with d2 measured to
        the UNMASKED cell-8 center."""
        bounds = AABB((0.0, 0.0, 0.0), (8.0, 8.0, 8.0))
        raw = np.array(
            [[100, 100, 100], [8000, 100, 100]], np.int32  # w=(0.1..), (8.0,..)
        )
        state, _ = self._run(raw, (0.001,) * 3, (0.0,) * 3, bounds, 1.0)
        world = raw.astype(np.float64) * 0.001
        oracle = self._oracle(world, bounds, 1.0)
        assert sorted(state["gidx"].tolist()) == sorted(v[1] for v in oracle.values())
        # both share key 0 -> exactly one winner
        assert len(state) == 1

    def test_near_tie_d2_resolved_in_f64(self):
        """Two points whose d2 differ by ~1e-12 relative: f32 cannot order
        them; the candidate margin must pass both to the exact host merge."""
        bounds = AABB((0.0, 0.0, 0.0), (10.0, 10.0, 10.0))
        scale = (1e-7, 1e-7, 1e-7)
        # cell 0 center at (0.5, 0.5, 0.5) = raw 5e6; two opposite offsets
        c = 5_000_000
        raw = np.array(
            [[c + 1000, c, c], [c - 1001, c, c], [c, c + 1000, c]], np.int32
        )
        state, _ = self._run(raw, scale, (0.0,) * 3, bounds, 1.0)
        world = raw.astype(np.float64) * np.asarray(scale)
        oracle = self._oracle(world, bounds, 1.0)
        assert sorted(state["gidx"].tolist()) == sorted(v[1] for v in oracle.values())

    def test_exact_tie_keeps_first_inserted(self):
        """Exactly equidistant points: strict < keeps the first inserted."""
        bounds = AABB((0.0, 0.0, 0.0), (10.0, 10.0, 10.0))
        c = 500  # center of cell 0 at raw 500 (scale 0.001, cell 1.0)
        raw = np.array([[c + 100, c, c], [c - 100, c, c]], np.int32)
        state, _ = self._run(raw, (0.001,) * 3, (0.0,) * 3, bounds, 1.0)
        assert len(state) == 1 and state["gidx"][0] == 0

    def test_cross_block_merge_tie_keeps_first(self):
        from adhoc_queries_pointclouds_tpu.ops.density import (
            WINNER_DTYPE, merge_winners_host,
        )

        a = np.zeros(1, dtype=WINNER_DTYPE)
        a[0] = (0, 1.0, 0, 5)
        b = np.zeros(1, dtype=WINNER_DTYPE)
        b[0] = (0, 1.0, 0, 9)  # same cell, same d2, later point
        state = merge_winners_host(merge_winners_host(None, a), b)
        assert len(state) == 1 and state["gidx"][0] == 5

    def test_cross_block_merge_better_wins(self):
        from adhoc_queries_pointclouds_tpu.ops.density import (
            WINNER_DTYPE, merge_winners_host,
        )

        a = np.zeros(1, dtype=WINNER_DTYPE)
        a[0] = (0, 1.0, 0, 5)
        b = np.zeros(1, dtype=WINNER_DTYPE)
        b[0] = (0, 0.5, 0, 9)
        state = merge_winners_host(merge_winners_host(None, a), b)
        assert state["gidx"][0] == 9

    def test_candidate_cap_overflow_detected(self):
        """counts report the true candidate total even when idx truncates."""
        from adhoc_queries_pointclouds_tpu.ops.density import (
            GridSpec3D, block_density_candidates,
        )

        bounds = AABB((0.0, 0.0, 0.0), (10.0, 10.0, 10.0))
        grid = GridSpec3D.create(bounds, 0.001)  # every point its own cell
        tables = {
            k: jnp.asarray(v)
            for k, v in grid.file_tables((0.001,) * 3, (0.0,) * 3).items()
        }
        rng = np.random.default_rng(2)
        raw = rng.integers(0, 10000, (512, 3), dtype=np.int64).astype(np.int32)
        cnt, idx = block_density_candidates(
            jnp.asarray(raw[:, 0]), jnp.asarray(raw[:, 1]), jnp.asarray(raw[:, 2]),
            jnp.ones(512, bool), 512, tables, cap=16,
        )
        assert int(cnt) > 16  # true count, not clamped


class TestMultiBlock:
    def test_bbox_multi_jnp_vs_single(self):
        from adhoc_queries_pointclouds_tpu.ops.predicate import (
            bbox_count_jnp, bbox_count_jnp_multi,
        )
        import jax.numpy as jnp
        rng = np.random.default_rng(8)
        K, B = 3, 4096
        xs = rng.integers(-2**30, 2**30, (K, B)).astype(np.int32)
        ys = rng.integers(-2**30, 2**30, (K, B)).astype(np.int32)
        zs = rng.integers(-2**30, 2**30, (K, B)).astype(np.int32)
        los = rng.integers(-2**29, 0, (K, 3)).astype(np.int32)
        his = rng.integers(0, 2**29, (K, 3)).astype(np.int32)
        nvs = np.array([B, B - 100, 0], np.int32)
        multi = np.asarray(bbox_count_jnp_multi(
            jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(zs),
            jnp.asarray(los), jnp.asarray(his), jnp.asarray(nvs)))
        for k in range(K):
            single = int(bbox_count_jnp(
                jnp.asarray(xs[k]), jnp.asarray(ys[k]), jnp.asarray(zs[k]),
                jnp.asarray(los[k]), jnp.asarray(his[k]), jnp.asarray(nvs[k])))
            assert multi[k] == single

    def test_bbox_multi_pallas_interpret(self):
        import jax
        import jax.numpy as jnp
        from jax.experimental import pallas as pl  # noqa: F401
        from adhoc_queries_pointclouds_tpu.ops import predicate as P

        rng = np.random.default_rng(9)
        K, B = 2, P.MIN_BLOCK_MULTIPLE
        xs = rng.integers(-2**30, 2**30, (K, B)).astype(np.int32)
        los = np.tile(np.array([-2**29, 0, -2**28], np.int32), (K, 1))
        his = np.tile(np.array([2**29, 2**28, 2**27], np.int32), (K, 1))
        nvs = np.array([B, B - 777], np.int32)
        ref = np.asarray(P.bbox_count_jnp_multi(
            jnp.asarray(xs), jnp.asarray(xs), jnp.asarray(xs),
            jnp.asarray(los), jnp.asarray(his), jnp.asarray(nvs)))
        # interpret-mode pallas multi kernel
        import functools
        with jax.disable_jit(False):
            from jax.experimental.pallas import tpu as pltpu
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(P.bbox_count_pallas_multi(
                    jnp.asarray(xs), jnp.asarray(xs), jnp.asarray(xs),
                    jnp.asarray(los), jnp.asarray(his), jnp.asarray(nvs)))
        np.testing.assert_array_equal(got, ref)

    def test_class_multi_vs_oracle(self):
        from adhoc_queries_pointclouds_tpu.ops.predicate import class_count_jnp_multi
        import jax.numpy as jnp
        rng = np.random.default_rng(10)
        K, B = 4, 2048
        cls = rng.integers(0, 8, (K, B)).astype(np.uint8)
        targets = np.array([1, 6, 19, 3], np.int32)
        nvs = np.array([B, B, B, 500], np.int32)
        got = np.asarray(class_count_jnp_multi(
            jnp.asarray(cls), jnp.asarray(targets), jnp.asarray(nvs)))
        for k in range(K):
            oracle = int(np.sum(cls[k, :nvs[k]] == targets[k]))
            assert got[k] == oracle


class TestGpsTimeEncoding:
    """Order-preserving f64 -> (i32, i32) split encoding for device-side
    GPS-time predicates (exact f64 semantics with int32 compares)."""

    def test_encoding_preserves_total_order(self):
        import numpy as np
        from adhoc_queries_pointclouds_tpu.ops.predicate import encode_f64_sortable

        rng = np.random.default_rng(3)
        vals = np.concatenate([
            rng.uniform(-1e9, 1e9, 3000),
            rng.uniform(-1e-300, 1e-300, 100),  # subnormal-adjacent
            np.array([0.0, -0.0, 1e-308, -1e-308, np.inf, -np.inf,
                      1.0, np.nextafter(1.0, 2.0), np.nextafter(1.0, 0.0)]),
        ])
        hi, lo = encode_f64_sortable(vals)
        # lexicographic (hi, lo) order == f64 order (stable total order on
        # non-NaN; -0.0 sorts before +0.0 which a >=/< range cannot observe
        # except at the exact boundary 0.0 where -0.0 == 0.0 numerically)
        key = hi.astype(np.int64) * (1 << 32) + (lo.astype(np.int64) & 0xFFFFFFFF)
        finite = vals[~np.isnan(vals)]
        kf = key[~np.isnan(vals)]
        order_f = np.argsort(finite, kind="stable")
        order_k = np.argsort(kf, kind="stable")
        np.testing.assert_array_equal(finite[order_f], finite[order_k])

    def test_range_mask_matches_f64_oracle(self):
        import numpy as np
        import jax.numpy as jnp
        from adhoc_queries_pointclouds_tpu.ops.predicate import (
            encode_f64_scalar, encode_f64_sortable, time_mask_jnp,
        )

        rng = np.random.default_rng(4)
        t = rng.uniform(0.0, 1e6, 8192)
        # adversarial: values exactly at the range endpoints
        t[:4] = [250_000.0, np.nextafter(250_000.0, 0), 600_000.0,
                 np.nextafter(600_000.0, 0)]
        th, tl = encode_f64_sortable(t)
        q = np.asarray(
            encode_f64_scalar(250_000.0) + encode_f64_scalar(600_000.0), np.int32
        )
        got = np.asarray(
            time_mask_jnp(jnp.asarray(th), jnp.asarray(tl), jnp.asarray(q),
                          jnp.asarray(len(t), jnp.int32))
        )
        oracle = (t >= 250_000.0) & (t < 600_000.0)
        np.testing.assert_array_equal(got, oracle)
