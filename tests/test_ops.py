"""Device-op tests: predicate kernels (jnp + pallas-interpret), compaction,
density segment-min — each against a NumPy oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu.ops import (
    GridSpec3D,
    bbox_count,
    block_grid_sample,
    block_grid_sample_masked,
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
    def _params(self, bounds, cell, scale=(0.001, 0.001, 0.001), offset=(0.0, 0.0, 0.0)):
        grid = GridSpec3D.create(bounds, cell)
        return grid, grid.device_params(scale, offset)

    def test_single_point(self):
        bounds = AABB((-5.0, -5.0, -5.0), (5.0, 5.0, 5.0))
        grid, params = self._params(bounds, 1.0, scale=(0.1, 0.1, 0.1))
        # world (-4.5, -4.6, -4.7) with scale 0.1 -> raw (-45, -46, -47)
        x = jnp.asarray(np.array([-45], np.int32))
        y = jnp.asarray(np.array([-46], np.int32))
        z = jnp.asarray(np.array([-47], np.int32))
        w = block_grid_sample(x, y, z, 0, 1, params)
        assert len(w) == 1
        assert w["gidx"][0] == 0

    def test_same_cell_keeps_closest_to_center(self):
        # reference test grid_sampling.rs:181-208: two points in cell 0 of a
        # 10m/1m grid from -5: center (-4.5,-4.5,-4.5); second point closer.
        bounds = AABB((-5.0, -5.0, -5.0), (5.0, 5.0, 5.0))
        grid, params = self._params(bounds, 1.0, scale=(0.1, 0.1, 0.1))
        x = jnp.asarray(np.array([-48, -45], np.int32))  # -4.8, -4.5
        y = jnp.asarray(np.array([-46, -44], np.int32))  # -4.6, -4.4
        z = jnp.asarray(np.array([-47, -46], np.int32))  # -4.7, -4.6
        w = block_grid_sample(x, y, z, 0, 2, params)
        assert len(w) == 1
        assert w["gidx"][0] == 1  # the closer point wins

    def test_different_cells_kept(self):
        bounds = AABB((-5.0, -5.0, -5.0), (5.0, 5.0, 5.0))
        grid, params = self._params(bounds, 1.0, scale=(0.1, 0.1, 0.1))
        x = jnp.asarray(np.array([-45, -35], np.int32))
        y = jnp.asarray(np.array([-46, -45], np.int32))
        z = jnp.asarray(np.array([-47, -44], np.int32))
        w = block_grid_sample(x, y, z, 0, 2, params)
        assert len(w) == 2

    def test_oracle_random(self):
        """Random cloud vs a dict-based NumPy oracle of SparseGrid semantics."""
        rng = np.random.default_rng(7)
        n = 5_000
        scale = (0.001, 0.001, 0.001)
        offset = (100.0, 200.0, 0.0)
        bounds = AABB((100.0, 200.0, 0.0), (110.0, 210.0, 5.0))
        cell = 1.0
        raw = rng.integers(0, 10_001, (n, 3), dtype=np.int64).astype(np.int32)
        raw[:, 2] //= 2
        world = raw.astype(np.float64) * scale + np.asarray(offset)

        grid, params = self._params(bounds, cell, scale=scale, offset=offset)
        w = block_grid_sample(
            jnp.asarray(raw[:, 0]), jnp.asarray(raw[:, 1]), jnp.asarray(raw[:, 2]),
            0, n, params,
        )
        state = merge_winners_host(None, w, 0)

        # oracle: reference insert_point semantics in f64
        dims = np.asarray(grid.dims, np.float64)
        bmin = np.asarray(bounds.min)
        ext = np.asarray(bounds.extent)
        cells = {}
        for i in range(n):
            c = tuple(np.floor((world[i] - bmin) * dims / ext).astype(np.int64))
            center = (np.asarray(c, np.float64) + 0.5) * cell + bmin
            d2 = float(np.sum((world[i] - center) ** 2))
            if c not in cells or d2 < cells[c][0]:
                cells[c] = (d2, i)
        oracle_idx = sorted(v[1] for v in cells.values())
        got_idx = sorted(state["gidx"].tolist())
        assert got_idx == oracle_idx

    def test_masked_sampling(self):
        bounds = AABB((0.0, 0.0, 0.0), (10.0, 10.0, 10.0))
        grid, params = self._params(bounds, 10.0, scale=(1.0, 1.0, 1.0))
        x = jnp.asarray(np.array([1, 2, 3], np.int32))
        y = jnp.asarray(np.array([1, 2, 3], np.int32))
        z = jnp.asarray(np.array([1, 2, 3], np.int32))
        mask = jnp.asarray(np.array([False, True, False]))
        w = block_grid_sample_masked(x, y, z, mask, 0, 3, params)
        assert len(w) == 1
        assert w["gidx"][0] == 1

    def test_cross_block_merge_tie_keeps_first(self):
        a = np.zeros(1, dtype=merge_winners_host.__globals__["WINNER_DTYPE"])
        a[0] = (0, 0, 1.0, 0, 5)
        b = np.zeros(1, dtype=a.dtype)
        b[0] = (0, 0, 1.0, 0, 9)  # same cell, same d2, later point
        state = merge_winners_host(None, a, 0)
        state = merge_winners_host(state, b, 0)
        assert len(state) == 1
        assert state["gidx"][0] == 5

    def test_cross_block_merge_better_wins(self):
        dt = merge_winners_host.__globals__["WINNER_DTYPE"]
        a = np.zeros(1, dtype=dt)
        a[0] = (0, 0, 1.0, 0, 5)
        b = np.zeros(1, dtype=dt)
        b[0] = (0, 0, 0.5, 0, 9)
        state = merge_winners_host(merge_winners_host(None, a, 0), b, 0)
        assert state["gidx"][0] == 9


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
