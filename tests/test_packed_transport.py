"""Packed-transport tests for GPS-time and class-dictionary columns.

The xyz bit-planar transport has its own suite (test_ops.py); these cover
the round-4 extensions: the (hi, lo) encoded GPS-time pair riding the same
planes (VERDICT #5) and the per-block class-dictionary codes (VERDICT #8).
Every case checks exactness against the unpacked kernels / a NumPy oracle,
including the f64 edge surface (-0.0, NaN, denormals, infinities,
full-range) and every dictionary size shape (1, 2, 16, 17, 256, absent
target)."""

import numpy as np
import pytest

import jax.numpy as jnp

from adhoc_queries_pointclouds_tpu import engine as eng
from adhoc_queries_pointclouds_tpu.engine import run_query
from adhoc_queries_pointclouds_tpu.formats import synth
from adhoc_queries_pointclouds_tpu.models.query import (
    BoundsQuery,
    ClassQuery,
    QueryPlan,
    TimeRangeQuery,
)
from adhoc_queries_pointclouds_tpu.ops import predicate as P
from adhoc_queries_pointclouds_tpu.utils.aabb import parse_aabb


def _pack_col(col_i32, k, base, block_size):
    row = np.zeros(P.packed_row_width(k, block_size), np.uint8)
    P.pack_bits_into(row, np.ascontiguousarray(col_i32, np.int32), k, base,
                     block_size)
    return row


def _packed_time_count(times_2d, q01, block_size):
    """Run one (K, B) f64 time batch through the REAL engine packing helpers
    (encode -> _residual_width -> planes -> residual-space query) and return
    (packed counts, unpacked counts)."""
    K, B = times_2d.shape
    assert B == block_size
    ths, tls, q_rows, whs, wls = [], [], [], [], []
    q_enc = np.asarray(
        P.encode_f64_scalar(q01[0]) + P.encode_f64_scalar(q01[1]), np.int32
    )
    for krow in range(K):
        th, tl = P.encode_f64_sortable(times_2d[krow])
        cols = eng._packed_time_cols(th, tl, block_size)
        ths.append((th, cols))
        q_rows.append(eng._packed_time_query(q_enc, cols["base"]))
        whs.append(int(cols["w"][0]))
        wls.append(int(cols["w"][1]))
    kh, kl = max(whs), max(wls)
    thp = np.stack([
        _pack_col(c["thp"], kh, int(c["base"][0]), block_size) for _, c in ths
    ])
    tlp = np.stack([
        _pack_col(c["tlp"], kl, int(c["base"][1]), block_size) for _, c in ths
    ])
    nvs = np.full(K, block_size, np.int32)
    packed = np.asarray(P.time_count_packed_jnp_multi(
        jnp.asarray(thp), jnp.asarray(tlp), jnp.asarray(np.stack(q_rows)),
        jnp.asarray(nvs), (kh, kl), block_size,
    ))
    raw_th = np.stack([t for t, _ in ths])
    raw_tl = np.stack([
        P.encode_f64_sortable(times_2d[krow])[1] for krow in range(K)
    ])
    unpacked = np.asarray(P.time_count_jnp_multi(
        jnp.asarray(raw_th), jnp.asarray(raw_tl),
        jnp.asarray(np.tile(q_enc, (K, 1))), jnp.asarray(nvs),
    ))
    return packed, unpacked


class TestPackedTimeKernels:
    def test_narrow_flightline_blocks(self):
        """Sorted narrow time ranges per block — the motivating case: the
        hi word packs to a handful of bits."""
        B = 1 << 10
        rng = np.random.default_rng(7)
        blocks = []
        for k in range(4):
            t0 = 100_000.0 + 50.0 * k
            blocks.append(np.sort(t0 + rng.uniform(0.0, 2.0, B)))
        times = np.stack(blocks)
        packed, unpacked = _packed_time_count(
            times, (100_025.0, 100_101.3), B
        )
        np.testing.assert_array_equal(packed, unpacked)
        assert unpacked.sum() > 0

    def test_edge_values_exact(self):
        """-0.0 / NaN / denormals / infinities / full-range magnitudes all
        agree with the unpacked predicate bit-for-bit."""
        B = 1 << 10
        rng = np.random.default_rng(8)
        edge = np.array([
            -0.0, 0.0, np.nan, -np.nan, np.inf, -np.inf,
            5e-324, -5e-324, 2.2250738585072014e-308,
            -1.7976931348623157e308, 1.7976931348623157e308,
            1.0, -1.0, 123456789.123456789,
        ])
        base = rng.uniform(-1e9, 1e9, B)
        base[: len(edge)] = edge
        times = np.stack([base, rng.normal(0.0, 1e-300, B)])
        for q in [(-1.0, 1.0), (0.0, np.inf), (-np.inf, 0.0),
                  (-np.inf, np.inf), (1e308, np.inf), (-1e-320, 1e-320)]:
            packed, unpacked = _packed_time_count(times, q, B)
            np.testing.assert_array_equal(packed, unpacked)

    def test_mask_matches_count(self):
        B = 1 << 10
        rng = np.random.default_rng(9)
        times = np.stack([rng.uniform(0.0, 1e6, B) for _ in range(2)])
        q_enc = np.asarray(
            P.encode_f64_scalar(2e5) + P.encode_f64_scalar(8e5), np.int32
        )
        th0, tl0 = P.encode_f64_sortable(times[0])
        th1, tl1 = P.encode_f64_sortable(times[1])
        cols = [eng._packed_time_cols(th0, tl0, B),
                eng._packed_time_cols(th1, tl1, B)]
        kh = max(int(c["w"][0]) for c in cols)
        kl = max(int(c["w"][1]) for c in cols)
        thp = np.stack([_pack_col(c["thp"], kh, int(c["base"][0]), B) for c in cols])
        tlp = np.stack([_pack_col(c["tlp"], kl, int(c["base"][1]), B) for c in cols])
        qs = np.stack([eng._packed_time_query(q_enc, c["base"]) for c in cols])
        nvs = np.asarray([B, B - 7], np.int32)
        mask = np.asarray(P.time_mask_packed_jnp_multi(
            jnp.asarray(thp), jnp.asarray(tlp), jnp.asarray(qs),
            jnp.asarray(nvs), (kh, kl), B,
        ))
        oracle = np.stack([
            (times[j] >= 2e5) & (times[j] < 8e5) for j in range(2)
        ])
        oracle[1, B - 7:] = False
        np.testing.assert_array_equal(mask, oracle)


class TestClassDictEncode:
    def test_native_matches_numpy_fallback(self):
        """aqpc_dict_encode_u8 == the pure-numpy bincount/LUT path."""
        from adhoc_queries_pointclouds_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(7)
        for n in [0, 1, 7, 8, 513, 100_003]:
            cls = rng.choice(
                np.asarray([0, 2, 5, 6, 9, 64, 255], np.uint8), size=n
            )
            got = native.dict_encode_u8(np.ascontiguousarray(cls))
            counts = np.bincount(cls, minlength=256)
            present = np.flatnonzero(counts).astype(np.uint8)
            lut = np.zeros(256, np.uint8)
            lut[present] = np.arange(len(present), dtype=np.uint8)
            np.testing.assert_array_equal(got[0], present)
            np.testing.assert_array_equal(got[1], lut[cls])

    @pytest.mark.parametrize("k", [1, 2, 4, 8])
    def test_native_u8_packer_matches_i32_packer(self, k):
        """aqpc_pack_bits_u8 writes the identical plane layout to
        aqpc_pack_bits on the widened column (base 0)."""
        from adhoc_queries_pointclouds_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        B = 1 << 9
        rng = np.random.default_rng(k)
        for n in [1, 7, 8, 9, B - 3, B]:
            codes = rng.integers(0, 1 << k, size=n).astype(np.uint8)
            row8 = np.full(P.packed_row_width(k, B), 0xAB, np.uint8)
            row32 = np.full(P.packed_row_width(k, B), 0xAB, np.uint8)
            assert native.pack_bits_u8(codes, k, row8, B)
            assert native.pack_bits(
                np.ascontiguousarray(codes, np.int32), 0, k, row32, B
            )
            np.testing.assert_array_equal(row8, row32)

    def test_roundtrip_all_256(self):
        cls = np.arange(256, dtype=np.uint8).repeat(3)
        present, codes = P.class_dict_encode(cls)
        assert len(present) == 256
        np.testing.assert_array_equal(present[codes], cls)

    @pytest.mark.parametrize("n_classes", [1, 2, 3, 15, 16, 17, 255, 256])
    def test_dict_count_matches_raw(self, n_classes):
        B = 1 << 9  # 512: % 8 == 0 so bit planes engage
        rng = np.random.default_rng(n_classes)
        values = rng.choice(256, size=n_classes, replace=False).astype(np.uint8)
        cls = rng.choice(values, size=B)
        cls[0] = values[0]  # every choice shape keeps >= 1 of the first value
        present, codes = P.class_dict_encode(cls)
        k = P.class_dict_width(len(present), B)
        targets_to_try = [int(values[0]), int(values[-1]),
                          int((int(values[0]) + 1) % 256)]
        for target in targets_to_try:
            pos = int(np.searchsorted(present, np.uint8(target)))
            tcode = (
                pos if pos < len(present) and int(present[pos]) == target
                else len(present)
            )
            cp = _pack_col(codes.astype(np.int32), k, 0, B)[None, :]
            got = np.asarray(P.class_count_dict_jnp_multi(
                jnp.asarray(cp), jnp.asarray([tcode], np.int32),
                jnp.asarray([B], np.int32), k, B,
            ))[0]
            assert got == int(np.count_nonzero(cls == target))

    def test_tail_alignments(self):
        B = 1 << 9
        rng = np.random.default_rng(3)
        cls = rng.choice(np.asarray([2, 6, 9], np.uint8), size=B)
        present, codes = P.class_dict_encode(cls)
        k = P.class_dict_width(len(present), B)
        cp = _pack_col(codes.astype(np.int32), k, 0, B)[None, :]
        tcode = int(np.searchsorted(present, np.uint8(6)))
        for nv in [0, 1, 7, 8, 9, B - 1, B]:
            got = np.asarray(P.class_count_dict_jnp_multi(
                jnp.asarray(cp), jnp.asarray([tcode], np.int32),
                jnp.asarray([nv], np.int32), k, B,
            ))[0]
            assert got == int(np.count_nonzero(cls[:nv] == 6))


@pytest.fixture(scope="module")
def mixed_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed_eng")
    files = synth.write_dataset(
        root, n_files=3, points_per_file=30_000, seed=41,
        formats=("last",), point_format=1,  # gps_time, no color
        classes=(1, 2, 6),
    )
    return root, files


class TestEnginePackedParity:
    """run_query with AQPC_PACK=1 (default) vs =0 must agree exactly on
    counts AND collected hit sets for time and class queries, including
    cap-overflow retries."""

    def _hits_key(self, res):
        rows = []
        for h in res.hits:
            for i in range(h.count):
                rows.append((h.file_idx, *np.round(h.position_world[i], 9)))
        return sorted(rows)

    @pytest.mark.parametrize("tiny_cap", [False, True])
    def test_time_query_parity(self, mixed_dataset, monkeypatch, tiny_cap):
        root, _ = mixed_dataset
        if tiny_cap:
            monkeypatch.setenv("AQPC_COLLECT_CAP", "16")
        plan = QueryPlan(time_range=TimeRangeQuery(100_000.0, 700_000.0))
        monkeypatch.setenv("AQPC_PACK", "0")
        r0 = run_query(root / "last", plan, block_size=1 << 13, keep_hits=True)
        monkeypatch.setenv("AQPC_PACK", "1")
        r1 = run_query(root / "last", plan, block_size=1 << 13, keep_hits=True)
        assert r1.match_count == r0.match_count > 0
        assert self._hits_key(r1) == self._hits_key(r0)

    @pytest.mark.parametrize("target,expect_hits", [(6, True), (19, False)])
    def test_class_query_parity(self, mixed_dataset, monkeypatch, target,
                                expect_hits):
        root, _ = mixed_dataset
        plan = QueryPlan(classification=ClassQuery(target))
        monkeypatch.setenv("AQPC_PACK", "0")
        r0 = run_query(root / "last", plan, block_size=1 << 13, keep_hits=True)
        monkeypatch.setenv("AQPC_PACK", "1")
        r1 = run_query(root / "last", plan, block_size=1 << 13, keep_hits=True)
        assert r1.match_count == r0.match_count
        assert (r1.match_count > 0) == expect_hits
        assert self._hits_key(r1) == self._hits_key(r0)

    def test_class_count_single_class_file(self, tmp_path, monkeypatch):
        """Single-class blocks resolve host-side (all-match and all-miss)."""
        synth.write_dataset(
            tmp_path, n_files=1, points_per_file=5_000, seed=5,
            formats=("last",), classes=(6,),
        )
        monkeypatch.setenv("AQPC_PACK", "1")
        hit = run_query(
            tmp_path / "last", QueryPlan(classification=ClassQuery(6)),
            block_size=1 << 12, use_index=False,
        )
        miss = run_query(
            tmp_path / "last", QueryPlan(classification=ClassQuery(7)),
            block_size=1 << 12, use_index=False,
        )
        assert hit.match_count == 5_000
        assert miss.match_count == 0

    @pytest.mark.parametrize("tiny_cap", [False, True])
    def test_density_query_parity(self, mixed_dataset, monkeypatch, tiny_cap):
        """Density rides packed xyz transport (absolute coords are
        reconstructed on device from residual planes + per-block base):
        winner SETS must be bit-identical to the unpacked engine, incl.
        the cap-overflow retry path."""
        from adhoc_queries_pointclouds_tpu.models.query import DensityConfig

        root, _ = mixed_dataset
        if tiny_cap:
            monkeypatch.setenv("AQPC_COLLECT_CAP", "16")
        plan = QueryPlan(
            bounds=BoundsQuery(parse_aabb("100050;200050;0;100600;200600;100")),
            density=DensityConfig(cell_size=7.0, scope="file"),
        )
        monkeypatch.setenv("AQPC_PACK", "0")
        r0 = run_query(root / "last", plan, block_size=1 << 13, keep_hits=True)
        monkeypatch.setenv("AQPC_PACK", "1")
        r1 = run_query(root / "last", plan, block_size=1 << 13, keep_hits=True)
        assert r1.match_count == r0.match_count > 0
        assert self._hits_key(r1) == self._hits_key(r0)

    def test_class_retry_path(self, mixed_dataset, monkeypatch):
        """Tiny cap forces the dictionary-code retry (class_compact on
        codes) — hit sets must still match the unpacked engine."""
        root, _ = mixed_dataset
        monkeypatch.setenv("AQPC_COLLECT_CAP", "8")
        plan = QueryPlan(classification=ClassQuery(2))
        monkeypatch.setenv("AQPC_PACK", "0")
        r0 = run_query(root / "last", plan, block_size=1 << 13, keep_hits=True)
        monkeypatch.setenv("AQPC_PACK", "1")
        r1 = run_query(root / "last", plan, block_size=1 << 13, keep_hits=True)
        assert r1.match_count == r0.match_count > 8
        assert self._hits_key(r1) == self._hits_key(r0)
