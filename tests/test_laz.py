"""LASzip (LAZ) codec tests: roundtrip parity across point formats, chunk
boundaries, hit-only gathering, and engine end-to-end on .laz datasets."""

import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu import native
from adhoc_queries_pointclouds_tpu.engine import run_query
from adhoc_queries_pointclouds_tpu.formats import LazFile, las_to_laz, open_point_cloud, synth
from adhoc_queries_pointclouds_tpu.formats.laz import write_laz
from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, ClassQuery, QueryPlan
from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

pytestmark = pytest.mark.skipif(not native.available(), reason="native codec unavailable")


@pytest.mark.parametrize("fmt", [0, 1, 2, 3])
def test_laz_roundtrip_all_formats(tmp_path, fmt):
    cloud = synth.make_cloud(37_500, seed=fmt, point_format=fmt)
    p = tmp_path / f"f{fmt}.laz"
    write_laz(p, cloud.header, cloud.columns(), chunk_size=10_000)
    f = LazFile(p)
    assert f.num_chunks == 4  # 3 full + 1 partial (7500)
    np.testing.assert_array_equal(f.column("position"), cloud.position_raw)
    np.testing.assert_array_equal(f.column("classification"), cloud.classification)
    np.testing.assert_array_equal(f.column("intensity"), cloud.intensity)
    if cloud.header.has_color:
        np.testing.assert_array_equal(f.column("color"), cloud.color)
    if cloud.gps_time is not None:
        np.testing.assert_array_equal(f.column("gps_time"), cloud.gps_time)
    f.close()


def test_laz_compresses_smooth_data(tmp_path):
    """Sorted (scan-like) coordinates must compress well below raw size."""
    cloud = synth.make_cloud(100_000, seed=9, point_format=0)
    order = np.lexsort((cloud.position_raw[:, 1], cloud.position_raw[:, 0]))
    cloud.position_raw[:] = cloud.position_raw[order]
    synth.write_cloud_las(cloud, tmp_path / "s.las")
    las_to_laz(tmp_path / "s.las", tmp_path / "s.laz")
    raw = (tmp_path / "s.las").stat().st_size
    comp = (tmp_path / "s.laz").stat().st_size
    assert comp < raw * 0.6, f"poor compression: {comp}/{raw}"
    f = LazFile(tmp_path / "s.laz")
    np.testing.assert_array_equal(f.column("position"), cloud.position_raw)
    f.close()


def test_laz_ranged_column_and_take(tmp_path):
    cloud = synth.make_cloud(25_000, seed=4, point_format=2)
    p = tmp_path / "r.laz"
    write_laz(p, cloud.header, cloud.columns(), chunk_size=7_000)
    f = LazFile(p)
    np.testing.assert_array_equal(
        f.column("position", 6_500, 14_500), cloud.position_raw[6_500:14_500]
    )
    rng = np.random.default_rng(0)
    idx = rng.choice(25_000, size=500, replace=False)
    got = f.take(idx, ("position", "classification", "color", "intensity"))
    np.testing.assert_array_equal(got["position"], cloud.position_raw[idx])
    np.testing.assert_array_equal(got["classification"], cloud.classification[idx])
    np.testing.assert_array_equal(got["color"], cloud.color[idx])
    np.testing.assert_array_equal(got["intensity"], cloud.intensity[idx])
    f.close()


def test_laz_single_point_and_tiny(tmp_path):
    for n in (1, 2, 3):
        cloud = synth.make_cloud(n, seed=n, point_format=2)
        p = tmp_path / f"tiny{n}.laz"
        write_laz(p, cloud.header, cloud.columns(), chunk_size=50_000)
        f = LazFile(p)
        np.testing.assert_array_equal(f.column("position"), cloud.position_raw)
        f.close()


def test_laz_repeated_values_compress(tmp_path):
    """Heavily repeated attributes (single class, constant intensity)."""
    cloud = synth.make_cloud(30_000, seed=5, point_format=2, classes=(2,))
    cloud.intensity[:] = 7
    p = tmp_path / "rep.laz"
    write_laz(p, cloud.header, cloud.columns())
    f = LazFile(p)
    np.testing.assert_array_equal(f.column("classification"), cloud.classification)
    np.testing.assert_array_equal(f.column("intensity"), cloud.intensity)
    f.close()


class TestLazEngine:
    @pytest.fixture(scope="class")
    def laz_dataset(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("lazds")
        files = synth.write_dataset(
            root, n_files=2, points_per_file=30_000, seed=13, formats=("las", "laz")
        )
        return root, files

    def test_bbox_count_parity_vs_las(self, laz_dataset):
        root, files = laz_dataset
        box = AABB((100200.0, 200300.0, 10.0), (100900.0, 200900.0, 80.0))
        plan = QueryPlan(bounds=BoundsQuery(box))
        las_count = run_query(root / "las", plan, block_size=1 << 14).match_count
        laz_count = run_query(root / "laz", plan, block_size=1 << 14).match_count
        assert las_count == laz_count > 0

    def test_class_count_parity_vs_las(self, laz_dataset):
        root, files = laz_dataset
        plan = QueryPlan(classification=ClassQuery(6))
        las_count = run_query(root / "las", plan, block_size=1 << 14).match_count
        laz_count = run_query(root / "laz", plan, block_size=1 << 14).match_count
        assert las_count == laz_count > 0

    def test_collect_from_laz(self, laz_dataset, tmp_path):
        root, files = laz_dataset
        box = AABB((100200.0, 200300.0, 10.0), (100900.0, 200900.0, 80.0))
        res = run_query(
            root / "laz",
            QueryPlan(bounds=BoundsQuery(box), output_dir=tmp_path),
            block_size=1 << 14,
            keep_hits=True,
        )
        assert res.match_count > 0
        pts = np.concatenate([h.position_world for h in res.hits if h.count])
        assert np.all(box.contains_points(pts))


def _rich_columns(n, fmt, seed):
    """Adversarial LAS 1.4 columns: scanner-channel switches, multi-returns,
    varied flags/angles/classes — exercises every POINT14 v3 layer."""
    rng = np.random.default_rng(seed)
    cloud = synth.make_cloud(n, seed=seed, point_format=fmt)
    cols = cloud.columns()
    nret = rng.integers(1, 16, n).astype(np.uint16)
    ret = (rng.integers(0, 15, n) % nret + 1).astype(np.uint16)
    channel = rng.choice([0, 0, 0, 1, 2, 3], n).astype(np.uint16)  # mostly 0
    class_flags = rng.integers(0, 16, n).astype(np.uint16)
    dirf = rng.integers(0, 2, n).astype(np.uint16)
    edge = rng.integers(0, 2, n).astype(np.uint16)
    cols["flags"] = (
        (ret | (nret << 4))
        | ((class_flags | (channel << 4) | (dirf << 6) | (edge << 7)) << 8)
    ).astype(np.uint16)
    cols["scan_angle"] = rng.integers(-30000, 30000, n).astype(np.int16)
    cols["user_data"] = rng.integers(0, 256, n).astype(np.uint8)
    cols["point_source"] = rng.integers(0, 5000, n).astype(np.uint16)
    cols["gps_time"] = np.sort(rng.uniform(1e5, 2e5, n))  # scan-like times
    if fmt == 8:
        cols["nir"] = rng.integers(0, 2**16, n).astype(np.uint16)
    return cloud.header, cols


@pytest.mark.parametrize("fmt", [6, 7, 8])
def test_laz_v3_roundtrip_extended_formats(tmp_path, fmt):
    """LASzip v3 layered chunks: every field of formats 6-8 roundtrips
    bit-exactly, including scanner-channel context switches."""
    header, cols = _rich_columns(23_000, fmt, seed=60 + fmt)
    p = tmp_path / f"f{fmt}.laz"
    write_laz(p, header, cols, chunk_size=6_000)
    f = LazFile(p)
    assert f.is14 and f.num_chunks == 4
    pos = np.stack([cols["position"][:, 0], cols["position"][:, 1],
                    cols["position"][:, 2]], axis=1)
    np.testing.assert_array_equal(f.column("position"), pos)
    for name in ("intensity", "flags", "classification", "user_data",
                 "scan_angle", "point_source", "gps_time"):
        np.testing.assert_array_equal(f.column(name), cols[name], err_msg=name)
    if fmt >= 7:
        np.testing.assert_array_equal(f.column("color"), cols["color"])
    if fmt == 8:
        np.testing.assert_array_equal(f.column("nir"), cols["nir"])
    # hit-only gather path
    rng = np.random.default_rng(1)
    idx = rng.choice(23_000, size=400, replace=False)
    got = f.take(idx, ("position", "classification", "gps_time"))
    np.testing.assert_array_equal(got["position"], pos[idx])
    np.testing.assert_array_equal(got["gps_time"], cols["gps_time"][idx])
    f.close()


def test_laz_v3_compresses(tmp_path):
    header, cols = _rich_columns(60_000, 6, seed=70)
    order = np.lexsort((cols["position"][:, 1], cols["position"][:, 0]))
    cols["position"] = cols["position"][order]
    p = tmp_path / "v3.laz"
    write_laz(p, header, cols)
    raw = header.point_count * header.point_record_length
    assert p.stat().st_size < raw * 0.75, f"poor v3 compression: {p.stat().st_size}/{raw}"


def test_laz_variable_chunks(tmp_path):
    """Variable-size-chunk container (VLR chunk_size == u32::MAX): the chunk
    table stores (count, size) pairs; ragged chunk spans must decode and
    gather exactly."""
    cloud = synth.make_cloud(20_000, seed=5, point_format=1)
    p = tmp_path / "var.laz"
    counts = [3_000, 9_000, 500, 6_000, 1_500]
    write_laz(p, cloud.header, cloud.columns(), variable_chunk_counts=counts)
    f = LazFile(p)
    assert f.variable_chunks and f.num_chunks == 5
    assert [f.points_in_chunk(i) for i in range(5)] == counts
    np.testing.assert_array_equal(f.column("position"), cloud.position_raw)
    np.testing.assert_array_equal(f.column("gps_time"), cloud.gps_time)
    # ranged read across ragged chunk boundaries
    np.testing.assert_array_equal(
        f.column("position", 2_900, 12_700), cloud.position_raw[2_900:12_700]
    )
    idx = np.random.default_rng(2).choice(20_000, 300, replace=False)
    got = f.take(idx, ("position", "intensity"))
    np.testing.assert_array_equal(got["intensity"], cloud.intensity[idx])
    f.close()


def test_laz_deferred_chunk_table_recovery(tmp_path):
    """Streaming writers put -1 at the chunk-table slot and the real offset
    in the file's last 8 bytes; the reader must recover it."""
    cloud = synth.make_cloud(12_000, seed=6, point_format=2)
    p = tmp_path / "defer.laz"
    write_laz(p, cloud.header, cloud.columns(), chunk_size=5_000,
              defer_chunk_table=True)
    import struct

    raw = p.read_bytes()
    h = open_point_cloud.__module__  # noqa: F841 (import side check only)
    from adhoc_queries_pointclouds_tpu.formats.las import parse_las_header

    hdr = parse_las_header(raw[:512])
    (slot,) = struct.unpack_from("<q", raw, hdr.offset_to_point_data)
    assert slot == -1
    f = LazFile(p)
    np.testing.assert_array_equal(f.column("position"), cloud.position_raw)
    f.close()


def test_laz_v3_engine_parity(tmp_path):
    """Engine end-to-end on a format-7 .laz dataset: bbox and class counts
    match the LAS oracle exactly."""
    files = synth.write_dataset(
        tmp_path, n_files=2, points_per_file=15_000, seed=57,
        formats=("las", "laz"), point_format=7,
    )
    box = AABB((100200.0, 200300.0, 10.0), (100900.0, 200900.0, 70.0))
    oracle_b = 0
    oracle_c = 0
    for p in files["las"]:
        r = open_point_cloud(p)
        w = r.positions_world()
        oracle_b += int(np.sum(box.contains_points(w)))
        oracle_c += int(np.sum(r.column("classification") == 6))
        r.close()
    assert oracle_b > 0 and oracle_c > 0
    res = run_query(tmp_path / "laz", QueryPlan(bounds=BoundsQuery(box)),
                    block_size=1 << 14)
    assert res.match_count == oracle_b
    res = run_query(tmp_path / "laz", QueryPlan(classification=ClassQuery(6)),
                    block_size=1 << 14)
    assert res.match_count == oracle_c


class TestLazFuzz:
    """Randomized + adversarial roundtrip battery: the patterns where
    encoder/decoder asymmetries hide (int32 coordinate extremes with
    wrapping deltas, constant columns, monotone runs, scanner-channel
    churn, gps jumps between chunks)."""

    @staticmethod
    def _check(header, cols, chunk_size):
        import tempfile, os

        p = tempfile.mktemp(suffix=".laz")
        try:
            write_laz(p, header, cols, chunk_size=chunk_size)
            f = LazFile(p)
            for name, want in cols.items():
                if name == "position":
                    got = f.column("position")
                    np.testing.assert_array_equal(got, want, err_msg=name)
                else:
                    np.testing.assert_array_equal(f.column(name), want, err_msg=name)
            f.close()
        finally:
            if os.path.exists(p):
                os.unlink(p)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_v2_coordinate_extremes(self, seed):
        rng = np.random.default_rng(seed)
        n = 4_000
        cloud = synth.make_cloud(n, seed=seed, point_format=1)
        cols = cloud.columns()
        pos = cols["position"].copy()
        # inject extremes and wrapping deltas
        extreme = rng.choice(n, 200, replace=False)
        pos[extreme] = rng.choice(
            np.array([-2**31, -2**31 + 1, 2**31 - 1, 2**31 - 2, 0], np.int64), (200, 3)
        ).astype(np.int32)
        cols["position"] = pos
        cols["gps_time"] = np.where(
            rng.random(n) < 0.05, rng.uniform(-1e12, 1e12, n), cols["gps_time"]
        )
        self._check(cloud.header, cols, 1_000)

    @pytest.mark.parametrize("seed", [3, 4])
    def test_v3_coordinate_extremes_and_channel_churn(self, seed):
        rng = np.random.default_rng(seed)
        n = 4_000
        cloud = synth.make_cloud(n, seed=seed, point_format=6)
        cols = cloud.columns()
        pos = cols["position"].copy()
        extreme = rng.choice(n, 200, replace=False)
        pos[extreme] = rng.choice(
            np.array([-2**31, -2**31 + 1, 2**31 - 1, 2**31 - 2], np.int64), (200, 3)
        ).astype(np.int32)
        cols["position"] = pos
        nret = rng.integers(1, 16, n).astype(np.uint16)
        ret = (rng.integers(0, 15, n) % nret + 1).astype(np.uint16)
        channel = rng.integers(0, 4, n).astype(np.uint16)  # max churn
        cols["flags"] = (
            (ret | (nret << 4)) | ((rng.integers(0, 256, n).astype(np.uint16)) << 8)
        ).astype(np.uint16)
        # force channel bits explicitly on top of random flag bytes
        cols["flags"] = (cols["flags"] & ~np.uint16(0x3000)) | (channel << 12)
        cols["scan_angle"] = rng.choice(
            np.array([-32768, -30000, 0, 30000, 32767], np.int64), n
        ).astype(np.int16)
        cols["gps_time"] = np.where(
            rng.random(n) < 0.1, rng.uniform(-1e12, 1e12, n),
            np.sort(rng.uniform(0, 1e6, n)),
        )
        self._check(cloud.header, cols, 700)

    def test_v3_constant_everything(self):
        """All-identical points: layers must compress to near-nothing and
        roundtrip (the unused-layer 0-byte path)."""
        n = 3_000
        cloud = synth.make_cloud(n, seed=9, point_format=6)
        cols = cloud.columns()
        cols["position"] = np.tile(np.array([[123, -456, 789]], np.int32), (n, 1))
        cols["intensity"] = np.full(n, 777, np.uint16)
        cols["classification"] = np.full(n, 6, np.uint8)
        cols["flags"] = np.full(n, (1 | (1 << 4)), np.uint16)
        cols["scan_angle"] = np.zeros(n, np.int16)
        cols["user_data"] = np.zeros(n, np.uint8)
        cols["point_source"] = np.full(n, 42, np.uint16)
        cols["gps_time"] = np.full(n, 123456.789)
        self._check(cloud.header, cols, 1_000)

    def test_v2_constant_and_monotone(self):
        n = 3_000
        cloud = synth.make_cloud(n, seed=10, point_format=3)
        cols = cloud.columns()
        cols["position"] = np.stack(
            [np.arange(n, dtype=np.int32) * 7,
             np.full(n, -5, np.int32),
             np.arange(n, 0, -1, dtype=np.int32)], axis=1,
        )
        cols["gps_time"] = np.full(n, -1.5e-300)  # subnormal-adjacent constant
        self._check(cloud.header, cols, 900)

    def test_corrector_int_min_regression(self):
        """A delta of exactly -2^31 (corrector == corr_min) used to livelock
        the encoder's k-bit search (`1u << k` wraps at k >= 32); it must take
        the k==32 escape and roundtrip exactly."""
        n = 8
        cloud = synth.make_cloud(n, seed=11, point_format=1)
        cols = cloud.columns()
        pos = np.zeros((n, 3), np.int32)
        pos[1] = [-2**31, -2**31, -2**31]    # dx == -2^31 from 0
        pos[2] = [0, 0, 0]                   # dx == +2^31 wraps to -2^31 too
        pos[3] = [2**31 - 1, -2**31, 2**31 - 1]
        cols["position"] = pos
        # gps delta of exactly -2^31 in the i64 bit domain
        g = np.zeros(n, np.float64)
        bits = np.zeros(n, np.int64)
        bits[1] = 2**31
        bits[2] = 0
        cols["gps_time"] = bits.view(np.float64)
        self._check(cloud.header, cols, n)


@pytest.mark.parametrize("fmt", [4, 5, 9, 10])
def test_laz_waveform_formats_roundtrip(tmp_path, fmt):
    """Wave packet formats compress and roundtrip bit-exactly through .laz
    (v2 WAVEPACKET13 item for 4/5, v3 WAVEPACKET14 layer for 9/10),
    including realistic sequential-offset packets."""
    n = 12_000
    cloud = synth.make_cloud(n, seed=90 + fmt, point_format=fmt)
    cols = cloud.columns()
    # realistic wave packets: one descriptor, sequential offsets, fixed size
    rng = np.random.default_rng(fmt)
    wave = np.zeros((n, 29), np.uint8)
    wave[:, 0] = 1  # descriptor index
    sizes = np.full(n, 1024, np.uint64)
    offs = np.cumsum(np.concatenate([[0], sizes[:-1]])).astype(np.uint64)
    wave[:, 1:9] = offs[:, None].view(np.uint8).reshape(n, 8)
    wave[:, 9:13] = sizes.astype(np.uint32)[:, None].view(np.uint8).reshape(n, 4)
    wave[:, 13:17] = rng.uniform(0, 100, n).astype(np.float32)[:, None].view(np.uint8).reshape(n, 4)
    # a few irregular packets exercise the delta/full offset cases
    irr = rng.choice(n, 50, replace=False)
    wave[irr, 1:9] = rng.integers(0, 2**62, (50, 1), dtype=np.uint64).view(np.uint8).reshape(50, 8)
    cols["waveform"] = wave
    p = tmp_path / f"w{fmt}.laz"
    write_laz(p, cloud.header, cols, chunk_size=5_000)
    f = LazFile(p)
    assert f.has_wave
    np.testing.assert_array_equal(f.column("waveform"), wave)
    np.testing.assert_array_equal(f.column("position"), cloud.position_raw)
    np.testing.assert_array_equal(f.column("classification"), cloud.classification)
    np.testing.assert_array_equal(f.column("gps_time"), cols["gps_time"])
    # compresses: sequential packets are highly predictable
    raw = n * cloud.header.point_record_length
    assert p.stat().st_size < raw * 0.8
    f.close()


def test_laz_waveform_cross_format_engine(tmp_path):
    """las -> laz conversion keeps waveform formats queryable with exact
    counts and identical wave bytes."""
    files = synth.write_dataset(tmp_path, n_files=1, points_per_file=9_000,
                                seed=95, formats=("las",), point_format=5)
    las_to_laz(tmp_path / "las" / "file_0.las",
               tmp_path / "las" / "conv.laz")
    src = open_point_cloud(tmp_path / "las" / "file_0.las")
    dst = LazFile(tmp_path / "las" / "conv.laz")
    np.testing.assert_array_equal(dst.column("waveform"), src.column("waveform"))
    box = AABB((100200.0, 200300.0, 10.0), (100900.0, 200900.0, 70.0))
    oracle = int(np.sum(box.contains_points(src.positions_world())))
    res = run_query(tmp_path / "las" / "conv.laz",
                    QueryPlan(bounds=BoundsQuery(box)), block_size=4096)
    assert res.match_count == oracle > 0
    src.close(); dst.close()
