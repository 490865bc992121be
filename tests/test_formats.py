"""Format-codec tests: header roundtrip, LAS/LAST/LAZER read/write parity.

This is the golden-parity strategy of the reference's reader tests
(readers/src/last_reader.rs:397-437, lazer_reader.rs:800-830) — decode the
same dataset via different formats and assert element-wise equality — but on
self-contained synthetic fixtures instead of hard-coded author-machine paths.
"""

import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu.formats import (
    LasFile,
    LastFile,
    LazerFile,
    las,
    las_to_last,
    las_to_lazer,
    open_point_cloud,
    synth,
)
from adhoc_queries_pointclouds_tpu.formats.lazer import write_lazer
from adhoc_queries_pointclouds_tpu.formats.last import write_last


def test_header_roundtrip():
    h = las.LasHeader(
        version=(1, 2),
        point_format=2,
        point_record_length=26,
        point_count=12345,
        scale=(0.001, 0.002, 0.01),
        offset=(1000.0, -2000.0, 30.0),
        min=(999.0, -2001.0, 29.0),
        max=(1999.0, -1001.0, 129.0),
    )
    parsed = las.parse_las_header(las.write_las_header(h))
    assert parsed.point_format == 2
    assert parsed.point_count == 12345
    assert parsed.scale == h.scale
    assert parsed.offset == h.offset
    assert parsed.min == h.min
    assert parsed.max == h.max


def test_header_v14_large_count():
    h = las.LasHeader(version=(1, 4), point_format=6, point_record_length=30, point_count=5_000_000_000)
    parsed = las.parse_las_header(las.write_las_header(h))
    assert parsed.point_count == 5_000_000_000
    assert parsed.version == (1, 4)


def test_header_masks_laz_compression_bit():
    h = las.LasHeader(point_format=2, point_record_length=26, point_count=1)
    raw = bytearray(las.write_las_header(h))
    raw[104] |= 0x80  # LAZ sets bit 7 (readers/src/last_reader.rs:76-79)
    parsed = las.parse_las_header(bytes(raw))
    assert parsed.point_format == 2


@pytest.mark.parametrize("fmt", [0, 1, 2, 3, 6, 7, 8])
def test_las_roundtrip_all_formats(tmp_path, fmt):
    cloud = synth.make_cloud(5_000, seed=fmt, point_format=fmt)
    p = tmp_path / f"f{fmt}.las"
    synth.write_cloud_las(cloud, p)
    f = LasFile(p)
    assert f.point_count == 5_000
    np.testing.assert_array_equal(f.column("position"), cloud.position_raw)
    np.testing.assert_array_equal(f.column("classification"), cloud.classification)
    np.testing.assert_array_equal(f.column("intensity"), cloud.intensity)
    if las.has_color(fmt):
        np.testing.assert_array_equal(f.column("color"), cloud.color)
    if cloud.gps_time is not None:
        np.testing.assert_array_equal(f.column("gps_time"), cloud.gps_time)
    f.close()


@pytest.mark.parametrize("fmt", [0, 2, 3, 6, 7])
def test_last_roundtrip(tmp_path, fmt):
    cloud = synth.make_cloud(4_000, seed=fmt + 10, point_format=fmt)
    p = tmp_path / f"f{fmt}.last"
    write_last(p, cloud.header, cloud.columns())
    f = LastFile(p)
    np.testing.assert_array_equal(f.column("position"), cloud.position_raw)
    np.testing.assert_array_equal(f.column("classification"), cloud.classification)
    np.testing.assert_array_equal(f.column("intensity"), cloud.intensity)
    if las.has_color(fmt):
        np.testing.assert_array_equal(f.column("color"), cloud.color)
    f.close()


@pytest.mark.parametrize("fmt", [0, 2, 7])
def test_lazer_roundtrip(tmp_path, fmt):
    cloud = synth.make_cloud(7_500, seed=fmt + 20, point_format=fmt)
    p = tmp_path / f"f{fmt}.lazer"
    write_lazer(p, cloud.header, cloud.columns(), block_size=2_000)
    f = LazerFile(p)
    assert f.num_blocks == 4  # 7500 / 2000 -> 3 full + 1 partial
    assert f.points_in_block(3) == 1_500
    np.testing.assert_array_equal(f.column("position"), cloud.position_raw)
    np.testing.assert_array_equal(f.column("classification"), cloud.classification)
    np.testing.assert_array_equal(f.column("intensity"), cloud.intensity)
    if las.has_color(fmt):
        np.testing.assert_array_equal(f.column("color"), cloud.color)
    # ranged column reads crossing block boundaries
    np.testing.assert_array_equal(
        f.column("position", 1_500, 4_321), cloud.position_raw[1_500:4_321]
    )
    f.close()


def test_cross_format_parity(tmp_path):
    """Same cloud through las/last/lazer gives identical columns."""
    cloud = synth.make_cloud(10_000, seed=42, point_format=2)
    paths = {}
    synth.write_cloud_las(cloud, tmp_path / "c.las")
    las_to_last(tmp_path / "c.las", tmp_path / "c.last")
    las_to_lazer(tmp_path / "c.las", tmp_path / "c.lazer", block_size=3_000)
    readers = [open_point_cloud(tmp_path / f"c.{e}") for e in ("las", "last", "lazer")]
    base = readers[0]
    for other in readers[1:]:
        np.testing.assert_array_equal(base.column("position"), other.column("position"))
        np.testing.assert_array_equal(base.column("color"), other.column("color"))
        np.testing.assert_array_equal(
            base.column("classification"), other.column("classification")
        )
        np.testing.assert_allclose(base.positions_world(), other.positions_world())
    for r in readers:
        r.close()


def test_write_las_header_math(tmp_path):
    """Write-back header math parity (dump_points.rs:73-89): offset = min
    corner, scale = next pow-10 of max_extent/i32::MAX clamped >= 0.001."""
    pts = np.array([[0.0, 0.0, 0.0], [100.0, 50.0, 25.0]])
    h = las.write_las(tmp_path / "o.las", pts, point_format=2)
    assert h.scale == (0.001, 0.001, 0.001)  # 100/2^31 -> 1e-7 -> clamped
    assert h.offset == (0.0, 0.0, 0.0)
    back = LasFile(tmp_path / "o.las")
    np.testing.assert_allclose(back.positions_world(), pts, atol=1e-9)
    back.close()

    big = np.array([[0.0, 0.0, 0.0], [1e10, 0.0, 0.0]])
    h2 = las.write_las(tmp_path / "o2.las", big, point_format=2)
    assert h2.scale[0] == 10.0  # 1e10/2^31 ~ 4.66 -> next pow10 = 10


def test_lz4_native_vs_python_roundtrip():
    from adhoc_queries_pointclouds_tpu import native
    from adhoc_queries_pointclouds_tpu.formats import lz4py

    rng = np.random.default_rng(0)
    # compressible data: small alphabet with runs
    data = rng.integers(0, 4, size=100_000, dtype=np.int64).astype(np.uint8)
    data = np.repeat(data, rng.integers(1, 5, size=data.size))[:150_000].tobytes()
    if native.available():
        frame = native.lz4_frame_compress(data)
        assert len(frame) < len(data)  # actually compresses
        out = native.lz4_frame_decompress(frame, len(data))
        assert out.tobytes() == data
        # python decoder reads native frames
        py_out, consumed = lz4py.frame_decompress(frame)
        assert py_out == data
        assert consumed == len(frame)
    # native (or python) reads store-only python frames
    stored = lz4py.frame_compress_stored(data)
    out2, _ = lz4py.frame_decompress(stored)
    assert out2 == data
    if native.available():
        out3 = native.lz4_frame_decompress(stored, len(data))
        assert out3.tobytes() == data


def test_xxh32_known_vectors():
    from adhoc_queries_pointclouds_tpu.formats.lz4py import xxh32

    # Published xxHash32 test vectors
    assert xxh32(b"", 0) == 0x02CC5D05
    assert xxh32(b"Hello World", 0) == 0xB1FD16EE
    from adhoc_queries_pointclouds_tpu import native

    if native.available():
        assert native.xxh32(b"", 0) == 0x02CC5D05
        assert native.xxh32(b"Hello World", 0) == 0xB1FD16EE


def test_header_v13_roundtrip():
    h = las.LasHeader(version=(1, 3), point_format=1, point_record_length=28,
                      point_count=77, offset_to_point_data=235)
    raw = las.write_las_header(h)
    assert len(raw) == 235
    parsed = las.parse_las_header(raw)
    assert parsed.version == (1, 3)
    assert parsed.point_count == 77


def test_empty_las_file(tmp_path):
    h = las.LasHeader(point_format=2, point_record_length=26, point_count=0)
    (tmp_path / "empty.las").write_bytes(las.write_las_header(h))
    f = LasFile(tmp_path / "empty.las")
    assert f.point_count == 0
    assert f.column("position").shape == (0, 3)
    f.close()


def test_engine_handles_empty_file(tmp_path):
    from adhoc_queries_pointclouds_tpu.engine import run_query
    from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, QueryPlan
    from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

    h = las.LasHeader(point_format=2, point_record_length=26, point_count=0,
                      min=(0.0, 0.0, 0.0), max=(1.0, 1.0, 1.0))
    (tmp_path / "empty.las").write_bytes(las.write_las_header(h))
    cloud = synth.make_cloud(1_000, seed=1, offset=(0.0, 0.0, 0.0),
                             extent=(1.0, 1.0, 1.0))
    synth.write_cloud_las(cloud, tmp_path / "real.las")
    res = run_query(
        tmp_path,
        QueryPlan(bounds=BoundsQuery(AABB((0.0,) * 3, (2.0,) * 3))),
        block_size=8192,
    )
    assert res.match_count == 1_000


def test_truncated_las_rejected(tmp_path):
    h = las.LasHeader(point_format=2, point_record_length=26, point_count=1000)
    (tmp_path / "trunc.las").write_bytes(las.write_las_header(h) + b"\x00" * 100)
    with pytest.raises(ValueError, match="header claims"):
        LasFile(tmp_path / "trunc.las")


def test_truncated_last_rejected(tmp_path):
    """A short .last must fail open, not silently zero-pad columns: padding
    zeros would count as real class-0 points (exactness invariant)."""
    from adhoc_queries_pointclouds_tpu.formats.last import LastFile

    cloud = synth.make_cloud(1000, seed=3)
    path = tmp_path / "full.last"
    synth.write_cloud_last(cloud, path)
    data = path.read_bytes()
    trunc = tmp_path / "trunc.last"
    trunc.write_bytes(data[: len(data) - 2048])
    with pytest.raises(ValueError, match="header claims"):
        LastFile(trunc)
    # intact file still opens and column sizes check out
    f = LastFile(path)
    assert f.column("classification").shape == (1000,)
    f.close()


@pytest.mark.parametrize("name,data", [
    ("zeros", b"\x00" * 300_000),
    ("ones_run", b"\xff" * 70_000 + b"ab" * 10 + b"\xff" * 70_000),
    ("pattern4", b"abcd" * 50_000),
    ("pattern3", b"xyz" * 50_000),  # non-4-aligned matches
    ("tiny", b"a"),
    ("tiny12", b"ab" * 6),  # exactly MFLIMIT
    ("empty", b""),
    ("incompressible", bytes(range(256)) * 1),
    ("far_match", b"HEADER" + b"\x01" * 70_000 + b"HEADER"),  # offset > 64KB window
])
def test_lz4_adversarial_roundtrip(name, data):
    """Compressor edge cases: runs, overlapping matches, window limits,
    sub-MFLIMIT inputs. Both our native and pure-python decoders must
    reproduce the input from our own frames."""
    from adhoc_queries_pointclouds_tpu import native
    from adhoc_queries_pointclouds_tpu.formats import lz4py

    if not native.available():
        pytest.skip("native codec unavailable")
    frame = native.lz4_frame_compress(data)
    assert native.lz4_frame_decompress(frame, max(len(data), 1)).tobytes() == data
    py, consumed = lz4py.frame_decompress(frame)
    assert py == data
    assert consumed == len(frame)


def test_lz4_block_overlapping_match():
    """RLE-style overlapping copies (offset < match length) decode bytewise."""
    from adhoc_queries_pointclouds_tpu.formats import lz4py

    # hand-crafted block: 1 literal 'A', then match offset=1 len=19
    # token: lit_len=1, match_len=15 (escape) -> extra byte 0 -> 15+4=19
    block = bytes([0x1F, ord("A"), 0x01, 0x00, 0x00])
    out = lz4py.block_decompress(block)
    assert out == b"A" * 20


class TestWaveform:
    """Formats 4/5/9/10 wave packets are readable columns in every
    waveform-capable container and survive conversion bit-exactly (the
    reference ignores them; here they are a declared, queryable field)."""

    @pytest.mark.parametrize("fmt", [4, 5, 9, 10])
    def test_waveform_roundtrip_las_last_lazer(self, tmp_path, fmt):
        from adhoc_queries_pointclouds_tpu.formats import (
            las_to_last, las_to_lazer, open_point_cloud,
        )
        from adhoc_queries_pointclouds_tpu.formats.las import parse_waveform

        cloud = synth.make_cloud(5_000, seed=80 + fmt, point_format=fmt)
        assert cloud.waveform is not None
        synth.write_cloud_las(cloud, tmp_path / "w.las")
        las_to_last(tmp_path / "w.las", tmp_path / "w.last")
        las_to_lazer(tmp_path / "w.las", tmp_path / "w.lazer")
        for ext in ("las", "last", "lazer"):
            r = open_point_cloud(tmp_path / f"w.{ext}")
            got = np.asarray(r.column("waveform"), np.uint8).reshape(-1, 29)
            np.testing.assert_array_equal(got, cloud.waveform, err_msg=ext)
            # positions/classes still exact alongside
            np.testing.assert_array_equal(r.column("position"), cloud.position_raw)
            r.close()
        # parsed packet fields decode from the raw bytes
        w = parse_waveform(cloud.waveform)
        assert w.shape == (5_000,)
        np.testing.assert_array_equal(
            w["wave_descriptor"], cloud.waveform[:, 0]
        )

    def test_waveform_engine_parity(self, tmp_path):
        """bbox counts on a waveform format match the oracle end to end."""
        from adhoc_queries_pointclouds_tpu.engine import run_query
        from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, QueryPlan
        from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

        files = synth.write_dataset(tmp_path, n_files=2, points_per_file=8_000,
                                    seed=85, formats=("las", "last", "lazer"),
                                    point_format=5)
        box = AABB((100200.0, 200300.0, 10.0), (100900.0, 200900.0, 70.0))
        oracle = 0
        for p in files["las"]:
            from adhoc_queries_pointclouds_tpu.formats import open_point_cloud

            r = open_point_cloud(p)
            oracle += int(np.sum(box.contains_points(r.positions_world())))
            r.close()
        for ext in ("las", "last", "lazer"):
            res = run_query(tmp_path / ext, QueryPlan(bounds=BoundsQuery(box)),
                            block_size=4096)
            assert res.match_count == oracle > 0, ext


def test_extra_record_bytes_preserved(tmp_path):
    """Records longer than the standard format (LAS extra-bytes) expose an
    'extra' column and survive las->last and las->laz conversion bit-exactly
    (the LAZER container has no extra-bytes slot, matching the reference)."""
    import dataclasses

    from adhoc_queries_pointclouds_tpu import native

    if not native.available():
        pytest.skip("native codec unavailable")

    from adhoc_queries_pointclouds_tpu.formats import LazFile, las_to_laz
    from adhoc_queries_pointclouds_tpu.formats.last import LastFile, las_to_last

    n = 6_000
    rng = np.random.default_rng(99)
    cloud = synth.make_cloud(n, seed=99, point_format=1)
    h = dataclasses.replace(cloud.header, point_record_length=28 + 5)
    extra = rng.integers(0, 256, (n, 5), dtype=np.int64).astype(np.uint8)
    recs = np.zeros(n, dtype=las.record_dtype(1, 33))
    recs["x"], recs["y"], recs["z"] = (cloud.position_raw[:, i] for i in range(3))
    recs["intensity"] = cloud.intensity
    recs["classification"] = cloud.classification
    recs["gps_time"] = cloud.gps_time
    recs["extra"] = extra
    p = tmp_path / "e.las"
    with open(p, "wb") as f:
        f.write(las.write_las_header(h))
        f.write(recs.tobytes())

    src = LasFile(p)
    np.testing.assert_array_equal(src.column("extra"), extra)
    np.testing.assert_array_equal(src.column("position"), cloud.position_raw)

    las_to_last(p, tmp_path / "e.last")
    lastf = LastFile(tmp_path / "e.last")
    np.testing.assert_array_equal(lastf.column("extra"), extra)
    np.testing.assert_array_equal(lastf.column("position"), cloud.position_raw)

    las_to_laz(p, tmp_path / "e.laz")
    lazf = LazFile(tmp_path / "e.laz")
    assert lazf.extra_size == 5
    np.testing.assert_array_equal(lazf.column("extra"), extra)
    np.testing.assert_array_equal(lazf.column("gps_time"), cloud.gps_time)
    src.close(); lastf.close(); lazf.close()


class TestCorruptionRobustness:
    """Randomly corrupted container bytes must produce clean Python errors
    or garbage-but-bounded results — never crash the process — and
    --keep-going must survive a corrupted file in the dataset."""

    @pytest.mark.parametrize("ext", ["las", "last", "lazer", "laz"])
    def test_random_corruption_never_crashes(self, tmp_path, ext):
        from adhoc_queries_pointclouds_tpu import native

        if ext == "laz" and not native.available():
            pytest.skip("native codec unavailable")
        rng = np.random.default_rng(7)
        cloud = synth.make_cloud(20_000, seed=7, point_format=1)
        p = tmp_path / f"c.{ext}"
        {"las": synth.write_cloud_las, "last": synth.write_cloud_last,
         "lazer": synth.write_cloud_lazer, "laz": synth.write_cloud_laz}[ext](cloud, p)
        raw = bytearray(p.read_bytes())
        for trial in range(12):
            data = bytearray(raw)
            # corrupt a handful of bytes past the header
            for _ in range(8):
                i = int(rng.integers(400, len(data)))
                data[i] = int(rng.integers(0, 256))
            q = tmp_path / f"c{trial}.{ext}"
            q.write_bytes(bytes(data))
            try:
                r = open_point_cloud(q)
                for name in ("position", "classification"):
                    col = r.column(name)
                    assert len(col) <= 20_000
                r.close()
            except (ValueError, NotImplementedError, RuntimeError, OSError):
                pass  # clean rejection is fine; crashing is not

    def test_keep_going_skips_corrupt_file(self, tmp_path):
        from adhoc_queries_pointclouds_tpu.engine import run_query
        from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, QueryPlan
        from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

        files = synth.write_dataset(tmp_path, n_files=2, points_per_file=8_000,
                                    seed=8, formats=("last",))
        # truncate one file so open fails
        good = files["last"][0]
        bad = files["last"][1]
        bad.write_bytes(bad.read_bytes()[:-4096])
        box = AABB((-1e9,) * 3, (1e9,) * 3)
        r = open_point_cloud(good)
        oracle = r.point_count
        r.close()
        res = run_query(tmp_path / "last", QueryPlan(bounds=BoundsQuery(box)),
                        block_size=4096, keep_going=True, use_index=False)
        assert res.match_count == oracle
