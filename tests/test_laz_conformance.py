"""Auto-discovering third-party LASzip conformance harness.

Scans tests/fixtures/laz/ for externally-encoded <name>.laz fixtures with
<name>.truth.csv sidecars (see the README there) and asserts this repo's
decoder matches the sidecar exactly. Ships with zero fixtures — no external
LAZ encoder exists in this environment — so the whole module skip-reports
until someone drops files in; that skip is the loud, visible marker that
third-party interop is unvalidated (docs/LASZIP_INTEROP.md).

Also tests the LazInteropWarning plumbing itself (foreign-read and
risky-write warnings), which needs no external files.
"""

from __future__ import annotations

import struct
import warnings
from pathlib import Path

import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu import native
from adhoc_queries_pointclouds_tpu.formats import laz as lazmod
from adhoc_queries_pointclouds_tpu.formats.laz import (
    AQPC_VLR_DESCRIPTION, LazFile, LazInteropWarning, write_laz,
)

FIXDIR = Path(__file__).parent / "fixtures" / "laz"

needs_native = pytest.mark.skipif(
    not native.available(), reason="native codec unavailable"
)


def _fixture_pairs() -> list[Path]:
    return sorted(p for p in FIXDIR.glob("*.laz") if p.with_suffix(".truth.csv").exists())


def _load_truth(path: Path):
    with open(path) as fh:
        names = [c.strip() for c in fh.readline().strip().split(",")]
    data = np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2, dtype=np.float64)
    return names, data


_PAIRS = _fixture_pairs()


@needs_native
@pytest.mark.parametrize(
    "laz_path", _PAIRS or [None],
    ids=[p.stem for p in _PAIRS] or ["no-external-fixtures"],
)
def test_external_laz_conformance(laz_path):
    if laz_path is None:
        pytest.skip(
            "no externally-encoded LAZ fixtures present in tests/fixtures/laz "
            "(third-party LASzip interop UNVALIDATED — see README there)"
        )
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", LazInteropWarning)
        f = LazFile(laz_path)
    assert f.is_foreign, "conformance fixtures must be externally encoded"
    names, truth = _load_truth(laz_path.with_suffix(".truth.csv"))

    sample_file = laz_path.with_suffix(".sample.txt")
    if sample_file.exists():
        sel = np.loadtxt(sample_file, dtype=np.int64, ndmin=1)
    else:
        sel = np.arange(f.point_count, dtype=np.int64)
    assert len(truth) == len(sel), "truth CSV row count != points described"

    pos = f.column("position")[sel].astype(np.float64)
    world = pos * np.asarray(f.header.scale) + np.asarray(f.header.offset)
    cols = {}
    cols["x"], cols["y"], cols["z"] = world[:, 0], world[:, 1], world[:, 2]
    for simple in ("intensity", "classification", "gps_time", "nir"):
        if simple in names:
            cols[simple] = f.column(simple)[sel]
    if any(c in names for c in ("r", "g", "b")):
        rgb = f.column("color")[sel]
        cols["r"], cols["g"], cols["b"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    if any(c in names for c in ("return_number", "number_of_returns")):
        flags = f.column("flags")[sel].astype(np.uint16)
        if f.is14:
            cols["return_number"] = flags & 0xF
            cols["number_of_returns"] = (flags >> 4) & 0xF
        else:
            cols["return_number"] = flags & 0x7
            cols["number_of_returns"] = (flags >> 3) & 0x7

    for j, name in enumerate(names):
        got = np.asarray(cols[name], np.float64)
        np.testing.assert_array_equal(
            got, truth[:, j], err_msg=f"{laz_path.name}: column {name} mismatch"
        )


@needs_native
def test_foreign_read_warns_once(tmp_path):
    """A LAZ file whose VLR description isn't ours warns exactly once."""
    n = 64
    rng = np.random.default_rng(0)
    from adhoc_queries_pointclouds_tpu.formats.las import LasHeader

    header = LasHeader(point_format=1, point_count=n, point_record_length=28)
    cols = {
        "position": rng.integers(-1000, 1000, (n, 3), dtype=np.int32),
        "intensity": rng.integers(0, 2**16, n, dtype=np.uint16).astype(np.uint16),
        "classification": rng.integers(0, 32, n).astype(np.uint8),
        "gps_time": rng.random(n),
    }
    p = tmp_path / "own.laz"
    write_laz(p, header, cols)

    # Rewrite the VLR description in place to simulate a foreign encoder.
    raw = bytearray(p.read_bytes())
    i = raw.find(AQPC_VLR_DESCRIPTION)
    assert i > 0
    foreign = b"lastools (c) by rapidlasso GmbH"
    raw[i : i + 32] = foreign.ljust(32, b"\x00")
    pf = tmp_path / "foreign.laz"
    pf.write_bytes(bytes(raw))

    lazmod._warned_keys.clear()
    with pytest.warns(LazInteropWarning, match="not written by this codec"):
        f = LazFile(pf)
    assert f.is_foreign and f.vlr_description == foreign
    np.testing.assert_array_equal(f.column("position"), cols["position"])

    # second open: silent (once per process per category)
    with warnings.catch_warnings():
        warnings.simplefilter("error", LazInteropWarning)
        LazFile(pf)

    # own files never warn
    with warnings.catch_warnings():
        warnings.simplefilter("error", LazInteropWarning)
        own = LazFile(p)
    assert not own.is_foreign


@needs_native
def test_risky_write_warns(tmp_path):
    """Writing v3 (formats 6-10) or wave-packet LAZ warns about interop."""
    from adhoc_queries_pointclouds_tpu.formats.las import LasHeader

    n = 16
    rng = np.random.default_rng(1)
    header = LasHeader(
        point_format=6, point_count=n, point_record_length=30,
        version=(1, 4), header_size=375, offset_to_point_data=375,
    )
    cols = {
        "position": rng.integers(-100, 100, (n, 3), dtype=np.int32),
        "classification": rng.integers(0, 256, n).astype(np.uint8),
        "gps_time": rng.random(n),
    }
    lazmod._warned_keys.clear()
    with pytest.warns(LazInteropWarning, match="only guaranteed self-consistent"):
        write_laz(tmp_path / "v3.laz", header, cols)

    # formats 0-3: no warning
    h2 = LasHeader(point_format=0, point_count=n, point_record_length=20)
    with warnings.catch_warnings():
        warnings.simplefilter("error", LazInteropWarning)
        write_laz(tmp_path / "v2.laz", h2, {"position": cols["position"]})


@needs_native
def test_strict_interop_refuses_uncertain_features(tmp_path):
    """strict_interop draws the validated-subset boundary as hard errors."""
    from adhoc_queries_pointclouds_tpu.formats.las import LasHeader

    n = 8
    rng = np.random.default_rng(3)
    pos = rng.integers(-100, 100, (n, 3), dtype=np.int32)
    h6 = LasHeader(point_format=6, point_count=n, point_record_length=30,
                   version=(1, 4), header_size=375, offset_to_point_data=375)
    with pytest.raises(ValueError, match="strict subset is 0-3"):
        write_laz(tmp_path / "a.laz", h6, {"position": pos},
                  strict_interop=True)
    h1 = LasHeader(point_format=1, point_count=n, point_record_length=28)
    cols = {"position": pos, "gps_time": rng.random(n)}
    with pytest.raises(ValueError, match="variable-size chunking"):
        write_laz(tmp_path / "b.laz", h1, cols, strict_interop=True,
                  variable_chunk_counts=[n])
    with pytest.raises(ValueError, match="deferred chunk table"):
        write_laz(tmp_path / "c.laz", h1, cols, strict_interop=True,
                  defer_chunk_table=True)
    # the subset itself writes fine and round-trips
    write_laz(tmp_path / "d.laz", h1, cols, strict_interop=True)
    f = LazFile(tmp_path / "d.laz")
    np.testing.assert_array_equal(f.column("position"), pos)


OUTDIR = Path(__file__).parent / "fixtures" / "laz" / "outbound"


@needs_native
def test_outbound_strict_fixture_pinned():
    """The committed strict-subset .laz is byte-identical to what the
    current encoder produces, and decodes to its committed truth CSV —
    so the exact bytes an external validator should check (see
    docs/LASZIP_INTEROP.md "External validation recipe") can never drift
    silently from the code."""
    from adhoc_queries_pointclouds_tpu.formats import synth

    p = OUTDIR / "aqpc_strict_pf1.laz"
    truth = OUTDIR / "aqpc_strict_pf1.truth.csv"
    assert p.exists() and truth.exists()

    cloud = synth.make_cloud(257, seed=42, point_format=1)
    import io
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        q = Path(td) / "regen.laz"
        write_laz(q, cloud.header, cloud.columns(), chunk_size=100,
                  strict_interop=True)
        assert q.read_bytes() == p.read_bytes(), (
            "strict fixture bytes drifted; regenerate the fixture AND have "
            "it externally re-validated (docs/LASZIP_INTEROP.md)"
        )

    f = LazFile(p)
    pos = f.column("position")
    gps = f.column("gps_time")
    inten = f.column("intensity")
    cls = f.column("classification")
    import csv

    with open(truth) as fh:
        rdr = csv.reader(fh)
        next(rdr)
        cells = [row for row in rdr]
    rows = np.asarray([[int(v) for v in row[:5]] for row in cells], np.int64)
    gps_bits = np.asarray([int(row[5]) for row in cells], np.uint64)
    np.testing.assert_array_equal(pos, rows[:, :3].astype(np.int32))
    np.testing.assert_array_equal(inten, rows[:, 3].astype(np.uint16))
    np.testing.assert_array_equal(cls, rows[:, 4].astype(np.uint8))
    np.testing.assert_array_equal(gps.view(np.uint64), gps_bits)
