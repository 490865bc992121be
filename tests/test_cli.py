"""CLI surface tests: flag parity with the reference binary (main.rs:194-220)."""

import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu.cli import main
from adhoc_queries_pointclouds_tpu.formats import LasFile, synth


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("clids")
    synth.write_dataset(root, n_files=2, points_per_file=20_000, seed=5)
    return root


BOUNDS = "100100;200100;5;100900;200900;90"


def test_bbox_query_prints_count(ds, capsys):
    rc = main(["-i", str(ds / "las"), "--bounds", BOUNDS, "--optimized", "--parallel",
               "--block-size", "16384"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Found" in out and "matching points" in out
    assert "throughput" in out


def test_reference_style_invocation_matches_subcommand(ds, capsys):
    main(["-i", str(ds / "last"), "--bounds", BOUNDS, "--block-size", "16384"])
    a = capsys.readouterr().out
    main(["query", "-i", str(ds / "last"), "--bounds", BOUNDS, "--block-size", "16384"])
    b = capsys.readouterr().out
    get = lambda s: [l for l in s.splitlines() if l.startswith("Found")][0]
    assert get(a) == get(b)


def test_bounds_and_class_mutually_exclusive(ds, capsys):
    rc = main(["-i", str(ds / "las"), "--bounds", BOUNDS, "--class", "3"])
    assert rc == 1
    assert "invalid" in capsys.readouterr().err


def test_neither_bounds_nor_class_errors(ds, capsys):
    rc = main(["-i", str(ds / "las")])
    assert rc == 1
    assert "exactly one" in capsys.readouterr().err


def test_class_query(ds, capsys):
    rc = main(["-i", str(ds / "lazer"), "--class", "6", "--block-size", "16384"])
    assert rc == 0
    assert "Found" in capsys.readouterr().out


def test_output_writes_las(ds, tmp_path, capsys):
    out = tmp_path / "hits"
    out.mkdir()
    rc = main(["-i", str(ds / "las"), "--bounds", BOUNDS, "-o", str(out),
               "--block-size", "16384"])
    assert rc == 0
    written = sorted(out.glob("matching_points_*.las"))
    assert written
    f = LasFile(written[0])
    assert f.point_count > 0
    f.close()


def test_density_query(ds, capsys):
    rc = main(["-i", str(ds / "las"), "--bounds", BOUNDS, "--density", "100",
               "--block-size", "16384"])
    assert rc == 0
    out = capsys.readouterr().out
    n = int([l for l in out.splitlines() if l.startswith("Found")][0].split()[1])
    assert n > 0


def test_convert_and_count_points(ds, tmp_path, capsys):
    src = next((ds / "las").glob("*.las"))
    rc = main(["convert", "-i", str(src), "-o", str(tmp_path / "c.last")])
    assert rc == 0
    rc = main(["convert", "-i", str(src), "-o", str(tmp_path / "c.lazer")])
    assert rc == 0
    capsys.readouterr()
    rc = main(["count-points", "-i", str(tmp_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Total number of points: 40000" in out  # 2 converted copies x 20k


def test_print_points(ds, capsys):
    rc = main(["-i", str(ds / "las"), "--bounds", "100100;200100;5;100103;200900;90",
               "--print-points", "--block-size", "16384"])
    assert rc == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("Found point:")]
    count = int([l for l in out.splitlines() if l.startswith("Found ") and "matching" in l][0].split()[1])
    assert len(lines) == count
    assert "class=" in lines[0] and "rgb=" in lines[0]


def test_profile_flag(ds, tmp_path, capsys):
    rc = main(["-i", str(ds / "las"), "--class", "2", "--block-size", "16384",
               "--profile", str(tmp_path / "trace")])
    assert rc == 0
    assert "Profiler trace written" in capsys.readouterr().out
    assert any((tmp_path / "trace").rglob("*"))


def test_experiments_subcommand_help(capsys):
    import pytest as _pytest
    with _pytest.raises(SystemExit) as e:
        main(["experiments", "--help"])
    assert e.value.code == 0


def test_negative_bounds_accepted(ds, capsys):
    """Bounding boxes with negative mins must parse (reference clap sets
    allow_hyphen_values, main.rs:209)."""
    rc = main(["-i", str(ds / "las"), "--bounds", "-100;-100;-100;100;100;100",
               "--block-size", "16384"])
    assert rc == 0
    assert "Found 0 matching points" in capsys.readouterr().out


def test_cli_distributed_flag(tmp_path, capsys):
    """--distributed routes through the multi-host driver (single-process
    degeneration) for count, collect, and density plans."""
    from adhoc_queries_pointclouds_tpu.cli import main
    from adhoc_queries_pointclouds_tpu.formats import synth

    synth.write_dataset(tmp_path, n_files=2, points_per_file=8_000, seed=44,
                        formats=("last",))
    B = "100200;200300;10;100900;200900;70"
    assert main(["-i", str(tmp_path / "last"), "--bounds", B,
                 "--distributed", "--block-size", "4096"]) == 0
    count_line = [l for l in capsys.readouterr().out.splitlines()
                  if l.startswith("Found")][0]
    n = int(count_line.split()[1])
    assert n > 0
    out = tmp_path / "o"
    out.mkdir()
    assert main(["-i", str(tmp_path / "last"), "--bounds", B,
                 "--distributed", "-o", str(out), "--block-size", "4096"]) == 0
    lines = capsys.readouterr().out.splitlines()
    assert any(l.startswith("Wrote") for l in lines)
    assert f"Found {n} matching points" in " ".join(lines)
    assert main(["-i", str(tmp_path / "last"), "--bounds", B, "--density",
                 "100", "--distributed", "--block-size", "4096"]) == 0
    assert "Found" in capsys.readouterr().out
