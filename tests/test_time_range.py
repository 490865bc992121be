"""GPS-time range query tests (the reference's stubs made real)."""

import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu.engine import run_query
from adhoc_queries_pointclouds_tpu.formats import open_point_cloud, synth
from adhoc_queries_pointclouds_tpu.models.query import QueryPlan, TimeRangeQuery


@pytest.fixture(scope="module")
def gps_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("gps")
    # point format 3: gps_time + rgb
    files = synth.write_dataset(
        root, n_files=2, points_per_file=20_000, seed=23,
        formats=synth.formats_available("las", "last", "lazer", "laz"), point_format=3,
    )
    return root, files


@pytest.mark.parametrize("fmt", ["las", "last", "lazer", "laz"])
def test_time_range_count_parity(gps_dataset, fmt):
    root, files = gps_dataset
    if fmt not in files:
        pytest.skip("native codec unavailable")
    t0, t1 = 250_000.0, 600_000.0
    oracle = 0
    for p in files[fmt]:
        r = open_point_cloud(p)
        g = r.column("gps_time")
        oracle += int(np.count_nonzero((g >= t0) & (g < t1)))
        r.close()
    res = run_query(
        root / fmt,
        QueryPlan(time_range=TimeRangeQuery(t0, t1)),
        block_size=1 << 14,
    )
    assert res.match_count == oracle > 0


def test_time_range_collect(gps_dataset, tmp_path):
    root, files = gps_dataset
    t0, t1 = 0.0, 100_000.0
    res = run_query(
        root / "last",
        QueryPlan(time_range=TimeRangeQuery(t0, t1), output_dir=tmp_path),
        block_size=1 << 14,
        keep_hits=True,
    )
    assert res.match_count > 0
    assert res.output_files
    # verify every collected hit's gps time against the source
    r = open_point_cloud(files["last"][0])
    g = r.column("gps_time")
    oracle0 = int(np.count_nonzero((g >= t0) & (g < t1)))
    assert res.hits[0].count == oracle0
    r.close()


def test_time_range_on_gpsless_format_errors(tmp_path):
    files = synth.write_dataset(
        tmp_path, n_files=1, points_per_file=1_000, seed=1,
        formats=("las",), point_format=2,  # no gps
    )
    with pytest.raises(ValueError, match="GPS times"):
        run_query(
            tmp_path / "las",
            QueryPlan(time_range=TimeRangeQuery(0.0, 1.0)),
        )


def test_exactly_one_predicate_enforced():
    from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, ClassQuery
    from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

    with pytest.raises(ValueError):
        QueryPlan(
            classification=ClassQuery(1), time_range=TimeRangeQuery(0.0, 1.0)
        )
    with pytest.raises(ValueError):
        QueryPlan(
            bounds=BoundsQuery(AABB((0, 0, 0), (1, 1, 1))),
            time_range=TimeRangeQuery(0.0, 1.0),
        )
