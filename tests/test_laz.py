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
