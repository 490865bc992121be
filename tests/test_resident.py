"""HBM-resident dataset tests: parity with the streaming engine and with the
NumPy oracle; sharding across the virtual 8-device mesh."""

import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu.engine import run_query
from adhoc_queries_pointclouds_tpu.formats import open_point_cloud, synth
from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, ClassQuery, QueryPlan
from adhoc_queries_pointclouds_tpu.parallel.resident import ResidentDataset
from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

BOX = AABB((100200.0, 200300.0, 10.0), (100700.0, 200800.0, 60.0))


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("res")
    files = synth.write_dataset(root, n_files=3, points_per_file=25_000, seed=17)
    return root, files


@pytest.fixture(scope="module")
def resident(ds):
    root, _ = ds
    return ResidentDataset.load(root / "last", block_size=1 << 14)


def test_resident_bbox_matches_streaming(ds, resident):
    root, _ = ds
    plan = QueryPlan(bounds=BoundsQuery(BOX))
    streaming = run_query(root / "last", plan, block_size=1 << 14).match_count
    assert resident.count(plan) == streaming > 0


def test_resident_class_matches_streaming(ds, resident):
    root, _ = ds
    plan = QueryPlan(classification=ClassQuery(6))
    streaming = run_query(root / "last", plan, block_size=1 << 14).match_count
    assert resident.count(plan) == streaming > 0
    assert resident.count(QueryPlan(classification=ClassQuery(19))) == 0


def test_resident_repeated_queries_distinct(ds, resident):
    """Distinct boxes return distinct, oracle-correct counts (no caching)."""
    root, files = ds
    worlds = [open_point_cloud(p).positions_world() for p in files["last"]]
    for dx in (100.0, 300.0, 500.0):
        box = AABB(BOX.min, (BOX.min[0] + dx, BOX.max[1], BOX.max[2]))
        oracle = sum(int(np.sum(box.contains_points(w))) for w in worlds)
        assert resident.count(QueryPlan(bounds=BoundsQuery(box))) == oracle


def test_resident_blocks_padded_to_mesh(resident):
    import jax

    assert resident.n_blocks % len(jax.devices()) == 0
    assert resident.total_points == 75_000


def test_resident_count_rejects_collect_plan(resident, tmp_path):
    with pytest.raises(NotImplementedError, match="collect"):
        resident.count(QueryPlan(bounds=BoundsQuery(BOX), output_dir=tmp_path))


def test_resident_time_range_needs_gps_columns(resident):
    from adhoc_queries_pointclouds_tpu.models.query import TimeRangeQuery

    with pytest.raises(ValueError, match="gps_time"):
        resident.count(QueryPlan(time_range=TimeRangeQuery(0.0, 1.0)))


def test_resident_collect_matches_streaming(ds, resident, tmp_path):
    """Full collect surface against HBM-resident columns: counts, written
    LAS, and per-point attributes all match the streaming engine."""
    from adhoc_queries_pointclouds_tpu.formats import LasFile

    root, files = ds
    plan = QueryPlan(bounds=BoundsQuery(BOX), output_dir=tmp_path)
    streaming = run_query(
        root / "last", plan, block_size=1 << 14, keep_hits=True
    )
    count, emitter = resident.collect(plan, output_dir=tmp_path, keep_hits=True)
    assert count == streaming.match_count > 0
    for got, want in zip(emitter.all_hits, streaming.hits):
        np.testing.assert_array_equal(got.position_world, want.position_world)
        np.testing.assert_array_equal(got.classification, want.classification)
    written = 0
    for f in emitter.output_files:
        back = LasFile(f)
        assert np.all(BOX.contains_points(back.positions_world()))
        written += back.point_count
        back.close()
    assert written == count


def test_resident_collect_overflow_retry(ds, resident):
    huge = AABB((-1e9,) * 3, (1e9,) * 3)
    count, _ = resident.collect(QueryPlan(bounds=BoundsQuery(huge), print_points=True),
                                cap=8, keep_hits=False)
    assert count == resident.total_points


def test_resident_time_count_and_collect(tmp_path):
    from adhoc_queries_pointclouds_tpu.models.query import TimeRangeQuery

    files = synth.write_dataset(tmp_path, n_files=2, points_per_file=12_000,
                                seed=19, formats=("last",), point_format=1)
    plan = QueryPlan(time_range=TimeRangeQuery(200_000.0, 800_000.0))
    streaming = run_query(tmp_path / "last", plan, block_size=1 << 14).match_count
    res = ResidentDataset.load(tmp_path / "last", block_size=1 << 14,
                               attrs=("position", "gps_time"))
    assert res.count(plan) == streaming > 0
    plan2 = QueryPlan(time_range=TimeRangeQuery(200_000.0, 800_000.0),
                      print_points=True)
    count, _ = res.collect(plan2, keep_hits=False)
    assert count == streaming


def test_resident_density_collect(ds, tmp_path):
    from adhoc_queries_pointclouds_tpu.formats import LasFile
    from adhoc_queries_pointclouds_tpu.models.query import DensityConfig

    root, _ = ds
    res = ResidentDataset.load(root / "last", block_size=1 << 14)
    plan = QueryPlan(bounds=BoundsQuery(BOX), density=DensityConfig(50.0),
                     output_dir=tmp_path)
    streaming = run_query(root / "last", plan, block_size=1 << 14).match_count
    count, emitter = res.collect(plan, output_dir=tmp_path)
    assert count == streaming > 0
    written = sum(LasFile(f).point_count for f in emitter.output_files)
    assert written == count


def test_resident_density_matches_streaming(ds, resident):
    from adhoc_queries_pointclouds_tpu.models.query import DensityConfig

    root, _ = ds
    for scope in ("global", "file"):
        plan = QueryPlan(bounds=BoundsQuery(BOX), density=DensityConfig(50.0, scope))
        streaming = run_query(root / "last", plan, block_size=1 << 14).match_count
        assert resident.count(plan) == streaming > 0


def test_resident_density_class_predicate(ds):
    from adhoc_queries_pointclouds_tpu.models.query import DensityConfig

    root, _ = ds
    ds_full = ResidentDataset.load(root / "last", block_size=1 << 14,
                                   attrs=("position", "classification"))
    plan = QueryPlan(classification=ClassQuery(6), density=DensityConfig(100.0))
    streaming = run_query(root / "last", plan, block_size=1 << 14).match_count
    assert ds_full.count(plan) == streaming > 0
