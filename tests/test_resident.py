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


def test_resident_collect_rejected(resident, tmp_path):
    with pytest.raises(NotImplementedError):
        resident.count(QueryPlan(bounds=BoundsQuery(BOX), output_dir=tmp_path))


def test_resident_time_range_rejected(resident):
    from adhoc_queries_pointclouds_tpu.models.query import TimeRangeQuery

    with pytest.raises(NotImplementedError, match="GPS-time"):
        resident.count(QueryPlan(time_range=TimeRangeQuery(0.0, 1.0)))


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
