"""Distributed driver tests (single-process degeneration on the 8-device
CPU mesh; true multi-host needs a pod slice)."""

import numpy as np

from adhoc_queries_pointclouds_tpu.engine import run_query
from adhoc_queries_pointclouds_tpu.formats import synth
from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, QueryPlan
from adhoc_queries_pointclouds_tpu.parallel import distributed
from adhoc_queries_pointclouds_tpu.utils.aabb import AABB

BOX = AABB((100200.0, 200300.0, 10.0), (100900.0, 200900.0, 70.0))


def test_distributed_count_matches_engine(tmp_path):
    synth.write_dataset(tmp_path, n_files=3, points_per_file=20_000, seed=31,
                        formats=("last",))
    plan = QueryPlan(bounds=BoundsQuery(BOX))
    expected = run_query(tmp_path / "last", plan, block_size=1 << 14).match_count
    got = distributed.distributed_bbox_count(
        tmp_path / "last", plan, block_size=1 << 14
    )
    assert got == expected > 0


def test_shard_manifest_single_process(tmp_path):
    files = [tmp_path / f"{i}.las" for i in range(5)]
    assert distributed.shard_manifest(files) == files  # process_count == 1


def test_global_mesh_spans_all_devices():
    import jax

    assert distributed.global_mesh().devices.size == len(jax.devices())


def test_distributed_class_count_matches_engine(tmp_path):
    from adhoc_queries_pointclouds_tpu.models.query import ClassQuery

    synth.write_dataset(tmp_path, n_files=3, points_per_file=20_000, seed=32,
                        formats=("last",))
    plan = QueryPlan(classification=ClassQuery(6))
    expected = run_query(tmp_path / "last", plan, block_size=1 << 14).match_count
    got = distributed.distributed_count(tmp_path / "last", plan, block_size=1 << 14)
    assert got == expected > 0


def test_distributed_time_count_matches_engine(tmp_path):
    from adhoc_queries_pointclouds_tpu.models.query import TimeRangeQuery

    synth.write_dataset(tmp_path, n_files=2, points_per_file=20_000, seed=33,
                        formats=("last",), point_format=1)
    plan = QueryPlan(time_range=TimeRangeQuery(100_000.0, 700_000.0))
    expected = run_query(tmp_path / "last", plan, block_size=1 << 14).match_count
    got = distributed.distributed_count(tmp_path / "last", plan, block_size=1 << 14)
    assert got == expected > 0


def test_distributed_collect_matches_engine(tmp_path):
    out = tmp_path / "out"
    out.mkdir()
    synth.write_dataset(tmp_path, n_files=3, points_per_file=20_000, seed=34,
                        formats=("last",))
    plan = QueryPlan(bounds=BoundsQuery(BOX), output_dir=out)
    expected = run_query(tmp_path / "last", plan, block_size=1 << 14).match_count
    total, emitter = distributed.distributed_collect(
        tmp_path / "last", plan, block_size=1 << 14, output_dir=out, keep_hits=True
    )
    assert total == expected > 0
    # every written point must satisfy the predicate; totals match
    from adhoc_queries_pointclouds_tpu.formats import LasFile

    written = 0
    for f in emitter.output_files:
        back = LasFile(f)
        w = back.positions_world()
        assert np.all(BOX.contains_points(w))
        written += back.point_count
        back.close()
    assert written == expected


def test_distributed_collect_overflow_retry(tmp_path, monkeypatch):
    monkeypatch.setenv("AQPC_COLLECT_CAP", "8")
    synth.write_dataset(tmp_path, n_files=2, points_per_file=10_000, seed=35,
                        formats=("last",))
    plan = QueryPlan(bounds=BoundsQuery(BOX), print_points=True)
    expected = run_query(tmp_path / "last", plan, block_size=1 << 14).match_count
    total, _ = distributed.distributed_collect(
        tmp_path / "last", plan, block_size=1 << 14, keep_hits=True
    )
    assert total == expected > 0


def test_distributed_density_matches_engine(tmp_path):
    from adhoc_queries_pointclouds_tpu.models.query import ClassQuery, DensityConfig

    synth.write_dataset(tmp_path, n_files=3, points_per_file=20_000, seed=36,
                        formats=("last",))
    for scope in ("global", "file"):
        plan = QueryPlan(bounds=BoundsQuery(BOX), density=DensityConfig(50.0, scope))
        expected = run_query(tmp_path / "last", plan, block_size=1 << 14).match_count
        got = distributed.distributed_density(tmp_path / "last", plan,
                                              block_size=1 << 14)
        assert got == expected > 0, scope
    # no-bbox density: the shared grid must come from the GLOBAL header union
    plan = QueryPlan(classification=ClassQuery(6), density=DensityConfig(150.0))
    expected = run_query(tmp_path / "last", plan, block_size=1 << 14).match_count
    got = distributed.distributed_density(tmp_path / "last", plan, block_size=1 << 14)
    assert got == expected > 0


def test_distributed_query_delegates_density(tmp_path):
    """distributed_query with a density plan must return the properly
    merged global cell count (delegated to distributed_density), not the
    engine's host-local emitter total (the pre-fix behavior)."""
    from adhoc_queries_pointclouds_tpu.models.query import DensityConfig

    synth.write_dataset(tmp_path, n_files=2, points_per_file=20_000, seed=37,
                        formats=("last",))
    for scope in ("global", "file"):
        plan = QueryPlan(bounds=BoundsQuery(BOX), density=DensityConfig(50.0, scope))
        expected = run_query(tmp_path / "last", plan, block_size=1 << 14).match_count
        res = distributed.distributed_query(tmp_path / "last", plan,
                                            block_size=1 << 14)
        assert res.match_count == expected > 0, scope
        assert res.files_searched == 2
