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
