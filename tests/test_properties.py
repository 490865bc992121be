"""Property tests (SURVEY §4 rebuild implication): random AABBs vs the NumPy
f64 oracle across formats, concurrent-query thread safety, and the
world->local conversion semantics (correct mode vs reference parity quirk)."""

import concurrent.futures

import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu.engine import run_query
from adhoc_queries_pointclouds_tpu.formats import open_point_cloud, synth
from adhoc_queries_pointclouds_tpu.models.query import BoundsQuery, ClassQuery, QueryPlan
from adhoc_queries_pointclouds_tpu.utils.aabb import AABB, local_query_bounds

BLOCK = 1 << 14


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("prop")
    files = synth.write_dataset(
        root, n_files=2, points_per_file=20_000, seed=71,
        formats=synth.formats_available("las", "last", "lazer", "laz"),
    )
    worlds = []
    for p in files["las"]:
        r = open_point_cloud(p)
        worlds.append(r.positions_world())
        r.close()
    return root, files, worlds


class TestRandomAabbs:
    def test_twenty_random_boxes_all_formats(self, ds):
        root, files, worlds = ds
        rng = np.random.default_rng(0)
        total = np.concatenate(worlds)
        tmin, tmax = total.min(axis=0), total.max(axis=0)
        span = tmax - tmin
        for trial in range(20):
            a = tmin + rng.random(3) * span
            b = tmin + rng.random(3) * span
            box = AABB(tuple(np.minimum(a, b)), tuple(np.maximum(a, b)))
            oracle = sum(int(np.sum(box.contains_points(w))) for w in worlds)
            plan = QueryPlan(bounds=BoundsQuery(box))
            # las is the canonical check every trial; other formats sampled
            got = run_query(root / "las", plan, block_size=BLOCK).match_count
            assert got == oracle, f"trial {trial} las: {got} != {oracle}"
            if trial % 5 == 0:
                for fmt in ("last", "lazer", "laz"):
                    if fmt not in files:
                        continue
                    got_f = run_query(root / fmt, plan, block_size=BLOCK).match_count
                    assert got_f == oracle, f"trial {trial} {fmt}"

    def test_degenerate_boxes(self, ds):
        root, files, worlds = ds
        w0 = worlds[0]
        # a zero-volume box exactly on one point's coordinates (grid-aligned
        # world values -> representable in f64)
        p = w0[1234]
        box = AABB(tuple(p), tuple(p))
        oracle = sum(int(np.sum(box.contains_points(w))) for w in worlds)
        got = run_query(
            root / "last", QueryPlan(bounds=BoundsQuery(box)), block_size=BLOCK
        ).match_count
        assert got == oracle >= 1


class TestConcurrency:
    def test_parallel_queries_are_isolated(self, ds):
        """Concurrent run_query calls (shared jit caches, separate readers)
        return the same counts as sequential ones — the thread-safety test
        the reference leaves to rayon's closure purity (SURVEY §5)."""
        root, files, worlds = ds
        rng = np.random.default_rng(1)
        total = np.concatenate(worlds)
        tmin, tmax = total.min(axis=0), total.max(axis=0)
        span = tmax - tmin
        boxes = []
        for _ in range(8):
            a = tmin + rng.random(3) * span
            b = tmin + rng.random(3) * span
            boxes.append(AABB(tuple(np.minimum(a, b)), tuple(np.maximum(a, b))))
        oracles = [
            sum(int(np.sum(box.contains_points(w))) for w in worlds) for box in boxes
        ]

        def q(box):
            return run_query(
                root / "lazer", QueryPlan(bounds=BoundsQuery(box)), block_size=BLOCK
            ).match_count

        with concurrent.futures.ThreadPoolExecutor(max_workers=4) as pool:
            got = list(pool.map(q, boxes))
        assert got == oracles


class TestConversionSemantics:
    def test_correct_mode_closed_box(self):
        # scale 0.5, offset 0: integer coord q maps to world 0.5*q.
        # world box [0.25, 1.75] contains raw coords {1, 2, 3} -> lo=1, hi=3
        lo, hi = local_query_bounds(
            AABB((0.25,) * 3, (1.75,) * 3), (0.5,) * 3, (0.0,) * 3
        )
        assert lo.tolist() == [1, 1, 1]
        assert hi.tolist() == [3, 3, 3]

    def test_quirk_mode_truncates_and_uses_x_scale(self):
        # negative min corner: correct = ceil(-1.5) = -1... with scale 1:
        # world min -1.5 -> trunc() = -1 in quirk mode too; but -1.5/0.5 = -3
        # exactly, so use a case where floor/trunc differ: min = -1.3
        box = AABB((-1.3, -1.3, -1.3), (1.3, 1.3, 1.3))
        lo_c, hi_c = local_query_bounds(box, (1.0,) * 3, (0.0,) * 3)
        assert lo_c.tolist() == [-1, -1, -1]  # ceil(-1.3) = -1
        assert hi_c.tolist() == [1, 1, 1]  # floor(1.3) = 1
        lo_q, hi_q = local_query_bounds(
            box, (1.0,) * 3, (0.0,) * 3, parity_quirk=True
        )
        assert lo_q.tolist() == [-1, -1, -1]  # trunc(-1.3) = -1 (same here)
        # where they differ: min = -2.7 -> ceil = -2, trunc = -2 ... use
        # positive min: 2.7 -> ceil = 3, trunc = 2 (reference admits point 2!)
        box2 = AABB((2.7,) * 3, (5.0,) * 3)
        lo_c2, _ = local_query_bounds(box2, (1.0,) * 3, (0.0,) * 3)
        lo_q2, _ = local_query_bounds(box2, (1.0,) * 3, (0.0,) * 3, parity_quirk=True)
        assert lo_c2[0] == 3  # correct closed box: 2.0 < 2.7, excluded
        assert lo_q2[0] == 2  # reference truncation admits raw coord 2

    def test_quirk_mode_min_corner_x_scale_bug(self):
        # per-axis scales differ: reference divides the min corner's y/z by
        # the X scale (las.rs:91-92)
        box = AABB((10.0, 10.0, 10.0), (20.0, 20.0, 20.0))
        scale = (1.0, 2.0, 4.0)
        lo_q, hi_q = local_query_bounds(box, scale, (0.0,) * 3, parity_quirk=True)
        assert lo_q.tolist() == [10, 10, 10]  # y,z divided by x_scale=1.0
        assert hi_q.tolist() == [20, 10, 5]  # max corner uses its own scales
        lo_c, hi_c = local_query_bounds(box, scale, (0.0,) * 3)
        assert lo_c.tolist() == [10, 5, 3]  # ceil(10/2)=5, ceil(10/4)=3
        assert hi_c.tolist() == [20, 10, 5]

    def test_quirk_end_to_end_count_differs_when_expected(self, tmp_path):
        """Craft a file where the reference's truncation admits extra points
        and assert our quirk mode reproduces that count exactly."""
        cloud = synth.make_cloud(
            10_000, seed=5, point_format=2,
            scale=(1.0, 1.0, 1.0), offset=(0.0, 0.0, 0.0),
            extent=(100.0, 100.0, 100.0),
        )
        synth.write_cloud_las(cloud, tmp_path / "q.las")
        box = AABB((10.7, 10.7, 10.7), (50.0, 50.0, 50.0))
        raw = cloud.position_raw.astype(np.int64)
        # reference semantics oracle: trunc() casts, closed interval
        lo_ref = np.trunc(np.asarray(box.min)).astype(np.int64)
        hi_ref = np.trunc(np.asarray(box.max)).astype(np.int64)
        ref_count = int(np.sum(np.all((raw >= lo_ref) & (raw <= hi_ref), axis=1)))
        # correct closed-box oracle on world coords
        correct_count = int(np.sum(box.contains_points(cloud.positions_world)))
        assert ref_count > correct_count  # integer coords at 10 are admitted

        got_q = run_query(
            tmp_path / "q.las",
            QueryPlan(bounds=BoundsQuery(box), parity_quirk=True),
            block_size=BLOCK,
        ).match_count
        got_c = run_query(
            tmp_path / "q.las", QueryPlan(bounds=BoundsQuery(box)), block_size=BLOCK
        ).match_count
        assert got_q == ref_count
        assert got_c == correct_count


class TestRandomCollectAndDensity:
    """Randomized collect/density trials vs the oracle: the collect path
    must return the exact SET of matching indices (not just the count), and
    density winners must match reference-exact semantics at random cell
    sizes."""

    def test_random_collect_exact_index_sets(self, ds):
        root, files, worlds = ds
        rng = np.random.default_rng(5)
        total = np.concatenate(worlds)
        tmin, tmax = total.min(axis=0), total.max(axis=0)
        span = tmax - tmin
        for trial in range(8):
            a = tmin + rng.random(3) * span
            b = tmin + rng.random(3) * span
            box = AABB(tuple(np.minimum(a, b)), tuple(np.maximum(a, b)))
            res = run_query(
                root / "last",
                QueryPlan(bounds=BoundsQuery(box)),
                block_size=BLOCK,
                keep_hits=True,
            )
            oracle_total = sum(
                int(np.sum(box.contains_points(w))) for w in worlds
            )
            # res.hits has one entry per header-surviving file; pair by the
            # recorded file index
            for hits in res.hits:
                w = worlds[hits.file_idx]
                idx = np.nonzero(box.contains_points(w))[0]
                np.testing.assert_allclose(
                    hits.position_world, w[idx], err_msg=f"trial {trial}"
                )
            assert res.match_count == oracle_total

    def test_random_density_cells(self, ds):
        root, files, worlds = ds
        rng = np.random.default_rng(6)
        total = np.concatenate(worlds)
        tmin, tmax = total.min(axis=0), total.max(axis=0)
        span = float((tmax - tmin).max())
        from adhoc_queries_pointclouds_tpu.models.query import DensityConfig
        from adhoc_queries_pointclouds_tpu.ops.density import GridSpec3D

        for trial in range(6):
            cell = float(span * 10 ** rng.uniform(-2.0, -0.3))
            a = tmin + rng.random(3) * span * 0.8
            b = a + rng.random(3) * span * 0.5
            box = AABB(tuple(a), tuple(b))
            res = run_query(
                root / "last",
                QueryPlan(bounds=BoundsQuery(box), density=DensityConfig(cell)),
                block_size=BLOCK,
            )
            grid = GridSpec3D.create(box, cell)
            keys = []
            for w in worlds:
                m = box.contains_points(w)
                if m.any():
                    k, _ = grid.exact_keys_d2(w[m])
                    keys.append(k)
            oracle = len(np.unique(np.concatenate(keys))) if keys else 0
            assert res.match_count == oracle, f"trial {trial} cell={cell}"

    def test_random_time_ranges(self, tmp_path):
        files = synth.write_dataset(tmp_path, n_files=2, points_per_file=15_000,
                                    seed=77, formats=("last",), point_format=1)
        gs = []
        for p in files["last"]:
            r = open_point_cloud(p)
            gs.append(r.column("gps_time").copy())
            r.close()
        allg = np.concatenate(gs)
        rng = np.random.default_rng(7)
        from adhoc_queries_pointclouds_tpu.models.query import TimeRangeQuery

        for trial in range(8):
            t0, t1 = np.sort(rng.choice(allg, 2, replace=False))
            if t0 == t1:
                continue
            # exact endpoints: the half-open semantics must hold bit-exactly
            res = run_query(tmp_path / "last",
                            QueryPlan(time_range=TimeRangeQuery(float(t0), float(t1))),
                            block_size=BLOCK)
            oracle = int(np.count_nonzero((allg >= t0) & (allg < t1)))
            assert res.match_count == oracle, f"trial {trial}"


class TestDensityWinnerIdentity:
    """Engine-level density must return the exact same WINNER POINTS as a
    pure-f64 SparseGrid simulation (reference semantics incl. tie rule),
    across random grids, scales, and multi-block merges — identity, not
    just counts."""

    def test_random_configs_winner_positions(self, tmp_path):
        from adhoc_queries_pointclouds_tpu.models.query import DensityConfig

        rng = np.random.default_rng(11)
        for trial in range(4):
            scale = tuple(float(10.0 ** rng.integers(-4, -1)) for _ in range(3))
            offset = tuple(float(v) for v in rng.uniform(-1e5, 1e5, 3))
            root = tmp_path / f"t{trial}"
            root.mkdir()
            files = []
            worlds = []
            for k in range(2):
                cloud = synth.make_cloud(
                    9_000, seed=100 + 10 * trial + k, scale=scale, offset=offset,
                    extent=(50.0, 80.0, 20.0),
                )
                p = root / f"f{k}.last"
                from adhoc_queries_pointclouds_tpu.formats.last import write_last

                write_last(p, cloud.header, cloud.columns())
                files.append(p)
                worlds.append(cloud.positions_world)
            total = np.concatenate(worlds)
            tmin, tmax = total.min(axis=0), total.max(axis=0)
            box = AABB(tuple(tmin + 0.1), tuple(tmax - 0.1))
            cell = float(rng.uniform(2.0, 25.0))
            res = run_query(
                root,
                QueryPlan(bounds=BoundsQuery(box),
                          density=DensityConfig(cell, "file")),
                block_size=2048,  # several blocks per file -> cross-block merges
                keep_hits=True,
            )
            # oracle: full reference SparseGrid simulation per file
            from adhoc_queries_pointclouds_tpu.ops.density import GridSpec3D

            grid = GridSpec3D.create(box, cell)
            for hits in res.hits:
                w = worlds[hits.file_idx]
                m = box.contains_points(w)
                idx = np.nonzero(m)[0]
                keys, d2s = grid.exact_keys_d2(w[idx])
                best: dict[int, tuple[float, int]] = {}
                for k_, d_, i_ in zip(keys, d2s, idx):
                    cur = best.get(int(k_))
                    if cur is None or d_ < cur[0]:  # strict <: first wins ties
                        best[int(k_)] = (float(d_), int(i_))
                want = np.sort([v[1] for v in best.values()])
                got_pos = hits.position_world
                want_pos = w[want]
                np.testing.assert_allclose(
                    np.sort(got_pos, axis=0), np.sort(want_pos, axis=0),
                    err_msg=f"trial {trial} file {hits.file_idx}",
                )
