"""Query engine orchestration — the reference's main.rs driver, TPU-native.

Execution model:

  count queries   host decode-ahead feeder -> D blocks/step -> shard_map
                  fused predicate scan per chip -> psum over ICI -> lazy
                  accumulation (one device sync at the very end)
  collect queries two-pass per block: fused count, then pow2-bucketed index
                  compaction; attributes of hits are gathered lazily from
                  the source file (only hit rows are ever decoded)
  density queries predicate mask -> per-block device segment-min (sort by
                  cell key) -> sparse host merge; per-file or global scope

File discovery, the bounds/class mutual exclusion, density's fallback to
dataset total bounds, and the closing MiB/s report all mirror the reference
CLI semantics (main.rs:29-57, 238-244, 253-259, 309-316).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: repeated CLI invocations skip recompiles
# (first compile over the tunneled TPU costs seconds to minutes).
if not os.environ.get("AQPC_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "AQPC_COMPILE_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "aqpc_jax")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

from .formats import is_valid_file, open_point_cloud, write_las
from .models.query import QueryPlan
from .ops import compact, density as density_ops, predicate
from .parallel import mesh as mesh_mod
from .parallel.pipeline import BlockFeeder
from .utils.aabb import AABB, clamp_bounds_to_i32, local_query_bounds
from .utils.timing import StageTimer

DEFAULT_BLOCK_SIZE = 1 << 21  # 2M points: 24 MiB of xyz per block
HIT_ATTRS = ("position", "classification", "color", "intensity")

# Max device steps in flight. >1 overlaps H2D transfer of the next batch
# with the current scan — the right setting on a real TPU-VM (PCIe-attached
# chips). The tunneled axon TPU backend in this environment intermittently
# wedges its transfer queue for minutes when executions with fresh host
# inputs are queued behind one another, so the safe default here is fully
# synchronous stepping; raise AQPC_INFLIGHT on real hardware.
MAX_INFLIGHT_STEPS = int(os.environ.get("AQPC_INFLIGHT", "1"))


def discover_files(input_path: str | Path) -> list[Path]:
    """File or flat directory listing with extension filter (main.rs:29-57)."""
    p = Path(input_path)
    if not p.exists():
        raise FileNotFoundError(f"Input path {p} does not exist!")
    if p.is_file():
        files = [p]
    elif p.is_dir():
        files = sorted(c for c in p.iterdir() if c.is_file())
    else:
        raise ValueError(f"Input path {p} is neither file nor directory!")
    return [f for f in files if is_valid_file(f)]


def get_total_bounds(readers) -> AABB:
    """Union of per-file header bounds (main.rs:94-120)."""
    total = AABB.empty()
    for r in readers:
        total = total.union(r.header.bounds)
    return total


@dataclasses.dataclass
class FileHits:
    """Materialized matching points of one input file."""

    file_idx: int
    position_world: np.ndarray  # (n, 3) f64
    classification: np.ndarray  # (n,) u8
    color: np.ndarray  # (n, 3) u16
    intensity: np.ndarray  # (n,) u16

    @property
    def count(self) -> int:
        return len(self.position_world)


@dataclasses.dataclass
class QueryResult:
    match_count: int
    hits: list[FileHits]
    output_files: list[Path]
    total_file_bytes: int
    elapsed_seconds: float
    timer: StageTimer
    files_searched: int
    points_scanned: int = 0

    @property
    def throughput_mibs(self) -> float:
        return self.total_file_bytes / 1048576.0 / max(self.elapsed_seconds, 1e-12)

    @property
    def mpts_per_s(self) -> float:
        return self.points_scanned / 1e6 / max(self.elapsed_seconds, 1e-12)


def _gather_hits(reader, indices: np.ndarray, file_idx: int) -> FileHits:
    attrs = reader.take(indices, HIT_ATTRS)
    pos_world = attrs["position"].astype(np.float64) * np.asarray(
        reader.header.scale
    ) + np.asarray(reader.header.offset)
    return FileHits(
        file_idx=file_idx,
        position_world=pos_world,
        classification=np.asarray(attrs["classification"], np.uint8),
        color=np.asarray(attrs["color"], np.uint16).reshape(-1, 3),
        intensity=np.asarray(attrs["intensity"], np.uint16),
    )


def _empty_hits(file_idx: int) -> FileHits:
    return FileHits(
        file_idx,
        np.empty((0, 3), np.float64),
        np.empty(0, np.uint8),
        np.empty((0, 3), np.uint16),
        np.empty(0, np.uint16),
    )


class _Dumper:
    """LAS write-back of collected points (dump_points.rs FileDumper)."""

    def __init__(self, output_dir: Path | None):
        self.output_dir = output_dir
        self.files: list[Path] = []
        if output_dir is not None:
            output_dir = Path(output_dir)
            if not output_dir.exists():
                raise FileNotFoundError(f"Path {output_dir} does not exist!")
            if not output_dir.is_dir():
                raise NotADirectoryError(f"Path {output_dir} is no directory!")

    def dump(self, hits: FileHits) -> None:
        if self.output_dir is None or hits.count == 0:
            return
        path = Path(self.output_dir) / f"matching_points_{len(self.files)}.las"
        write_las(
            path,
            hits.position_world,
            classification=hits.classification,
            color=hits.color,
            intensity=hits.intensity,
            point_format=2,
        )
        self.files.append(path)


def run_query(
    input_path: str | Path,
    plan: QueryPlan,
    *,
    block_size: int = DEFAULT_BLOCK_SIZE,
    impl: str = "auto",
    n_devices: int | None = None,
    workers: int = 8,
    prefetch: int = 12,
    keep_hits: bool = False,
    keep_going: bool = False,
    use_index: bool = True,
) -> QueryResult:
    """Run one query plan over a file or directory.

    keep_going: skip unreadable files with a warning instead of aborting the
    whole query (the reference aborts on any file error, main.rs:161-163).
    """
    timer = StageTimer()
    files = discover_files(input_path)
    if not files:
        raise FileNotFoundError(f"No supported point-cloud files under {input_path}")
    total_bytes = sum(f.stat().st_size for f in files)

    with timer.stage("open"):
        if keep_going:
            readers = []
            kept = []
            for f in files:
                try:
                    readers.append(open_point_cloud(f))
                    kept.append(f)
                except Exception as e:
                    import sys

                    print(f"warning: skipping {f}: {e}", file=sys.stderr)
            files = kept
            if not files:
                raise FileNotFoundError(f"No readable point-cloud files under {input_path}")
        else:
            readers = [open_point_cloud(f) for f in files]

    # Clamp the block to the largest file: tiny files padded to a huge block
    # would waste device work (the density sort is O(block log block)).
    max_pts = max((r.point_count for r in readers), default=0)
    if max_pts and max_pts < block_size:
        if jax.default_backend() == "tpu":
            quantum = predicate.MIN_BLOCK_MULTIPLE  # pallas tile alignment
        else:
            quantum = 8192
        block_size = min(block_size, ((max_pts + quantum - 1) // quantum) * quantum)

    is_bounds = plan.bounds is not None
    query_bounds = plan.bounds.bounds if is_bounds else None

    if plan.time_range is not None:
        from .formats.las import has_gps_time

        for f, r in zip(files, readers):
            if not has_gps_time(r.header.point_format):
                raise ValueError(f"File {f} does not contain GPS times!")

    # Per-file integer-domain bounds + header prefilter (las.rs:82-99).
    file_bounds: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    active = []
    for i, r in enumerate(readers):
        if is_bounds:
            if not r.header.bounds.intersects(query_bounds):
                continue
            lo64, hi64 = local_query_bounds(
                query_bounds,
                r.header.scale,
                r.header.offset,
                parity_quirk=plan.parity_quirk,
            )
            lo, hi = clamp_bounds_to_i32(lo64, hi64)
            file_bounds[i] = (lo, hi)
        active.append(i)

    if plan.density is not None:
        if is_bounds:
            grid_bounds = query_bounds
        else:
            grid_bounds = get_total_bounds(readers)
        grid = density_ops.GridSpec3D.create(grid_bounds, plan.density.cell_size)
    else:
        grid = None

    # Optional block min/max sidecar index (the reference's improvements.md
    # "on-the-fly index building" idea): classify each engine block as
    # disjoint / contained / partial against the integer query box. Exact
    # results are preserved — the index only removes work.
    file_indices_meta: dict[int, tuple] = {}
    index_collectors: dict[int, "index_mod.IndexCollector"] = {}
    if use_index and (is_bounds or plan.classification is not None):
        from . import index as index_mod

        for i in active:
            info = index_mod.load_index(files[i])
            if info is not None:
                file_indices_meta[i] = info
        # on-the-fly build (improvements.md semantics): a full bbox scan of
        # an unindexed file emits the sidecar as a byproduct
        if is_bounds and os.environ.get("AQPC_AUTO_INDEX", "1") != "0":
            for i in active:
                if i not in file_indices_meta:
                    index_collectors[i] = index_mod.IndexCollector(
                        readers[i].point_count
                    )

    if plan.collects_points:
        result = _run_collect(
            plan, files, readers, active, file_bounds, grid,
            block_size=block_size, workers=workers, prefetch=prefetch,
            timer=timer, keep_hits=keep_hits, block_index=file_indices_meta,
            index_collectors=index_collectors,
        )
    else:
        result = _run_count(
            plan, readers, active, file_bounds,
            block_size=block_size, impl=impl, n_devices=n_devices,
            workers=workers, prefetch=prefetch, timer=timer,
            block_index=file_indices_meta, index_collectors=index_collectors,
        )

    for i, collector in index_collectors.items():
        if collector.save_if_complete(files[i]):
            timer.counts["index_built_files"] += 1

    # points actually scanned = points of files that survived the header
    # prefilter (skipped files cost only a header read), minus points of
    # blocks the sidecar index pruned (skipped or counted without IO) so
    # indexed runs don't overstate Mpts/s
    points_scanned = sum(readers[i].point_count for i in active)
    points_scanned -= timer.counts.get("index_pruned_points", 0)
    for r in readers:
        r.close()
    match_count, hits, output_files = result
    return QueryResult(
        match_count=match_count,
        hits=hits,
        output_files=output_files,
        total_file_bytes=total_bytes,
        elapsed_seconds=timer.elapsed(),
        timer=timer,
        files_searched=len(files),
        points_scanned=points_scanned,
    )


# ---------------------------------------------------------------------------
# count path
# ---------------------------------------------------------------------------


def _run_count(
    plan, readers, active, file_bounds, *, block_size, impl, n_devices,
    workers, prefetch, timer, block_index=None, index_collectors=None,
):
    is_bounds = plan.bounds is not None
    is_time = plan.time_range is not None
    mesh = mesh_mod.make_mesh(n_devices)
    d = mesh.devices.size
    # K blocks per chip per dispatch amortizes dispatch latency (expensive
    # over the tunneled backend, cheap but nonzero on real hardware).
    blocks_per_step = int(os.environ.get("AQPC_BLOCKS_PER_STEP", "4"))
    rows_per_step = d * max(1, blocks_per_step)
    block_index = block_index or {}

    from .index import CONTAINED, DISJOINT, class_present, classify_block

    tasks = []
    indexed_total = 0  # points of CONTAINED blocks: counted with zero IO
    skipped_blocks = contained_blocks = pruned_points = 0
    for i in active:
        n = readers[i].point_count
        idx_info = block_index.get(i)
        for b in range((n + block_size - 1) // block_size):
            start = b * block_size
            stop = min(start + block_size, n)
            if idx_info is not None and is_bounds:
                lo, hi = file_bounds[i]
                cls = classify_block(idx_info[1], idx_info[0], start, stop, lo, hi)
                if cls == DISJOINT:
                    skipped_blocks += 1
                    pruned_points += stop - start
                    continue
                if cls == CONTAINED:
                    indexed_total += stop - start
                    contained_blocks += 1
                    pruned_points += stop - start
                    continue
            elif idx_info is not None and plan.classification is not None:
                if not class_present(
                    idx_info[2], idx_info[0], start, stop,
                    plan.classification.classification,
                ):
                    skipped_blocks += 1
                    pruned_points += stop - start
                    continue
            tasks.append((i, b, start, stop))
    if skipped_blocks or contained_blocks:
        timer.counts["index_skipped_blocks"] += skipped_blocks
        timer.counts["index_contained_blocks"] += contained_blocks
        timer.counts["index_pruned_points"] += pruned_points

    if is_time:
        # f64 GPS times: host-side predicate (TPUs have no f64); the decode
        # pipeline still parallelizes across blocks. Half-open [start, end)
        # like the reference's Range<f64> stub (las.rs:332-339).
        t0, t1 = plan.time_range.start, plan.time_range.end
        total = 0
        with timer.stage("scan"):
            def count_block(args):
                file_idx, _b, start, stop = args
                gps = readers[file_idx].column("gps_time", start, stop)
                return int(np.count_nonzero((gps >= t0) & (gps < t1)))

            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
                total = sum(pool.map(count_block, tasks))
        return total, [], []

    index_collectors = index_collectors or {}

    if is_bounds:
        def load(file_idx, start, stop):
            pos = readers[file_idx].column("position", start, stop)
            collector = index_collectors.get(file_idx)
            if collector is not None:
                collector.update(start, pos)
            return {
                "x": np.ascontiguousarray(pos[:, 0]),
                "y": np.ascontiguousarray(pos[:, 1]),
                "z": np.ascontiguousarray(pos[:, 2]),
            }
    else:
        def load(file_idx, start, stop):
            return {
                "cls": np.ascontiguousarray(
                    readers[file_idx].column("classification", start, stop)
                )
            }

    feeder = BlockFeeder(
        tasks, load, block_size,
        file_bounds=file_bounds, workers=workers, prefetch=prefetch,
    )

    pending: list = []
    total = indexed_total  # CONTAINED blocks already counted, zero IO
    batch = []

    def drain(limit: int):
        nonlocal total
        while len(pending) > limit:
            total += int(pending.pop(0))

    def flush(batch):
        pad = rows_per_step - len(batch)
        if is_bounds:
            xs = np.stack([t.columns["x"] for t in batch] + [np.zeros(block_size, np.int32)] * pad)
            ys = np.stack([t.columns["y"] for t in batch] + [np.zeros(block_size, np.int32)] * pad)
            zs = np.stack([t.columns["z"] for t in batch] + [np.zeros(block_size, np.int32)] * pad)
            los = np.stack([t.lo for t in batch] + [np.zeros(3, np.int32)] * pad)
            his = np.stack([t.hi for t in batch] + [np.zeros(3, np.int32)] * pad)
            nvs = np.asarray([t.n_valid for t in batch] + [0] * pad, np.int32)
            pending.append(
                mesh_mod.sharded_bbox_count(mesh, xs, ys, zs, los, his, nvs, impl=impl)
            )
        else:
            cls_pad = np.zeros(block_size, np.uint8)
            clss = np.stack([t.columns["cls"] for t in batch] + [cls_pad] * pad)
            targets = np.full(rows_per_step, plan.classification.classification, np.int32)
            nvs = np.asarray([t.n_valid for t in batch] + [0] * pad, np.int32)
            pending.append(mesh_mod.sharded_class_count(mesh, clss, targets, nvs))
        drain(MAX_INFLIGHT_STEPS - 1)

    with timer.stage("scan"):
        for task in feeder:
            batch.append(task)
            if len(batch) == rows_per_step:
                flush(batch)
                batch = []
        if batch:
            flush(batch)
        drain(0)

    return total, [], []


# ---------------------------------------------------------------------------
# collect path (output and/or density)
# ---------------------------------------------------------------------------


def _run_collect(
    plan, files, readers, active, file_bounds, grid, *,
    block_size, workers, prefetch, timer, keep_hits, block_index=None,
    index_collectors=None,
):
    is_bounds = plan.bounds is not None
    is_time = plan.time_range is not None
    dumper = _Dumper(plan.output_dir)
    all_hits: list[FileHits] = []
    total = 0

    def predicate_mask_dev(task, cols_dev):
        nv = jnp.asarray(task.n_valid, jnp.int32)
        if is_bounds:
            return predicate.bbox_mask(
                cols_dev["x"], cols_dev["y"], cols_dev["z"],
                jnp.asarray(task.lo), jnp.asarray(task.hi), nv,
            )
        if is_time:
            # host f64 predicate (no TPU f64); mask moves to device only
            # when density needs it there
            gps = task.columns["gps"]
            m = (gps >= plan.time_range.start) & (gps < plan.time_range.end)
            m[task.n_valid :] = False
            return jnp.asarray(m)
        return predicate.class_mask(
            cols_dev["cls"],
            jnp.asarray(plan.classification.classification, jnp.int32),
            nv,
        )

    density = plan.density
    scope = density.scope if density else None

    index_collectors = index_collectors or {}

    def load(file_idx, start, stop):
        cols = {}
        r = readers[file_idx]
        if is_bounds or density is not None:
            pos = r.column("position", start, stop)
            collector = index_collectors.get(file_idx)
            if collector is not None:
                collector.update(start, pos)
            cols["x"] = np.ascontiguousarray(pos[:, 0])
            cols["y"] = np.ascontiguousarray(pos[:, 1])
            cols["z"] = np.ascontiguousarray(pos[:, 2])
        if is_time:
            cols["gps"] = np.ascontiguousarray(r.column("gps_time", start, stop))
        elif not is_bounds:
            cols["cls"] = np.ascontiguousarray(r.column("classification", start, stop))
        return cols

    global_state: np.ndarray | None = None

    from .index import CONTAINED, DISJOINT, class_present, classify_block

    block_index = block_index or {}

    with timer.stage("scan"):
        for file_idx in active:
            r = readers[file_idx]
            n = r.point_count
            file_state: np.ndarray | None = None
            file_indices: list[np.ndarray] = []

            idx_info = block_index.get(file_idx)
            tasks = []
            for b in range((n + block_size - 1) // block_size):
                start = b * block_size
                stop = min(start + block_size, n)
                if idx_info is not None and is_bounds:
                    lo, hi = file_bounds[file_idx]
                    cls = classify_block(idx_info[1], idx_info[0], start, stop, lo, hi)
                    if cls == DISJOINT:
                        timer.counts["index_skipped_blocks"] += 1
                        timer.counts["index_pruned_points"] += stop - start
                        continue
                    if cls == CONTAINED and density is None:
                        # every point in the block matches: no device pass
                        file_indices.append(np.arange(start, stop, dtype=np.int64))
                        timer.counts["index_contained_blocks"] += 1
                        timer.counts["index_pruned_points"] += stop - start
                        continue
                elif idx_info is not None and plan.classification is not None:
                    if not class_present(
                        idx_info[2], idx_info[0], start, stop,
                        plan.classification.classification,
                    ):
                        timer.counts["index_skipped_blocks"] += 1
                        timer.counts["index_pruned_points"] += stop - start
                        continue
                tasks.append((file_idx, b, start, stop))

            feeder = BlockFeeder(
                tasks, load, block_size,
                file_bounds=file_bounds, workers=workers, prefetch=prefetch,
            )
            params = grid.device_params(r.header.scale, r.header.offset) if grid else None

            for task in feeder:
                cols_dev = {k: jnp.asarray(v) for k, v in task.columns.items()}
                if density is not None:
                    mask = predicate_mask_dev(task, cols_dev)
                    winners = density_ops.block_grid_sample_masked(
                        cols_dev["x"], cols_dev["y"], cols_dev["z"],
                        mask, task.start, task.n_valid, params,
                    )
                    if scope == "file":
                        file_state = density_ops.merge_winners_host(
                            file_state, winners, file_idx
                        )
                    else:
                        global_state = density_ops.merge_winners_host(
                            global_state, winners, file_idx
                        )
                else:
                    # pass 1: fused count (no mask materialized in HBM);
                    # pass 2 only for blocks with hits (selective queries
                    # skip most blocks entirely)
                    nv = jnp.asarray(task.n_valid, jnp.int32)
                    if is_bounds:
                        cnt = int(predicate.bbox_count(
                            cols_dev["x"], cols_dev["y"], cols_dev["z"],
                            jnp.asarray(task.lo), jnp.asarray(task.hi), nv,
                        ))
                    elif is_time:
                        gps = task.columns["gps"][: task.n_valid]
                        cnt = int(np.count_nonzero(
                            (gps >= plan.time_range.start) & (gps < plan.time_range.end)
                        ))
                    else:
                        cnt = int(predicate.class_count(
                            cols_dev["cls"],
                            jnp.asarray(plan.classification.classification, jnp.int32),
                            nv,
                        ))
                    if cnt:
                        cap = compact.pow2_bucket(cnt, block_size)
                        if is_bounds:
                            idx = compact.bbox_compact(
                                cols_dev["x"], cols_dev["y"], cols_dev["z"],
                                jnp.asarray(task.lo), jnp.asarray(task.hi), nv,
                                cap=cap,
                            )
                        elif is_time:
                            mask = predicate_mask_dev(task, cols_dev)
                            idx, _ = compact.compact_indices(mask, cap=cap)
                        else:
                            idx = compact.class_compact(
                                cols_dev["cls"],
                                jnp.asarray(plan.classification.classification, jnp.int32),
                                nv,
                                cap=cap,
                            )
                        local = np.asarray(idx[:cnt], np.int64)
                        file_indices.append(local + task.start)

            if density is None:
                idxs = (
                    # sorted -> hits come out in file order, like the
                    # reference's sequential collector pushes
                    np.sort(np.concatenate(file_indices))
                    if file_indices
                    else np.empty(0, np.int64)
                )
                hits = _gather_hits(r, idxs, file_idx) if len(idxs) else _empty_hits(file_idx)
                total += hits.count
                dumper.dump(hits)
                if keep_hits:
                    all_hits.append(hits)
            elif scope == "file":
                hits = _winners_to_hits(file_state, r, file_idx)
                total += hits.count
                dumper.dump(hits)
                if keep_hits:
                    all_hits.append(hits)

    if density is not None and scope == "global":
        combined: list[FileHits] = []
        if global_state is not None and len(global_state):
            for file_idx in np.unique(global_state["file_idx"]):
                sub = global_state[global_state["file_idx"] == file_idx]
                combined.append(_winners_to_hits(sub, readers[file_idx], int(file_idx)))
        merged = _concat_hits(combined)
        total += merged.count
        dumper.dump(merged)
        if keep_hits:
            all_hits.append(merged)

    return total, all_hits, dumper.files


def _winners_to_hits(state: np.ndarray | None, reader, file_idx: int) -> FileHits:
    if state is None or len(state) == 0:
        return _empty_hits(file_idx)
    return _gather_hits(reader, np.sort(state["gidx"]), file_idx)


def _concat_hits(parts: list[FileHits]) -> FileHits:
    if not parts:
        return _empty_hits(-1)
    return FileHits(
        file_idx=-1,
        position_world=np.concatenate([p.position_world for p in parts]),
        classification=np.concatenate([p.classification for p in parts]),
        color=np.concatenate([p.color for p in parts]),
        intensity=np.concatenate([p.intensity for p in parts]),
    )
