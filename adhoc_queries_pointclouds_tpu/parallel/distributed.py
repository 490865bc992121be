"""Multi-host distributed queries over DCN + ICI.

The reference is strictly single-process (rayon threads, SURVEY §2.5); its
"all-reduce" is a fold over per-file collectors on the main thread
(main.rs:164-180). The TPU-native lift: every host runs this same SPMD
program under `jax.distributed`, reads its own shard of the file manifest
(the rayon-per-file model raised to hosts), feeds its local devices, and the
per-step `psum` spans the GLOBAL mesh — partial counts ride ICI within a
slice and DCN across hosts, inserted by XLA, no hand-rolled NCCL/MPI.

Query-type coverage matches the local engine (the reference's parallel
driver is query-type agnostic, main.rs:153-161):
  - distributed_count: bbox / class / GPS-time counts, global-mesh psum
  - distributed_collect: the sharded fused predicate+compaction step on the
    global mesh; each host reads back only its addressable output shards
    and gathers/dumps hits from its own files (hit attributes never cross
    hosts — only the final count is all-reduced)

Caps and step counts are agreed across processes up front (max over hosts),
so every host compiles and dispatches the identical program — no divergence,
no deadlock. Single-host processes degenerate gracefully (process_count ==
1 makes this identical to the local engine), which is how it is exercised
in CI; true multi-host runs need a TPU pod slice with
`jax.distributed.initialize` reachable coordinators.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.query import QueryPlan
from ..utils.aabb import clamp_bounds_to_i32, local_query_bounds
from . import mesh as mesh_mod


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up jax.distributed (no-op if already initialized or single host)."""
    if jax.process_count() > 1:
        return
    if coordinator_address is None:
        return  # single-process mode
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh() -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), axis_names=("d",))


def shard_manifest(files: list[Path]) -> list[Path]:
    """This process's slice of the file manifest (round-robin by process)."""
    pid, n = jax.process_index(), jax.process_count()
    return [f for i, f in enumerate(files) if i % n == pid]


def _allreduce_max(value: int, mesh: Mesh) -> int:
    """Agree on max(value) across processes (tiny sharded reduction on DCN)."""
    if jax.process_count() == 1:
        return value
    d_local = len(jax.local_devices())
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")),
        np.full(d_local, value, np.int64),
        (mesh.devices.size,),
    )
    return int(jnp.max(arr))


def _allreduce_sum(value: int, mesh: Mesh) -> int:
    if jax.process_count() == 1:
        return value
    d_local = len(jax.local_devices())
    local = np.zeros(d_local, np.int64)
    local[0] = value
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), local, (mesh.devices.size,)
    )
    return int(jnp.sum(arr))


def _plan_kind(plan: QueryPlan) -> str:
    if plan.bounds is not None:
        return "bbox"
    if plan.time_range is not None:
        return "time"
    return "class"


def _local_tasks(plan: QueryPlan, readers, block_size: int, parity_quirk: bool):
    """(reader_idx, start, stop, lo, hi) blocks of this host's files."""
    is_bounds = plan.bounds is not None
    tasks = []
    for i, r in enumerate(readers):
        lo = np.zeros(3, np.int32)
        hi = np.full(3, -1, np.int32)
        if is_bounds:
            if not r.header.bounds.intersects(plan.bounds.bounds):
                continue
            lo64, hi64 = local_query_bounds(
                plan.bounds.bounds, r.header.scale, r.header.offset,
                parity_quirk=parity_quirk,
            )
            lo, hi = clamp_bounds_to_i32(lo64, hi64)
        n = r.point_count
        for b in range((n + block_size - 1) // block_size):
            start = b * block_size
            tasks.append((i, start, min(start + block_size, n), lo, hi))
    return tasks


def _load_step(kind, plan, readers, chunk, d_local, block_size, q_enc):
    """Stack this host's blocks for one global step (padded with empties)."""
    from ..ops import predicate

    nvs = np.zeros(d_local, np.int32)
    cols = {}
    if kind in ("bbox", "time"):
        cols["a"] = np.zeros((d_local, block_size), np.int32)
        cols["b"] = np.zeros((d_local, block_size), np.int32)
    if kind == "bbox":
        cols["c"] = np.zeros((d_local, block_size), np.int32)
        cols["lo"] = np.zeros((d_local, 3), np.int32)
        cols["hi"] = np.full((d_local, 3), -1, np.int32)  # empty box padding
    elif kind == "class":
        cols["a"] = np.zeros((d_local, block_size), np.uint8)
        cols["t"] = np.full(d_local, plan.classification.classification, np.int32)
    else:
        cols["q"] = np.tile(q_enc, (d_local, 1))
    for j, (i, start, stop, lo, hi) in enumerate(chunk):
        nvs[j] = stop - start
        if kind == "bbox":
            pos = readers[i].column("position", start, stop)
            cols["a"][j, : stop - start] = pos[:, 0]
            cols["b"][j, : stop - start] = pos[:, 1]
            cols["c"][j, : stop - start] = pos[:, 2]
            cols["lo"][j] = lo
            cols["hi"][j] = hi
        elif kind == "class":
            cols["a"][j, : stop - start] = readers[i].column(
                "classification", start, stop
            )
        else:
            th, tl = predicate.encode_f64_sortable(
                readers[i].column("gps_time", start, stop)
            )
            cols["a"][j, : stop - start] = th
            cols["b"][j, : stop - start] = tl
    return cols, nvs


def _to_global(mesh, cols, nvs, kind, d_global, block_size):
    sh2 = NamedSharding(mesh, P("d", None))
    sh1 = NamedSharding(mesh, P("d"))

    def g2(a):
        return jax.make_array_from_process_local_data(
            sh2, a, (d_global,) + a.shape[1:]
        )

    gnvs = jax.make_array_from_process_local_data(sh1, nvs, (d_global,))
    if kind == "bbox":
        return (g2(cols["a"]), g2(cols["b"]), g2(cols["c"]),
                g2(cols["lo"]), g2(cols["hi"]), gnvs)
    if kind == "class":
        gt = jax.make_array_from_process_local_data(sh1, cols["t"], (d_global,))
        return (g2(cols["a"]), gt, gnvs)
    return (g2(cols["a"]), g2(cols["b"]), g2(cols["q"]), gnvs)


def distributed_count(
    input_path: str | Path,
    plan: QueryPlan,
    *,
    block_size: int = 1 << 21,
    parity_quirk: bool = False,
) -> int:
    """bbox/class/GPS-time count over all hosts' file shards, global psum.

    Each step: every process stacks `local_devices` blocks from ITS files,
    assembles the global array from process-local shards
    (jax.make_array_from_process_local_data), and runs the same shard_map
    count step — XLA turns the psum into ICI+DCN collectives. Ragged tails
    are padded with empty blocks, so hosts never diverge in step count.
    """
    from ..engine import discover_files
    from ..formats import open_point_cloud
    from ..ops import predicate

    kind = _plan_kind(plan)
    mesh = global_mesh()
    d_global = mesh.devices.size
    d_local = len(jax.local_devices())

    q_enc = None
    if kind == "time":
        q_enc = np.asarray(
            predicate.encode_f64_scalar(plan.time_range.start)
            + predicate.encode_f64_scalar(plan.time_range.end),
            np.int32,
        )

    readers = [open_point_cloud(f) for f in shard_manifest(discover_files(input_path))]
    tasks = _local_tasks(plan, readers, block_size, parity_quirk)
    steps = _allreduce_max((len(tasks) + d_local - 1) // d_local, mesh)

    total = 0
    for s in range(steps):
        chunk = tasks[s * d_local : (s + 1) * d_local]
        cols, nvs = _load_step(kind, plan, readers, chunk, d_local, block_size, q_enc)
        arrays = _to_global(mesh, cols, nvs, kind, d_global, block_size)
        if kind == "bbox":
            total += int(mesh_mod.sharded_bbox_count(mesh, *arrays))
        elif kind == "class":
            total += int(mesh_mod.sharded_class_count(mesh, *arrays))
        else:
            total += int(mesh_mod.sharded_time_count(mesh, *arrays))

    for r in readers:
        r.close()
    return total


# backwards-compatible alias (round-1 API)
def distributed_bbox_count(input_path, plan, *, block_size=1 << 21, parity_quirk=False):
    return distributed_count(
        input_path, plan, block_size=block_size, parity_quirk=parity_quirk
    )


def distributed_collect(
    input_path: str | Path,
    plan: QueryPlan,
    *,
    block_size: int = 1 << 21,
    parity_quirk: bool = False,
    output_dir: Path | None = None,
    print_stream=None,
    keep_hits: bool = False,
):
    """Collect query over all hosts' file shards.

    Every host participates in every sharded fused predicate+compaction
    step (identical program), then reads back only its addressable shards
    of the (counts, indices) outputs and gathers/dumps hits from its own
    files — the reference's per-file parallel collection (main.rs:153-161)
    lifted to hosts, with hit payloads never crossing the network. Returns
    (global match count, this host's HitEmitter).
    """
    from ..engine import discover_files
    from ..formats import open_point_cloud
    from ..ops import compact, predicate
    from ..sinks import HitEmitter

    kind = _plan_kind(plan)
    mesh = global_mesh()
    d_global = mesh.devices.size
    d_local = len(jax.local_devices())
    # cap must be identical on every process (same compiled program): fixed
    # by env, per-block overflow retried with a host-local dispatch
    cap = min(int(os.environ.get("AQPC_COLLECT_CAP", "8192")), block_size)

    q_enc = None
    if kind == "time":
        q_enc = np.asarray(
            predicate.encode_f64_scalar(plan.time_range.start)
            + predicate.encode_f64_scalar(plan.time_range.end),
            np.int32,
        )

    readers = [open_point_cloud(f) for f in shard_manifest(discover_files(input_path))]
    emitter = HitEmitter(
        readers, output_dir=output_dir, print_stream=print_stream, keep_hits=keep_hits
    )
    tasks = _local_tasks(plan, readers, block_size, parity_quirk)
    steps = _allreduce_max((len(tasks) + d_local - 1) // d_local, mesh)

    local_rows = {}  # global row index -> owning local shard data slot
    for s in range(steps):
        chunk = tasks[s * d_local : (s + 1) * d_local]
        cols, nvs = _load_step(kind, plan, readers, chunk, d_local, block_size, q_enc)
        arrays = _to_global(mesh, cols, nvs, kind, d_global, block_size)
        counts_dev, idx_dev = mesh_mod.sharded_collect(mesh, kind, arrays, cap)

        # read back only this process's shards
        my_counts = np.zeros(d_local, np.int32)
        my_idx = None
        shards = sorted(counts_dev.addressable_shards, key=lambda sh: sh.index[0].start)
        for j, sh in enumerate(shards):
            my_counts[j] = np.asarray(sh.data)[0]
        if (my_counts[: len(chunk)] > 0).any():
            ishards = sorted(idx_dev.addressable_shards, key=lambda sh: sh.index[0].start)
            my_idx = np.concatenate([np.asarray(sh.data) for sh in ishards], axis=0)

        for j, (i, start, stop, lo, hi) in enumerate(chunk):
            c = int(my_counts[j])
            if c == 0:
                continue
            nv = stop - start
            if c == nv:
                emitter.emit_range(i, start, stop)
                continue
            if c <= cap:
                local = my_idx[j, :c]
            else:  # host-local retry at the right pow2 bucket
                cap2 = compact.pow2_bucket(c, block_size)
                nvj = jnp.asarray(nv, jnp.int32)
                if kind == "bbox":
                    pos = readers[i].column("position", start, stop)
                    from .pipeline import pad_to

                    idx2 = compact.bbox_compact(
                        jnp.asarray(pad_to(np.ascontiguousarray(pos[:, 0]), block_size)),
                        jnp.asarray(pad_to(np.ascontiguousarray(pos[:, 1]), block_size)),
                        jnp.asarray(pad_to(np.ascontiguousarray(pos[:, 2]), block_size)),
                        jnp.asarray(lo), jnp.asarray(hi), nvj, cap=cap2,
                    )
                elif kind == "class":
                    from .pipeline import pad_to

                    cls = pad_to(
                        np.ascontiguousarray(readers[i].column("classification", start, stop)),
                        block_size,
                    )
                    idx2 = compact.class_compact(
                        jnp.asarray(cls),
                        jnp.asarray(plan.classification.classification, jnp.int32),
                        nvj, cap=cap2,
                    )
                else:
                    from .pipeline import pad_to

                    th, tl = predicate.encode_f64_sortable(
                        readers[i].column("gps_time", start, stop)
                    )
                    idx2 = compact.time_compact(
                        jnp.asarray(pad_to(th, block_size)),
                        jnp.asarray(pad_to(tl, block_size)),
                        jnp.asarray(q_enc), nvj, cap=cap2,
                    )
                local = np.asarray(idx2[:c])
            emitter.emit_indices(i, local.astype(np.int64) + start)

    for i in range(len(readers)):
        emitter.finalize_file(i)
    total = _allreduce_sum(emitter.total, mesh)
    for r in readers:
        r.close()
    return total, emitter


def _allgather_keys(keys: np.ndarray, mesh: Mesh) -> np.ndarray:
    """Union of winner cell keys across processes (u64, order irrelevant).

    Pads to the cross-host max and all-gathers one (d_global, 1 + maxn)
    int64 array — column 0 carries each row's valid-key count, so padding
    is sliced by count rather than filtered by an in-band sentinel (a
    legitimate all-ones masked key, possible when sum(bits) == 64 or for
    wrapped beyond-max-face cells, would collide with any sentinel value).
    Winner payloads never travel, only the 8-byte keys."""
    if jax.process_count() == 1:
        return keys
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P2

    d_local = len(jax.local_devices())
    maxn = max(_allreduce_max(len(keys), mesh), 1)
    local64 = np.zeros((d_local, 1 + maxn), np.int64)
    local64[0, 0] = len(keys)
    local64[0, 1 : 1 + len(keys)] = keys.view(np.int64)
    # Ship as int32 words, not int64: the gloo CPU backend's s64 all_gather
    # mangles payloads (elements come back bit-interleaved as s32 pairs —
    # observed on jax 0.9.0, tools/dist2.py caught it). Element-wise bit
    # layout is preserved under the s32 view, so gather that and view back.
    local = local64.view(np.int32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P2("d", None)),
        local,
        (mesh.devices.size, local.shape[1]),
    )
    gathered = np.ascontiguousarray(
        jax.jit(
            shard_map(
                lambda x: jax.lax.all_gather(x, "d", tiled=True),
                mesh=mesh, in_specs=P2("d", None), out_specs=P2(), check_vma=False,
            )
        )(arr)
    ).view(np.int64)
    parts = [row[1 : 1 + row[0]] for row in gathered if row[0] > 0]
    if not parts:
        return np.empty(0, np.uint64)
    return np.concatenate(parts).view(np.uint64)


def distributed_density(
    input_path: str | Path,
    plan: QueryPlan,
    *,
    block_size: int = 1 << 21,
) -> int:
    """Max-density sampled count over all hosts' file shards.

    Every host runs the local density pipeline (device candidate pruning +
    exact f64 host resolution) over its manifest shard against ONE shared
    grid (global header bounds when the plan has no bbox). scope='file'
    needs only a count all-reduce; scope='global' unions the winner cell
    keys across hosts — the count is the number of distinct keys, which is
    independent of cross-host tie resolution."""
    from ..engine import discover_files, get_total_bounds, run_query
    from ..formats import open_point_cloud
    from ..utils.aabb import AABB

    all_files = discover_files(input_path)
    my_files = shard_manifest(all_files)
    mesh = global_mesh()

    # shared grid bounds: the query box, or the union of ALL hosts' headers
    # (headers are cheap: every host reads every header)
    if plan.bounds is not None:
        grid_bounds = None  # run_query derives it from the box
    else:
        grid_bounds = AABB.empty()
        for f in all_files:
            r = open_point_cloud(f)
            grid_bounds = grid_bounds.union(r.header.bounds)
            r.close()

    state_out: dict = {}
    if my_files:
        run_query(
            my_files, plan, block_size=block_size,
            density_grid_bounds=grid_bounds, density_state_out=state_out,
        )
    if plan.density.scope == "file":
        local = sum(
            len(s) for s in state_out.get("file", {}).values() if s is not None
        )
        return _allreduce_sum(local, mesh)
    g = state_out.get("global")
    keys = g["key"] if g is not None and len(g) else np.empty(0, np.uint64)
    return int(len(np.unique(_allgather_keys(np.asarray(keys), mesh))))
