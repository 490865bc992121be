"""Multi-host distributed queries over DCN + ICI.

The reference is strictly single-process (rayon threads, SURVEY §2.5); its
"all-reduce" is a fold over per-file collectors on the main thread
(main.rs:164-180). The TPU-native lift: every host runs this same SPMD
program under `jax.distributed`, reads its own shard of the file manifest
(the rayon-per-file model raised to hosts), feeds its local devices, and the
per-step `psum` spans the GLOBAL mesh — partial counts ride ICI within a
slice and DCN across hosts, inserted by XLA, no hand-rolled NCCL/MPI.

Single-host processes degenerate gracefully (process_count == 1 makes this
identical to the local engine), which is how it is exercised in CI; true
multi-host runs need a TPU pod slice with `jax.distributed.initialize`
reachable coordinators.
"""

from __future__ import annotations

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


def distributed_bbox_count(
    input_path: str | Path,
    plan: QueryPlan,
    *,
    block_size: int = 1 << 21,
    parity_quirk: bool = False,
) -> int:
    """Count query over all hosts' file shards with a global-mesh psum.

    Each step: every process stacks `local_devices * K` blocks from ITS
    files, assembles the global array from process-local shards
    (jax.make_array_from_process_local_data), and runs the same shard_map
    count step — XLA turns the psum into ICI+DCN collectives. Ragged tails
    are padded with empty blocks, so hosts never diverge in step count.
    """
    from ..engine import discover_files
    from ..formats import open_point_cloud

    mesh = global_mesh()
    d_global = mesh.devices.size
    d_local = len(jax.local_devices())
    sharding = NamedSharding(mesh, P("d", None))
    sharding1 = NamedSharding(mesh, P("d"))

    all_files = discover_files(input_path)
    my_files = shard_manifest(all_files)
    readers = [open_point_cloud(f) for f in my_files]

    tasks = []
    for i, r in enumerate(readers):
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

    # every process must run the same number of steps: agree on the max
    my_steps = (len(tasks) + d_local - 1) // d_local
    if jax.process_count() > 1:
        # cross-host max via a tiny sharded array reduction (rides DCN)
        arr = jax.make_array_from_process_local_data(
            sharding1, np.full(d_local, my_steps, np.int32), (d_global,)
        )
        steps = int(jnp.max(arr))
    else:
        steps = my_steps

    total = 0
    for s in range(steps):
        chunk = tasks[s * d_local : (s + 1) * d_local]
        xs = np.zeros((d_local, block_size), np.int32)
        ys = np.zeros((d_local, block_size), np.int32)
        zs = np.zeros((d_local, block_size), np.int32)
        los = np.zeros((d_local, 3), np.int32)
        his = np.full((d_local, 3), -1, np.int32)  # empty boxes for padding
        nvs = np.zeros(d_local, np.int32)
        for j, (i, start, stop, lo, hi) in enumerate(chunk):
            pos = readers[i].column("position", start, stop)
            xs[j, : stop - start] = pos[:, 0]
            ys[j, : stop - start] = pos[:, 1]
            zs[j, : stop - start] = pos[:, 2]
            los[j] = lo
            his[j] = hi
            nvs[j] = stop - start
        gshape2 = (d_global, block_size)
        gxs = jax.make_array_from_process_local_data(sharding, xs, gshape2)
        gys = jax.make_array_from_process_local_data(sharding, ys, gshape2)
        gzs = jax.make_array_from_process_local_data(sharding, zs, gshape2)
        glos = jax.make_array_from_process_local_data(sharding, los, (d_global, 3))
        ghis = jax.make_array_from_process_local_data(sharding, his, (d_global, 3))
        gnvs = jax.make_array_from_process_local_data(sharding1, nvs, (d_global,))
        total += int(
            mesh_mod.sharded_bbox_count(mesh, gxs, gys, gzs, glos, ghis, gnvs)
        )

    for r in readers:
        r.close()
    return total
