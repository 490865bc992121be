"""HBM-resident datasets: repeated ad-hoc queries at memory bandwidth.

The paper's engine re-reads files from disk on every query (cold-cache is
its headline protocol). A TPU changes the economics: once the SoA columns
are resident in HBM (sharded over the chip mesh), every subsequent ad-hoc
query is ONE device dispatch scanning at HBM bandwidth — no disk, no host,
no decode. This is the interactive/serving story the reference cannot offer
and the main reason to run this workload on accelerators at all.

Sizing guide (v5e: 16 GiB HBM/chip): positions are 12 B/point, so ~1.3 B
points/chip fully resident; classification-only residency is 1 B/point
(~16 B points/chip) — the paper's entire ca13 (2.6 B points) fits
class-resident on a single chip, or fully resident on a v5e-4 mesh.

Counts are returned per block (int32, block <= 2^21 points) and summed on
the host in Python ints, so multi-billion-hit queries (ca13-XL ~2.6 B) never
overflow device int32.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats import open_point_cloud
from ..models.query import QueryPlan
from ..utils.aabb import clamp_bounds_to_i32, local_query_bounds
from . import mesh as mesh_mod

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _stack_sharded(mesh: Mesh, arr: np.ndarray) -> jax.Array:
    return jax.device_put(arr, NamedSharding(mesh, P("d", *([None] * (arr.ndim - 1)))))


@dataclasses.dataclass
class ResidentDataset:
    mesh: Mesh
    block_size: int
    n_blocks: int  # padded to a multiple of the mesh size
    headers: list
    files: list[Path]
    file_idx: np.ndarray  # (n_blocks,) int32, -1 for padding blocks
    nvs: np.ndarray  # (n_blocks,) int32 valid points per block
    block_start: np.ndarray | None = None  # (n_blocks,) int64 file-local start
    xs: jax.Array | None = None  # (n_blocks, B) int32, sharded over 'd'
    ys: jax.Array | None = None
    zs: jax.Array | None = None
    cls: jax.Array | None = None  # (n_blocks, B) uint8, sharded over 'd'
    total_points: int = 0

    # ------------------------------------------------------------------

    @staticmethod
    def load(
        input_path: str | Path,
        *,
        attrs: tuple[str, ...] = ("position", "classification"),
        mesh: Mesh | None = None,
        block_size: int = 1 << 21,
        workers: int = 8,
    ) -> "ResidentDataset":
        from ..engine import discover_files
        from ..ops import predicate

        files = discover_files(input_path)
        if not files:
            raise FileNotFoundError(f"No supported point-cloud files under {input_path}")
        mesh = mesh or mesh_mod.make_mesh()
        d = mesh.devices.size
        readers = [open_point_cloud(f) for f in files]
        max_pts = max(r.point_count for r in readers)
        if max_pts < block_size:
            q = predicate.MIN_BLOCK_MULTIPLE if jax.default_backend() == "tpu" else 8192
            block_size = min(block_size, ((max_pts + q - 1) // q) * q)

        tasks = []
        for i, r in enumerate(readers):
            n = r.point_count
            for b in range((n + block_size - 1) // block_size):
                start = b * block_size
                tasks.append((i, start, min(start + block_size, n)))
        n_blocks = ((len(tasks) + d - 1) // d) * d

        file_idx = np.full(n_blocks, -1, np.int32)
        nvs = np.zeros(n_blocks, np.int32)
        block_start = np.zeros(n_blocks, np.int64)
        want_pos = "position" in attrs
        want_cls = "classification" in attrs
        xs = np.zeros((n_blocks, block_size), np.int32) if want_pos else None
        ys = np.zeros((n_blocks, block_size), np.int32) if want_pos else None
        zs = np.zeros((n_blocks, block_size), np.int32) if want_pos else None
        cls = np.zeros((n_blocks, block_size), np.uint8) if want_cls else None

        from concurrent.futures import ThreadPoolExecutor

        def fill(j):
            i, start, stop = tasks[j]
            r = readers[i]
            file_idx[j] = i
            nvs[j] = stop - start
            block_start[j] = start
            if want_pos:
                p = r.column("position", start, stop)
                xs[j, : stop - start] = p[:, 0]
                ys[j, : stop - start] = p[:, 1]
                zs[j, : stop - start] = p[:, 2]
            if want_cls:
                cls[j, : stop - start] = r.column("classification", start, stop)

        with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
            list(pool.map(fill, range(len(tasks))))

        ds = ResidentDataset(
            mesh=mesh,
            block_size=block_size,
            n_blocks=n_blocks,
            headers=[r.header for r in readers],
            files=files,
            file_idx=file_idx,
            nvs=nvs,
            block_start=block_start,
            xs=_stack_sharded(mesh, xs) if want_pos else None,
            ys=_stack_sharded(mesh, ys) if want_pos else None,
            zs=_stack_sharded(mesh, zs) if want_pos else None,
            cls=_stack_sharded(mesh, cls) if want_cls else None,
            total_points=int(nvs.sum()),
        )
        for r in readers:
            r.close()
        jax.block_until_ready([a for a in (ds.xs, ds.ys, ds.zs, ds.cls) if a is not None])
        return ds

    @property
    def resident_bytes(self) -> int:
        total = 0
        for a in (self.xs, self.ys, self.zs, self.cls):
            if a is not None:
                total += a.size * a.dtype.itemsize
        return total

    # ------------------------------------------------------------------

    def _bbox_fn(self):
        mesh = self.mesh

        def f(xs, ys, zs, los, his, nvs):
            idx = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 1)
            m = idx < nvs[:, None]
            m &= (xs >= los[:, 0:1]) & (xs <= his[:, 0:1])
            m &= (ys >= los[:, 1:2]) & (ys <= his[:, 1:2])
            m &= (zs >= los[:, 2:3]) & (zs <= his[:, 2:3])
            return jnp.sum(m, axis=1, dtype=jnp.int32)

        return jax.jit(
            shard_map(
                f,
                mesh=mesh,
                in_specs=(
                    P("d", None), P("d", None), P("d", None),
                    P("d", None), P("d", None), P("d"),
                ),
                out_specs=P("d"),
                check_vma=False,
            )
        )

    def _class_fn(self):
        mesh = self.mesh

        def f(cls, target, nvs):
            idx = jax.lax.broadcasted_iota(jnp.int32, cls.shape, 1)
            m = (idx < nvs[:, None]) & (cls.astype(jnp.int32) == target)
            return jnp.sum(m, axis=1, dtype=jnp.int32)

        return jax.jit(
            shard_map(
                f,
                mesh=mesh,
                in_specs=(P("d", None), P(), P("d")),
                out_specs=P("d"),
                check_vma=False,
            )
        )

    def density_count(self, plan: QueryPlan) -> int:
        """Max-density sampled count against resident blocks.

        Runs the per-block device segment-min (ops/density.py) over blocks
        that are already in HBM — no disk, no decode — then the sparse host
        merge. Per-file or global scope per the plan."""
        from ..ops import density as density_ops, predicate

        if plan.density is None:
            raise ValueError("density_count needs a density plan")
        if plan.time_range is not None:
            raise NotImplementedError(
                "resident mode does not support GPS-time predicates (f64 on host)"
            )
        if self.xs is None:
            raise ValueError("dataset loaded without position columns")
        if plan.bounds is not None:
            grid_bounds = plan.bounds.bounds
        else:
            from ..utils.aabb import AABB

            grid_bounds = AABB.empty()
            for h in self.headers:
                grid_bounds = grid_bounds.union(h.bounds)
        grid = density_ops.GridSpec3D.create(grid_bounds, plan.density.cell_size)

        states: dict[int, np.ndarray | None] = {}
        global_state: np.ndarray | None = None
        tables_per_file = {}
        bounds_per_file = {}
        for i, h in enumerate(self.headers):
            if plan.bounds is not None:
                if not h.bounds.intersects(plan.bounds.bounds):
                    continue
                lo64, hi64 = local_query_bounds(
                    plan.bounds.bounds, h.scale, h.offset,
                    parity_quirk=plan.parity_quirk,
                )
                bounds_per_file[i] = clamp_bounds_to_i32(lo64, hi64)
            tables_per_file[i] = {
                k: jnp.asarray(v)
                for k, v in grid.file_tables(h.scale, h.offset).items()
            }

        per_file_scope = plan.density.scope == "file"
        cap = 8192
        for b in range(self.n_blocks):
            i = int(self.file_idx[b])
            if i < 0 or i not in tables_per_file:
                continue
            if plan.bounds is not None and i not in bounds_per_file:
                continue
            xb, yb, zb = self.xs[b], self.ys[b], self.zs[b]
            nv = int(self.nvs[b])
            if plan.bounds is not None:
                lo, hi = bounds_per_file[i]
                mask = predicate.bbox_mask(xb, yb, zb, jnp.asarray(lo), jnp.asarray(hi), nv)
            else:
                if self.cls is None:
                    raise ValueError("dataset loaded without classification column")
                mask = predicate.class_mask(
                    self.cls[b], jnp.asarray(plan.classification.classification, jnp.int32), nv
                )
            # device candidate selection; exact f64 keys/d2 resolved on host
            # for the few candidates (ops/density.py design)
            cnt, idx = density_ops.block_density_candidates(
                xb, yb, zb, mask, nv, tables_per_file[i], cap=min(cap, self.block_size)
            )
            c = int(cnt)
            if c == 0:
                continue
            if c > min(cap, self.block_size):
                from ..ops.compact import pow2_bucket

                cap = pow2_bucket(c, self.block_size)
                _, idx = density_ops.block_density_candidates(
                    xb, yb, zb, mask, nv, tables_per_file[i], cap=cap
                )
            local = np.asarray(idx[:c], np.int64)
            sel = jnp.asarray(local)
            xyz = np.stack(
                [
                    np.asarray(jnp.take(xb, sel)),
                    np.asarray(jnp.take(yb, sel)),
                    np.asarray(jnp.take(zb, sel)),
                ],
                axis=1,
            ).astype(np.float64)
            h = self.headers[i]
            world = xyz * np.asarray(h.scale) + np.asarray(h.offset)
            winners = grid.make_winners(world, local + int(self.block_start[b]), i)
            if per_file_scope:
                states[i] = density_ops.merge_winners_host(states.get(i), winners)
            else:
                global_state = density_ops.merge_winners_host(global_state, winners)
        if per_file_scope:
            return sum(len(s) for s in states.values() if s is not None)
        return 0 if global_state is None else len(global_state)

    def count(self, plan: QueryPlan) -> int:
        """One resident ad-hoc count query = one device dispatch
        (density plans: one dispatch per resident block + host merge)."""
        if plan.time_range is not None:
            raise NotImplementedError(
                "resident mode supports bbox/class counts; GPS-time queries "
                "use the streaming engine (f64 predicate runs on the host)"
            )
        if plan.density is not None:
            return self.density_count(plan)
        if plan.collects_points:
            raise NotImplementedError("resident mode supports count queries")
        nvs = jnp.asarray(self.nvs)
        if plan.bounds is not None:
            if self.xs is None:
                raise ValueError("dataset loaded without position columns")
            los = np.zeros((self.n_blocks, 3), np.int32)
            his = np.full((self.n_blocks, 3), -1, np.int32)  # empty box default
            for i, h in enumerate(self.headers):
                if not h.bounds.intersects(plan.bounds.bounds):
                    continue  # header prefilter: leave the empty box
                lo64, hi64 = local_query_bounds(
                    plan.bounds.bounds, h.scale, h.offset, parity_quirk=plan.parity_quirk
                )
                lo, hi = clamp_bounds_to_i32(lo64, hi64)
                sel = self.file_idx == i
                los[sel] = lo
                his[sel] = hi
            if not hasattr(self, "_bbox_jit"):
                self._bbox_jit = self._bbox_fn()
            counts = self._bbox_jit(
                self.xs, self.ys, self.zs, jnp.asarray(los), jnp.asarray(his), nvs
            )
        else:
            if self.cls is None:
                raise ValueError("dataset loaded without classification column")
            if not hasattr(self, "_class_jit"):
                self._class_jit = self._class_fn()
            counts = self._class_jit(
                self.cls,
                jnp.asarray(plan.classification.classification, jnp.int32),
                nvs,
            )
        return int(np.asarray(counts).astype(np.int64).sum())
