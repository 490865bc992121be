"""Max-density grid sampling: keep the point closest to its cell center.

TPU redesign of the reference's SparseGrid hash map
(query/src/grid_sampling.rs:49-105): instead of a per-point HashMap
compare-and-swap, each block is deduplicated on device with a multi-key sort
(cell_z, cell_xy, dist^2, point_idx) + first-of-run selection — a
segment-min that needs no data-dependent shapes and no giant dense grid (the
paper's ca13-XL query spans ~800 M cells, far too many to materialize). The
few per-block winners are then merged into a sparse running state on the
host (numpy lexsort), preserving the reference's tie rule: on equal
distance, the first-inserted point wins (grid_sampling.rs:97 strict <).

Cell math runs in f32 on *bmin-relative* local coordinates; with cells many
thousand int32 units wide, f32's ~6e-8 relative error only matters for
points within epsilon of a cell boundary (documented parity caveat — the
reference computes in f64 world space).

Cell indices: cell = floor((p - bmin) * dims / extent) per axis, like
grid_sampling.rs:51-60. A point exactly on the max face lands in index
`dims` (the reference casts without clamping, then bit-masks — which wraps
to cell 0 only when dims is an exact power of two; we keep the honest extra
boundary cell instead and document the divergence).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.aabb import AABB

I32_MAX = np.int32(2**31 - 1)

WINNER_DTYPE = np.dtype(
    [
        ("cz", "<i4"),
        ("cxy", "<i4"),
        ("d2", "<f4"),
        ("file_idx", "<i4"),
        ("gidx", "<i8"),
    ]
)


@dataclasses.dataclass(frozen=True)
class GridSpec3D:
    """Host-side grid geometry: bounds + cell size -> integer cell lattice."""

    bounds: AABB
    cell_size: float
    dims: tuple[int, int, int]

    @staticmethod
    def create(bounds: AABB, cell_size: float) -> "GridSpec3D":
        dims = tuple(
            max(int(np.ceil(e / cell_size)), 1) for e in bounds.extent
        )
        # cell_xy = cx + (dims_x+1) * cy must fit in int32 (z is a separate
        # sort key, so only the x*y plane is linearized).
        if (dims[0] + 1) * (dims[1] + 1) >= 2**31:
            raise ValueError(
                f"Too many cells ({dims[0]}*{dims[1]}*{dims[2]}) in grid — "
                "x*y plane exceeds int32 linearization"
            )
        return GridSpec3D(bounds, float(cell_size), dims)

    def device_params(
        self,
        scale: tuple[float, float, float],
        offset: tuple[float, float, float],
    ) -> dict[str, np.ndarray]:
        """Per-file constants for the device cell kernel.

        q0 = (bmin - offset)/scale is the grid origin in the file's integer
        local space; dpl = dims/extent_local converts local units to cell
        counts; half = cell_size/(2*scale) locates cell centers in local
        units. d2 is computed in local units per axis then re-scaled to
        world meters so ties match the reference's world-space metric.
        """
        scale = np.asarray(scale, np.float64)
        offset = np.asarray(offset, np.float64)
        bmin = np.asarray(self.bounds.min, np.float64)
        extent = np.asarray(self.bounds.extent, np.float64)
        dims = np.asarray(self.dims, np.float64)
        extent_local = extent / scale
        return {
            "q0": ((bmin - offset) / scale).astype(np.float32),
            "dpl": (dims / np.maximum(extent_local, 1e-30)).astype(np.float32),
            "cell_local": (self.cell_size / scale).astype(np.float32),
            "scale": scale.astype(np.float32),
            "dims": np.asarray(self.dims, np.int32),
        }


@functools.partial(jax.jit, static_argnames=())
def _block_grid_sample(x, y, z, pred_mask, n_valid, q0, dpl, cell_local, scale, dims):
    """Per-block segment-min. Returns sorted (cz, cxy, d2, idx, winner_mask).

    idx is the block-local point index; the caller rebases to a file-global
    int64 ordinal on host (a single LAS 1.4 file may exceed 2^31 points)."""
    n = x.shape[0]
    fx = x.astype(jnp.float32) - q0[0]
    fy = y.astype(jnp.float32) - q0[1]
    fz = z.astype(jnp.float32) - q0[2]
    cx = jnp.floor(fx * dpl[0]).astype(jnp.int32)
    cy = jnp.floor(fy * dpl[1]).astype(jnp.int32)
    cz = jnp.floor(fz * dpl[2]).astype(jnp.int32)
    cx = jnp.clip(cx, 0, dims[0])
    cy = jnp.clip(cy, 0, dims[1])
    cz = jnp.clip(cz, 0, dims[2])
    # distance^2 to cell center, in world meters^2
    dxc = (fx - (cx.astype(jnp.float32) + 0.5) * cell_local[0]) * scale[0]
    dyc = (fy - (cy.astype(jnp.float32) + 0.5) * cell_local[1]) * scale[1]
    dzc = (fz - (cz.astype(jnp.float32) + 0.5) * cell_local[2]) * scale[2]
    d2 = dxc * dxc + dyc * dyc + dzc * dzc

    cxy = cx + (dims[0] + 1) * cy
    idx = jax.lax.iota(jnp.int32, n)
    invalid = (idx >= n_valid) | ~pred_mask
    cz = jnp.where(invalid, I32_MAX, cz)

    # 4 sort keys: ties on d2 resolve to the smallest point index, i.e. the
    # first-inserted point of the block (reference tie rule).
    cz_s, cxy_s, d2_s, idx_s = jax.lax.sort((cz, cxy, d2, idx), num_keys=4)
    first = jnp.concatenate(
        [
            jnp.ones((1,), bool),
            (cz_s[1:] != cz_s[:-1]) | (cxy_s[1:] != cxy_s[:-1]),
        ]
    )
    winner = first & (cz_s != I32_MAX)
    return cz_s, cxy_s, d2_s, idx_s, winner


def block_grid_sample(x, y, z, base_gidx: int, n_valid, params) -> np.ndarray:
    """Device segment-min over all valid points of a block."""
    mask = jnp.ones(x.shape[0], dtype=bool)
    return block_grid_sample_masked(x, y, z, mask, base_gidx, n_valid, params)


def block_grid_sample_masked(
    x, y, z, pred_mask, base_gidx: int, n_valid, params
) -> np.ndarray:
    """Device segment-min over points passing the predicate mask (density
    composes with bbox/class queries, reference main.rs:253-264)."""
    cz, cxy, d2, idx, winner = _block_grid_sample(
        x,
        y,
        z,
        pred_mask,
        jnp.asarray(n_valid, jnp.int32),
        jnp.asarray(params["q0"]),
        jnp.asarray(params["dpl"]),
        jnp.asarray(params["cell_local"]),
        jnp.asarray(params["scale"]),
        jnp.asarray(params["dims"]),
    )
    w = np.asarray(winner)
    out = np.empty(int(w.sum()), dtype=WINNER_DTYPE)
    out["cz"] = np.asarray(cz)[w]
    out["cxy"] = np.asarray(cxy)[w]
    out["d2"] = np.asarray(d2)[w]
    out["gidx"] = np.asarray(idx)[w].astype(np.int64) + int(base_gidx)
    out["file_idx"] = 0
    return out


def merge_winners_host(
    state: np.ndarray | None, new: np.ndarray, file_idx: int
) -> np.ndarray:
    """Merge per-block winners into the running sparse grid state.

    Ties on d2 keep the earlier-inserted point (rank: existing state first,
    then ascending gidx within the new block), matching grid_sampling.rs:97.
    """
    new = new.copy()
    new["file_idx"] = file_idx
    if state is None or len(state) == 0:
        merged = new
    else:
        merged = np.concatenate([state, new])
    if len(merged) <= 1:
        return merged
    rank = np.zeros(len(merged), np.int8)
    if state is not None and len(state):
        rank[len(state):] = 1
    order = np.lexsort((merged["gidx"], rank, merged["d2"], merged["cxy"], merged["cz"]))
    merged = merged[order]
    first = np.empty(len(merged), bool)
    first[0] = True
    first[1:] = (merged["cz"][1:] != merged["cz"][:-1]) | (
        merged["cxy"][1:] != merged["cxy"][:-1]
    )
    return merged[first]
