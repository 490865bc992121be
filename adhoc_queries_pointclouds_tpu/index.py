"""Block min/max sidecar index: the reference's sketched-but-unbuilt
"on-the-fly index building across scans" (improvements.md:3-10) realized.

The paper's thesis is that point-cloud queries need no *acceleration
structure* — and none is required here either: the index is an optional
sidecar (`<file>.aqpc-idx`) of per-block coordinate min/max that any scan
can emit as a byproduct of reading the data once. With it, a bbox query
classifies each block against the integer-domain query box:

  disjoint   -> skip the block entirely (no IO, no device work)
  contained  -> count its points without reading them (min/max inside the
                closed box implies every point matches — still exact)
  partial    -> scan normally

Exactness is preserved by construction; the index only ever removes work.
Sidecars carry the source file's size+mtime and are ignored when stale.

Format (little-endian):
  magic "AQPCIDX1" | u32 index_block_size | u64 n_points
  | u64 src_size | f64 src_mtime | n_iblocks x 6 x i32 (min xyz, max xyz)
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np

MAGIC = b"AQPCIDX1"
INDEX_BLOCK = 65_536  # points per index block (24 B of index per block)

DISJOINT, PARTIAL, CONTAINED = 0, 1, 2


def index_path(file: str | Path) -> Path:
    return Path(str(file) + ".aqpc-idx")


def build_index(reader, *, index_block: int = INDEX_BLOCK) -> np.ndarray:
    """(n_iblocks, 6) int32 min/max per index block of `reader`."""
    n = reader.point_count
    n_blocks = (n + index_block - 1) // index_block
    out = np.empty((max(n_blocks, 1), 6), np.int32)
    if n == 0:
        out[:] = 0
        return out[:0]
    for b in range(n_blocks):
        start = b * index_block
        stop = min(start + index_block, n)
        pos = reader.column("position", start, stop)
        out[b, :3] = pos.min(axis=0)
        out[b, 3:] = pos.max(axis=0)
    return out[:n_blocks]


def save_index(file: str | Path, blocks: np.ndarray, *, index_block: int = INDEX_BLOCK,
               n_points: int | None = None) -> Path:
    file = Path(file)
    st = file.stat()
    p = index_path(file)
    with open(p, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<IQQd", index_block,
                            n_points if n_points is not None else 0,
                            st.st_size, st.st_mtime))
        f.write(np.ascontiguousarray(blocks, np.int32).tobytes())
    return p


def load_index(file: str | Path) -> tuple[int, np.ndarray] | None:
    """(index_block_size, (n_iblocks, 6) int32) or None if absent/stale."""
    file = Path(file)
    p = index_path(file)
    if not p.exists():
        return None
    try:
        raw = p.read_bytes()
        if raw[:8] != MAGIC:
            return None
        index_block, _n_points, src_size, src_mtime = struct.unpack_from("<IQQd", raw, 8)
        st = file.stat()
        if st.st_size != src_size or abs(st.st_mtime - src_mtime) > 1e-6:
            return None  # stale
        blocks = np.frombuffer(raw[8 + 28:], dtype=np.int32).reshape(-1, 6)
        return index_block, blocks
    except (OSError, ValueError, struct.error):
        return None


def ensure_index(file: str | Path, reader) -> tuple[int, np.ndarray]:
    cached = load_index(file)
    if cached is not None:
        return cached
    blocks = build_index(reader)
    save_index(file, blocks, n_points=reader.point_count)
    return INDEX_BLOCK, blocks


def classify_block(
    iblocks: np.ndarray, index_block: int, start: int, stop: int,
    lo: np.ndarray, hi: np.ndarray,
) -> int:
    """Classify engine block [start, stop) against int local bounds lo..hi
    using the covering index blocks. Conservative: mixed -> PARTIAL."""
    first = start // index_block
    last = (stop - 1) // index_block
    sub = iblocks[first : last + 1]
    if len(sub) == 0:
        return PARTIAL
    bmin = sub[:, :3].astype(np.int64)
    bmax = sub[:, 3:].astype(np.int64)
    lo = lo.astype(np.int64)
    hi = hi.astype(np.int64)
    disjoint = np.any((bmax < lo) | (bmin > hi), axis=1)
    contained = np.all((bmin >= lo) & (bmax <= hi), axis=1)
    if bool(disjoint.all()):
        return DISJOINT
    if bool(contained.all()):
        return CONTAINED
    return PARTIAL
