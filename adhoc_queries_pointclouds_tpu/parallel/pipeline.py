"""Host->device streaming pipeline: decode-ahead block feeder.

The reference interleaves decode and filter sequentially per chunk
(e.g. query/src/search/lazer.rs:59-75). Here host decode (mmap column
slicing for LAS/LAST, LZ4 frame decode for LAZER) runs in a thread pool
*ahead* of the device, bounded by a prefetch window, while JAX's async
dispatch overlaps H2D transfer and the device scan with the next block's
decode — the 2-stage pipeline the north star asks for. ctypes LZ4 calls
drop the GIL, so decode threads scale across host cores.

Each task yields one fixed-shape block (padded to the engine block size)
carrying everything the device step needs: predicate columns, per-file int32
bounds, and the valid count.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Sequence

import numpy as np


@dataclasses.dataclass
class BlockTask:
    """One fixed-shape unit of device work."""

    file_idx: int
    block_idx: int
    start: int  # first point ordinal in file
    n_valid: int  # real points (rest of the block is padding)
    columns: dict[str, np.ndarray]  # padded predicate columns
    lo: np.ndarray | None = None  # per-file int32 local query bounds
    hi: np.ndarray | None = None
    # multi-range (index-packed) tasks: the block's rows are the
    # concatenation of these disjoint ascending [s, e) file ranges (sum =
    # n_valid). None for ordinary contiguous blocks. Map local row ->
    # file ordinal with task_gidx().
    ranges: tuple[tuple[int, int], ...] | None = None
    # gather-packed (sparse) tasks: explicit per-row file ordinals — the
    # block's rows were host-gathered from scattered hit positions (the
    # density sparse path). Takes precedence over ranges/start.
    gidx_map: np.ndarray | None = None


def task_gidx(task: BlockTask, local_idx: np.ndarray) -> np.ndarray:
    """Local block row indices -> file point ordinals (int64), honoring
    gather-packing and multi-range packing."""
    local_idx = np.asarray(local_idx, np.int64)
    if task.gidx_map is not None:
        return task.gidx_map[local_idx]
    if task.ranges is None:
        return local_idx + task.start
    lens = np.asarray([e - s for s, e in task.ranges], np.int64)
    starts = np.asarray([s for s, _ in task.ranges], np.int64)
    cum = np.concatenate([[0], np.cumsum(lens)])
    k = np.searchsorted(cum, local_idx, side="right") - 1
    return starts[k] + (local_idx - cum[k])


def pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] == n:
        return np.ascontiguousarray(arr)
    out = np.zeros((n,) + arr.shape[1:], dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


class BlockFeeder:
    """Decode-ahead iterator over BlockTasks.

    tasks: sequence of (file_idx, block_idx, start, stop) tuples, or
    (file_idx, block_idx, ranges) where ranges is a tuple of disjoint
    ascending (s, e) ranges totalling <= block_size — a multi-range task
    packs several sidecar-index-survivor ranges into ONE full device block
    (a short range would otherwise occupy an entire padded slot + its H2D
    bytes, erasing the prune's win).
    load_fn: (file_idx, start, stop) -> dict of unpadded predicate columns;
    multi-range tasks call it per range and concatenate per key, so it must
    return raw (concatenatable) columns. transform_fn, when given, is then
    applied once per assembled block (file_idx, cols) -> cols — the place
    for whole-block encodings like packed transport.
    """

    def __init__(
        self,
        tasks: Sequence[tuple],
        load_fn: Callable[[int, int, int], dict[str, np.ndarray]],
        block_size: int,
        *,
        file_bounds: dict[int, tuple[np.ndarray, np.ndarray]] | None = None,
        workers: int = 4,
        prefetch: int = 8,
        pad: bool = True,
        transform_fn: Callable[[int, dict], dict] | None = None,
    ):
        self._tasks = list(tasks)
        self._load = load_fn
        self._block_size = block_size
        self._file_bounds = file_bounds or {}
        self._workers = max(1, workers)
        self._prefetch = max(1, prefetch)
        # pad=False yields raw unpadded columns: callers that assemble D*K
        # -block step operands copy each column exactly once (into its step
        # -buffer row) instead of pad-copy + stack-copy
        self._pad = pad
        self._transform = transform_fn
        # summed wall time inside load_fn across worker threads: the host
        # decode cost of the scan (>= wall clock when workers overlap; on a
        # single-core host it is effectively decode CPU time)
        self.decode_seconds = 0.0
        self._dt_lock = threading.Lock()

    def _make(self, t: tuple) -> BlockTask:
        t0 = time.perf_counter()
        if len(t) == 3:
            file_idx, block_idx, ranges = t
            parts = [self._load(file_idx, s, e) for s, e in ranges]
            cols = {
                k: (parts[0][k] if len(parts) == 1
                    else np.concatenate([p[k] for p in parts]))
                for k in parts[0]
            }
            start = ranges[0][0]
            n_valid = sum(e - s for s, e in ranges)
            ranges = tuple(ranges)
        else:
            file_idx, block_idx, start, stop = t
            cols = self._load(file_idx, start, stop)
            n_valid = stop - start
            ranges = None
        if self._transform is not None:
            cols = self._transform(file_idx, cols)
        if self._pad:
            cols = {k: pad_to(v, self._block_size) for k, v in cols.items()}
        with self._dt_lock:
            self.decode_seconds += time.perf_counter() - t0
        lo, hi = self._file_bounds.get(file_idx, (None, None))
        return BlockTask(
            file_idx=file_idx,
            block_idx=block_idx,
            start=start,
            n_valid=n_valid,
            columns=cols,
            lo=lo,
            hi=hi,
            ranges=ranges,
        )

    def __iter__(self) -> Iterator[BlockTask]:
        if not self._tasks:
            return
        with ThreadPoolExecutor(max_workers=self._workers) as pool:
            pending = []
            it = iter(self._tasks)
            try:
                for _ in range(self._prefetch):
                    pending.append(pool.submit(self._make, next(it)))
            except StopIteration:
                pass
            i = 0
            while i < len(pending):
                task = pending[i].result()
                pending[i] = None  # free memory as we go
                i += 1
                try:
                    pending.append(pool.submit(self._make, next(it)))
                except StopIteration:
                    pass
                yield task


def make_block_tasks(
    point_counts: Sequence[int], block_size: int
) -> list[tuple[int, int, int, int]]:
    """Split files into engine blocks: (file_idx, block_idx, start, stop)."""
    tasks = []
    for file_idx, n in enumerate(point_counts):
        nblocks = (n + block_size - 1) // block_size
        for b in range(nblocks):
            start = b * block_size
            stop = min(start + block_size, n)
            tasks.append((file_idx, b, start, stop))
    return tasks
