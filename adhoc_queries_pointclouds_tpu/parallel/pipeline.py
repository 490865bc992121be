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


def pad_to(arr: np.ndarray, n: int) -> np.ndarray:
    if arr.shape[0] == n:
        return np.ascontiguousarray(arr)
    out = np.zeros((n,) + arr.shape[1:], dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


class BlockFeeder:
    """Decode-ahead iterator over BlockTasks.

    tasks: sequence of (file_idx, block_idx, start, stop) tuples.
    load_fn: (file_idx, start, stop) -> dict of unpadded predicate columns.
    """

    def __init__(
        self,
        tasks: Sequence[tuple[int, int, int, int]],
        load_fn: Callable[[int, int, int], dict[str, np.ndarray]],
        block_size: int,
        *,
        file_bounds: dict[int, tuple[np.ndarray, np.ndarray]] | None = None,
        workers: int = 4,
        prefetch: int = 8,
        pad: bool = True,
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
        # summed wall time inside load_fn across worker threads: the host
        # decode cost of the scan (>= wall clock when workers overlap; on a
        # single-core host it is effectively decode CPU time)
        self.decode_seconds = 0.0
        self._dt_lock = threading.Lock()

    def _make(self, t: tuple[int, int, int, int]) -> BlockTask:
        file_idx, block_idx, start, stop = t
        t0 = time.perf_counter()
        cols = self._load(file_idx, start, stop)
        if self._pad:
            cols = {k: pad_to(v, self._block_size) for k, v in cols.items()}
        with self._dt_lock:
            self.decode_seconds += time.perf_counter() - t0
        lo, hi = self._file_bounds.get(file_idx, (None, None))
        return BlockTask(
            file_idx=file_idx,
            block_idx=block_idx,
            start=start,
            n_valid=stop - start,
            columns=cols,
            lo=lo,
            hi=hi,
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
