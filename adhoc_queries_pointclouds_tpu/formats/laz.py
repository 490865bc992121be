"""LAZ (LASzip-compressed LAS) reader.

The reference gets LAZ decode for free from laz-rs inside pasture
(query/src/search/laz.rs:27-31 — no byte-level optimization is possible on
LAZ; both its Regular and Optimized paths fully decompress). Here decode is
implemented natively (native/laszip.cpp): the LASzip v1/v2 arithmetic-coded
record compressor for point formats 0-3, which covers the paper's datasets.

This module will raise a clear error until the native decoder lands.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .las import parse_las_header


class LazFile:
    extension = "laz"

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._mm = np.memmap(self.path, dtype=np.uint8, mode="r")
        self.header = parse_las_header(self._mm[:512].tobytes())
        raise NotImplementedError(
            "LAZ (LASzip) decode is not implemented yet; convert to LAS/LAST/LAZER "
            "with `aqpc convert` or use those formats directly"
        )
