"""Synthetic point-cloud fixture generation.

The reference ships no test fixtures at all (its integration tests hard-code
absolute paths on the author's machine, readers/src/last_reader.rs:406-407).
This module generates deterministic datasets in every supported format so the
whole test suite and benchmark harness are self-contained.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from .las import LasHeader, RECORD_LENGTH, has_color, record_dtype, write_las_header
from .last import write_last


@dataclasses.dataclass
class SynthCloud:
    """In-memory SoA point cloud plus its LAS header parameters."""

    header: LasHeader
    position_raw: np.ndarray  # (N, 3) int32 local coords
    intensity: np.ndarray  # (N,) uint16
    classification: np.ndarray  # (N,) uint8
    color: np.ndarray  # (N, 3) uint16 (zeros if format has no color)
    gps_time: np.ndarray | None = None
    waveform: np.ndarray | None = None  # (N, 29) uint8 wave packets

    @property
    def positions_world(self) -> np.ndarray:
        return self.position_raw.astype(np.float64) * np.asarray(
            self.header.scale
        ) + np.asarray(self.header.offset)

    def columns(self) -> dict[str, np.ndarray]:
        cols = {
            "position": self.position_raw,
            "intensity": self.intensity,
            "classification": self.classification,
        }
        if has_color(self.header.point_format):
            cols["color"] = self.color
        if self.gps_time is not None:
            cols["gps_time"] = self.gps_time
        if self.waveform is not None:
            cols["waveform"] = self.waveform
        return cols


def make_cloud(
    n: int,
    *,
    seed: int = 0,
    point_format: int = 2,
    scale: tuple[float, float, float] = (0.001, 0.001, 0.001),
    offset: tuple[float, float, float] = (100000.0, 200000.0, 0.0),
    extent: tuple[float, float, float] = (1000.0, 1000.0, 100.0),
    classes: tuple[int, ...] = (1, 2, 3, 4, 5, 6),
) -> SynthCloud:
    """Deterministic uniform cloud over [offset, offset+extent] in world space."""
    rng = np.random.default_rng(seed)
    max_raw = [int(e / s) for e, s in zip(extent, scale)]
    raw = np.stack(
        [rng.integers(0, m + 1, size=n, dtype=np.int64).astype(np.int32) for m in max_raw],
        axis=1,
    )
    intensity = rng.integers(0, 2**16, size=n, dtype=np.int64).astype(np.uint16)
    classification = rng.choice(np.asarray(classes, dtype=np.uint8), size=n)
    color = rng.integers(0, 2**16, size=(n, 3), dtype=np.int64).astype(np.uint16)
    world = raw.astype(np.float64) * np.asarray(scale) + np.asarray(offset)
    header = LasHeader(
        version=(1, 2) if point_format < 6 else (1, 4),
        point_format=point_format,
        point_record_length=RECORD_LENGTH[point_format],
        point_count=n,
        offset_to_point_data=227 if point_format < 6 else 375,
        scale=scale,
        offset=offset,
        min=tuple(world.min(axis=0)) if n else offset,
        max=tuple(world.max(axis=0)) if n else offset,
    )
    gps = None
    from .las import has_gps_time, has_waveform

    if has_gps_time(point_format):
        gps = rng.uniform(0.0, 1e6, size=n)
    wave = None
    if has_waveform(point_format):
        wave = rng.integers(0, 256, size=(n, 29), dtype=np.int64).astype(np.uint8)
    return SynthCloud(header, raw, intensity, classification, color,
                      gps_time=gps, waveform=wave)


def write_cloud_las(cloud: SynthCloud, path: str | Path) -> None:
    h = cloud.header
    recs = np.zeros(h.point_count, dtype=record_dtype(h.point_format, h.point_record_length))
    recs["x"] = cloud.position_raw[:, 0]
    recs["y"] = cloud.position_raw[:, 1]
    recs["z"] = cloud.position_raw[:, 2]
    recs["intensity"] = cloud.intensity
    recs["classification"] = cloud.classification
    if has_color(h.point_format):
        recs["red"] = cloud.color[:, 0]
        recs["green"] = cloud.color[:, 1]
        recs["blue"] = cloud.color[:, 2]
    if cloud.gps_time is not None:
        recs["gps_time"] = cloud.gps_time
    if cloud.waveform is not None:
        recs["waveform"] = cloud.waveform
    with open(path, "wb") as f:
        hdr = write_las_header(h)
        pad = h.offset_to_point_data - len(hdr)
        f.write(hdr)
        if pad > 0:
            f.write(b"\x00" * pad)
        f.write(recs.tobytes())


def write_cloud_last(cloud: SynthCloud, path: str | Path) -> None:
    write_last(path, cloud.header, cloud.columns())


def write_cloud_lazer(cloud: SynthCloud, path: str | Path, block_size: int = 50_000) -> None:
    from .lazer import write_lazer

    write_lazer(path, cloud.header, cloud.columns(), block_size=block_size)


def write_cloud_laz(cloud: SynthCloud, path: str | Path, chunk_size: int = 50_000) -> None:
    from .laz import write_laz

    write_laz(path, cloud.header, cloud.columns(), chunk_size=chunk_size)


def write_dataset(
    root: str | Path,
    *,
    n_files: int = 4,
    points_per_file: int = 100_000,
    formats: tuple[str, ...] = ("las", "last", "lazer"),
    seed: int = 0,
    point_format: int = 2,
    **cloud_kwargs,
) -> dict[str, list[Path]]:
    """Generate a multi-file dataset laid out like the paper's experiment data:
    root/<fmt>/file_<i>.<fmt> (reference README.md:31-47). Each file covers a
    different sub-slab of the world extent so header prefilters have bite.
    """
    root = Path(root)
    out: dict[str, list[Path]] = {f: [] for f in formats}
    base_offset = cloud_kwargs.pop("offset", (100000.0, 200000.0, 0.0))
    extent = cloud_kwargs.pop("extent", (1000.0, 1000.0, 100.0))
    for i in range(n_files):
        file_offset = (
            base_offset[0] + i * extent[0],
            base_offset[1],
            base_offset[2],
        )
        cloud = make_cloud(
            points_per_file,
            seed=seed + i,
            point_format=point_format,
            offset=file_offset,
            extent=extent,
            **cloud_kwargs,
        )
        for fmt in formats:
            d = root / fmt
            d.mkdir(parents=True, exist_ok=True)
            p = d / f"file_{i}.{fmt}"
            if fmt == "las":
                write_cloud_las(cloud, p)
            elif fmt == "last":
                write_cloud_last(cloud, p)
            elif fmt == "lazer":
                write_cloud_lazer(cloud, p)
            elif fmt == "laz":
                write_cloud_laz(cloud, p)
            else:
                raise ValueError(f"unsupported synth format {fmt}")
            out[fmt].append(p)
    return out


def formats_available(*formats: str) -> tuple[str, ...]:
    """Drop 'laz' when the native codec is unavailable (AQPC_DISABLE_NATIVE
    or a failed g++ build): the pure-python fallback covers LZ4/LAZER but
    not LASzip. Fixture generators degrade rather than error."""
    from .. import native

    if native.available():
        return tuple(formats)
    return tuple(f for f in formats if f != "laz")
