"""Paper experiment harness — the reference `run_query_experiments` binary
(query/src/bin/run_query_experiments.rs) rebuilt for this engine.

Protocol parity:
  - experiments 1-3: AABB S/L/XL x {full, max-density} on navvis3/doc/ca13,
    each over the four formats las/laz/last/lazer
    (run_query_experiments.rs:106-309)
  - experiments 4-5: class {6 building, 19 noclass} on doc/ca13 x 4 formats
    (run_query_experiments.rs:311-380)
  - every cell: reset the OS page cache, run the query CLI as a fresh
    subprocess, repeat `runs` times (default 5), report
    `name;mean;median;stddev` in seconds (rs:287-304, 412-413)
  - dataset layout: <root>/<dataset>/<fmt>/*.{fmt} (reference README.md:31-47)

The hard-coded query boxes and density values below are the published
experiment constants from run_query_experiments.rs:109-144,164,203,240.

Since the paper datasets are tens of GB of external data, `--synthesize N`
generates a synthetic stand-in dataset with the expected directory layout so
the whole protocol is runnable end to end anywhere.
"""

from __future__ import annotations

import argparse
import math
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

from .utils.aabb import AABB

FORMATS = ("las", "laz", "last", "lazer")

# published experiment constants (run_query_experiments.rs:109-144)
AABBS = {
    "navvis3": {
        "s": AABB((0.0, 0.0, 0.0), (2.0, 2.0, 2.0)),
        "l": AABB((0.0, 0.0, 0.0), (20.0, 20.0, 5.0)),
        "xl": AABB((-23.108, -21.261, -10.029), (28.588, 27.123, 5.959)),
    },
    "doc": {
        "s": AABB((390000.0, 130000.0, 0.0), (390500.0, 140000.0, 200.0)),
        "l": AABB((390000.0, 130000.0, 0.0), (400000.0, 140000.0, 200.0)),
        "xl": AABB((389400.0, 124200.0, -94.88), (406200.0, 148200.0, 760.03)),
    },
    "ca13": {
        "s": AABB((665000.0, 3910000.0, 0.0), (705000.0, 3950000.0, 480.0)),
        "l": AABB((665000.0, 3910000.0, 0.0), (710000.0, 3950000.0, 480.0)),
        "xl": AABB((643431.76, 3883547.565, -46194.145), (736910.93, 3977026.735, 47285.025)),
    },
}

DENSITIES = {"navvis3": 0.1, "doc": 25.0, "ca13": 100.0}

CLASS_EXPERIMENTS = [("building", 6), ("noclass", 19)]

# Experiment 6 (beyond-reference): GPS-time-range queries over a clustered
# flight-line dataset — the reference's dead time stubs (search/las.rs:297-367)
# made real. The synth flight line advances at TIME_RATE pts/s from t=0
# (make_cloud_clustered time_rate/time_start; write_dataset chains files into
# one global line), so query windows are defined as fractions of the dataset's
# total span — resolved to absolute seconds from the header-summed point count.
TIME_RATE = 200_000.0
TIME_EXPERIMENTS = [
    ("ts", 0.450, 0.460),   # 1% of the flight line
    ("tl", 0.300, 0.500),   # 20%
    ("txl", 0.000, 1.000),  # the whole line
]

EXPERIMENT_DATASETS = {
    1: "navvis3", 2: "doc", 3: "ca13", 4: "doc", 5: "ca13", 6: "navvis3t",
}


def reset_page_cache(dataset_path=None) -> None:
    """Cold-cache protocol (run_query_experiments.rs:8-27; Linux analog of
    the reference's macOS sync+purge). With a dataset path, evicts exactly
    the dataset's pages via posix_fadvise(DONTNEED) — what the measurement
    needs cold — rather than `drop_caches=3`, which also evicts the Python
    toolchain (~700 MB of jaxlib) and turns every subprocess start into
    minutes of cold library reads that measure the disk, not the engine.
    Whole-cache drop (root) remains the fallback when no path is given."""
    subprocess.run(["sync"], check=True)
    if dataset_path is None:
        try:
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("3\n")
        except PermissionError:
            print(
                "warning: cannot drop page caches (need root); runs are warm-cache",
                file=sys.stderr,
            )
        return
    import os
    from pathlib import Path

    for f in Path(dataset_path).glob("**/*"):
        if not f.is_file():
            continue
        try:
            fd = os.open(f, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)
        except OSError:
            pass


def _query_args(dataset_path: Path, extra: list[str]) -> list[str]:
    """Shared CLI argument list for both measurement modes."""
    return ["-i", str(dataset_path), "--optimized", "--parallel"] + extra


def _query_cmd(dataset_path: Path, extra: list[str]) -> list[str]:
    return [
        sys.executable,
        "-m",
        "adhoc_queries_pointclouds_tpu.cli",
    ] + _query_args(dataset_path, extra)


_COUNT_RE = None


def _parse_count(text: str) -> int | None:
    """Match count from the CLI's 'Found N matching points' report."""
    import re

    global _COUNT_RE
    if _COUNT_RE is None:
        _COUNT_RE = re.compile(r"Found (\d+) matching points")
    m = _COUNT_RE.search(text)
    return int(m.group(1)) if m else None


def execute_query(
    dataset_path: Path, extra: list[str], cold: bool = True, in_process: bool = False
) -> tuple[float, int | None, bool]:
    """One timed query run -> (seconds, match count or None, timed_out).

    Default = fresh subprocess + cold page cache, the reference protocol
    (rs:29-75: it shells out to ./target/release/query after sync+purge).
    in_process = call the engine directly with warm jit caches — measures
    steady-state scan cost without Python/JAX startup (~3.4 s/process) or
    recompiles; closer to what a resident service would see.
    """
    if cold:
        reset_page_cache(dataset_path)
    if in_process:
        import contextlib
        import io

        from .cli import main as cli_main

        buf = io.StringIO()
        t0 = time.perf_counter()
        # the engine's human-facing prints are captured so stdout stays a
        # clean CSV (and the count can be parsed for cross-format parity)
        with contextlib.redirect_stdout(buf):
            rc = cli_main(_query_args(dataset_path, extra))
        elapsed = time.perf_counter() - t0
        sys.stderr.write(buf.getvalue())
        if rc != 0:
            raise RuntimeError(f"query failed on {dataset_path} (exit {rc})")
        return elapsed, _parse_count(buf.getvalue()), False
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            _query_cmd(dataset_path, extra), capture_output=True, text=True,
            timeout=float(os.environ.get("AQPC_QUERY_TIMEOUT", "0")) or None,
        )
    except subprocess.TimeoutExpired as e:
        # Tunnel-stall insurance: a wedged TPU client must not abort a
        # multi-hour grid. Record the run at the cap (it inflates the mean;
        # the protocol's reported statistic is the median) and carry on.
        print(
            f"warning: query timed out on {dataset_path} after "
            f"{e.timeout:.0f}s (AQPC_QUERY_TIMEOUT); recording at the cap",
            file=sys.stderr,
        )
        return float(e.timeout), None, True
    elapsed = time.perf_counter() - t0
    if proc.returncode != 0:
        print(proc.stderr, file=sys.stderr)
        raise RuntimeError(f"query failed on {dataset_path} (exit {proc.returncode})")
    return elapsed, _parse_count(proc.stdout), False


def _stats_row(
    name: str, runtimes: list[float], count: int | None, ncapped: int = 0
) -> str:
    """Reference CSV row (name;mean;median;stddev, rs:290-304) plus three
    audit columns: match count (cross-format parity auditable from the
    table), the number of runs behind the statistics, and how many of those
    were timeout-capped (recorded AT the cap) — so a capped cell is
    distinguishable from a real measurement in the artifact itself."""
    mean = statistics.fmean(runtimes)
    median = statistics.median(runtimes)
    stddev = statistics.stdev(runtimes) if len(runtimes) > 1 else 0.0
    return (
        f"{name};{mean};{median};{stddev};{'' if count is None else count}"
        f";{len(runtimes)};{ncapped}"
    )


def _index_variants(index_mode: str) -> tuple[bool, ...]:
    """index off = reference-comparable scans (the reference has no index);
    index on = this engine's sidecar-index bonus column."""
    return {"off": (False,), "on": (True,), "both": (False, True)}[index_mode]


def _run_cell(
    label: str, path: Path, extra: list[str], num_runs: int, cold: bool,
    in_process: bool, use_index: bool, counts_by_cell: dict | None = None,
    cell_key: str | None = None,
) -> None:
    label = label + ("_indexed" if use_index else "")
    print(f"Experiment {label}...", file=sys.stderr)
    if not use_index:
        extra = extra + ["--no-index"]
    results = [
        execute_query(path, extra, cold, in_process) for _ in range(num_runs)
    ]
    counts = {c for _, c, _ in results if c is not None}
    if len(counts) > 1:
        raise AssertionError(f"{label}: run-to-run counts diverge: {counts}")
    count = counts.pop() if counts else None
    ncapped = sum(1 for _, _, capped in results if capped)
    if counts_by_cell is not None and cell_key is not None and count is not None:
        # cross-format parity: every format of a (query, index) cell must
        # report the identical match count (the paper's own parity check)
        prev = counts_by_cell.setdefault(cell_key, count)
        if prev != count:
            raise AssertionError(
                f"{label}: count {count} != {prev} from another format of "
                f"cell {cell_key}"
            )
    print(_stats_row(label, [t for t, _, _ in results], count, ncapped), flush=True)


def run_aabb_experiments(
    in_path: Path, num_runs: int, dataset: str, *, cold: bool = True,
    formats: tuple[str, ...] = FORMATS, sizes: tuple[str, ...] = ("s", "l", "xl"),
    skip_density: bool = False, in_process: bool = False,
    index_mode: str = "off",
) -> None:
    boxes = AABBS[dataset]
    density = DENSITIES[dataset]
    counts_by_cell: dict = {}
    for bounds_name in sizes:
        b = boxes[bounds_name]
        bounds_str = ";".join(
            str(v) for v in (*b.min, *b.max)
        )
        for use_density in ((False,) if skip_density else (False, True)):
            for use_index in _index_variants(index_mode):
                for ext in formats:
                    path = in_path / dataset / ext
                    label = (
                        f"{dataset}_{bounds_name}_"
                        f"{'lod' if use_density else 'full'}_{ext}"
                    )
                    # --bounds=STR form: argparse rejects a separate value
                    # token starting with '-' (negative mins; the
                    # reference's clap uses allow_hyphen_values, main.rs:209)
                    extra = [f"--bounds={bounds_str}"]
                    if use_density:
                        extra += ["--density", str(density),
                                  "--density-scope", "file"]
                    _run_cell(
                        label, path, extra, num_runs, cold, in_process,
                        use_index, counts_by_cell,
                        f"{bounds_name}_{use_density}_{use_index}",
                    )


def run_class_experiments(
    in_path: Path, num_runs: int, dataset: str, *, cold: bool = True,
    formats: tuple[str, ...] = FORMATS, in_process: bool = False,
    index_mode: str = "off",
) -> None:
    counts_by_cell: dict = {}
    for class_name, class_value in CLASS_EXPERIMENTS:
        for use_index in _index_variants(index_mode):
            for ext in formats:
                path = in_path / dataset / ext
                label = f"{dataset}_{class_name}_{ext}"
                extra = ["--class", str(class_value)]
                _run_cell(
                    label, path, extra, num_runs, cold, in_process,
                    use_index, counts_by_cell, f"{class_name}_{use_index}",
                )


def run_time_experiments(
    in_path: Path, num_runs: int, dataset: str, *, cold: bool = True,
    formats: tuple[str, ...] = FORMATS, in_process: bool = False,
    index_mode: str = "off",
) -> None:
    """Experiment 6: GPS-time windows (see TIME_EXPERIMENTS). The absolute
    window is fraction-of-span x (total points / TIME_RATE), with the total
    read header-only from the first format's files (count_points.rs:66-79
    semantics — no point data touched to define the query)."""
    from .formats.las import parse_las_header_file

    total = sum(
        parse_las_header_file(f).point_count
        for f in sorted((in_path / dataset / formats[0]).iterdir())
        if f.is_file() and not f.name.endswith(".aqpc-idx")
    )
    span = total / TIME_RATE
    counts_by_cell: dict = {}
    for range_name, f0, f1 in TIME_EXPERIMENTS:
        t0, t1 = f0 * span, f1 * span
        for use_index in _index_variants(index_mode):
            for ext in formats:
                path = in_path / dataset / ext
                label = f"{dataset}_{range_name}_{ext}"
                extra = [f"--time-range={t0};{t1}"]
                _run_cell(
                    label, path, extra, num_runs, cold, in_process,
                    use_index, counts_by_cell, f"{range_name}_{use_index}",
                )


def synthesize_dataset(
    root: Path, dataset: str, n_files: int, points_per_file: int, seed: int = 0,
    clustered: bool = False,
) -> None:
    """Generate a synthetic stand-in with the experiment layout and world
    extents matching the published query boxes (so S/L/XL have real bite).
    clustered=True uses the Morton-ordered spatially-coherent generator —
    the shape that makes index/full-scan comparisons meaningful (uniform
    data gives every block the whole file's extent). The navvis3t (e6)
    dataset is navvis3's world in point format 3, so records carry the
    gps_time flight line the time-range cells query."""
    from .formats import synth

    world = "navvis3" if dataset == "navvis3t" else dataset
    point_format = 3 if dataset == "navvis3t" else 2
    xl = AABBS[world]["xl"]
    extent = tuple((hi - lo) / n_files if i == 0 else (hi - lo)
                   for i, (lo, hi) in enumerate(zip(xl.min, xl.max)))
    scale_mag = max(e / n_files for e in extent) / (2**30)
    scale = max(10.0 ** math.ceil(math.log10(max(scale_mag, 1e-12))), 0.001)
    synth.write_dataset(
        root / dataset,
        n_files=n_files,
        points_per_file=points_per_file,
        formats=FORMATS,
        seed=seed,
        point_format=point_format,
        offset=xl.min,
        extent=extent,
        scale=(scale, scale, scale),
        classes=(1, 2, 3, 4, 5, 6),
        clustered=clustered,
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="aqpc-experiments",
        description="Run the point-cloud query experiments (paper protocol)",
    )
    parser.add_argument("-i", "--input", required=True, help="Root directory of datasets")
    parser.add_argument(
        "-e", "--experiment", type=int, required=True,
        help="1 (navvis AABB), 2 (doc AABB), 3 (ca13 AABB), 4 (doc class), "
             "5 (ca13 class), 6 (navvis3t GPS-time — beyond-reference)",
    )
    parser.add_argument("--runs", type=int, default=5)
    parser.add_argument(
        "--warm", action="store_true",
        help="Skip the page-cache reset between runs (measure warm-cache)",
    )
    parser.add_argument(
        "--synthesize", type=int, metavar="POINTS_PER_FILE", default=0,
        help="Generate a synthetic stand-in dataset of this size first",
    )
    parser.add_argument("--synthesize-files", type=int, default=4)
    parser.add_argument(
        "--clustered", action="store_true",
        help="Synthesize spatially-coherent (Morton-ordered clustered) data "
             "instead of uniform random",
    )
    parser.add_argument(
        "--index-mode", choices=("off", "on", "both"), default="off",
        help="off = reference-comparable scans (no sidecar index; default), "
             "on = sidecar-index runs, both = emit both tables "
             "(_indexed label suffix)",
    )
    parser.add_argument(
        "--formats", default=",".join(FORMATS),
        help="Comma-separated subset of formats to run (default: all four)",
    )
    parser.add_argument(
        "--sizes", default="s,l,xl",
        help="Comma-separated subset of bbox sizes for experiments 1-3",
    )
    parser.add_argument("--skip-density", action="store_true")
    parser.add_argument(
        "--in-process", action="store_true",
        help="Run queries in-process with warm jit caches (steady-state "
             "measurement) instead of the reference's cold-subprocess protocol",
    )
    args = parser.parse_args(argv)

    if args.experiment not in EXPERIMENT_DATASETS:
        print("Invalid experiment ID. Must be between 1 and 6.", file=sys.stderr)
        return 1
    dataset = EXPERIMENT_DATASETS[args.experiment]
    root = Path(args.input)

    if args.synthesize:
        print(f"Synthesizing {dataset} stand-in dataset...", file=sys.stderr)
        synthesize_dataset(root, dataset, args.synthesize_files, args.synthesize,
                           clustered=args.clustered)

    print(
        "Running experiments... Output is: "
        "experiment_name;mean;median;stddev;match_count;runs;timeout_capped "
        "with runtimes in seconds (capped runs recorded AT the cap)",
        file=sys.stderr,
    )
    formats = tuple(f for f in args.formats.split(",") if f)
    if args.experiment <= 3:
        run_aabb_experiments(
            root, args.runs, dataset, cold=not args.warm, formats=formats,
            sizes=tuple(s for s in args.sizes.split(",") if s),
            skip_density=args.skip_density, in_process=args.in_process,
            index_mode=args.index_mode,
        )
    elif args.experiment <= 5:
        run_class_experiments(
            root, args.runs, dataset, cold=not args.warm, formats=formats,
            in_process=args.in_process, index_mode=args.index_mode,
        )
    else:
        run_time_experiments(
            root, args.runs, dataset, cold=not args.warm, formats=formats,
            in_process=args.in_process, index_mode=args.index_mode,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
