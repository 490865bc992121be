"""Render the experiment-grid CSVs (tools-run output in /tmp/expruns) as the
markdown tables committed to docs/SAMPLE_RESULTS.md.

Input rows are the reference CSV shape plus the parity column
(name;mean;median;stddev;count — experiments.py:_stats_row). Output: one
markdown table per (dataset, query-cell) group with index-off and index-on
columns side by side, so the reference-comparable scan number and the
sidecar-index bonus are readable in one row.

Usage: python tools/exptables.py /tmp/expruns/e1_inproc.csv [more.csv ...]
"""

from __future__ import annotations

import sys
from pathlib import Path


def load(paths: list[str]) -> dict[str, tuple[float, float, float, str]]:
    rows: dict[str, tuple[float, float, float, str]] = {}
    for p in paths:
        for line in Path(p).read_text().splitlines():
            if not line.strip():
                continue
            parts = line.split(";")
            name, mean, median, stddev = parts[0], *map(float, parts[1:4])
            count = parts[4] if len(parts) > 4 else ""
            rows[name] = (mean, median, stddev, count)
    return rows


def render(rows: dict[str, tuple[float, float, float, str]]) -> str:
    # group rows as base-cell -> {plain, indexed}
    cells: dict[str, dict[str, tuple]] = {}
    order: list[str] = []
    for name, v in rows.items():
        base = name[: -len("_indexed")] if name.endswith("_indexed") else name
        kind = "indexed" if name.endswith("_indexed") else "plain"
        if base not in cells:
            cells[base] = {}
            order.append(base)
        cells[base][kind] = v

    out = [
        "| cell | median s (no index) | mean | stddev | median s (indexed) | matches |",
        "|---|---|---|---|---|---|",
    ]
    for base in order:
        c = cells[base]
        plain = c.get("plain")
        idx = c.get("indexed")
        count = (plain or idx)[3]
        pm = f"{plain[1]:.2f}" if plain else "—"
        pmean = f"{plain[0]:.2f}" if plain else "—"
        psd = f"{plain[2]:.2f}" if plain else "—"
        im = f"{idx[1]:.2f}" if idx else "—"
        out.append(f"| {base} | {pm} | {pmean} | {psd} | {im} | {count} |")
    return "\n".join(out)


if __name__ == "__main__":
    print(render(load(sys.argv[1:])))
