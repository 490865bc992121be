"""Native --print-points batch formatter: byte-identity vs Python f-strings.

The C formatter (native/aqpc_native.cpp aqpc_format_points) hand-rolls %.3f
with integer math plus a snprintf fallback for near-tie/huge/non-finite
values; these tests pin byte-for-byte equality with the Python formatting it
replaces (~13x faster on the 1-core dev host). Perf itself is not asserted
(CI-flaky); VERDICT round-2 task 7's micro-benchmark lives in the commit
message.
"""

from __future__ import annotations

import numpy as np
import pytest

from adhoc_queries_pointclouds_tpu import native

needs_native = pytest.mark.skipif(
    not native.available(), reason="native codec unavailable"
)


def _python_ref(p, c, cl, it) -> str:
    return "".join(
        f"Found point: ({x:.3f}, {y:.3f}, {z:.3f}) "
        f"class={k} rgb=({r}, {g}, {b}) intensity={m}\n"
        for (x, y, z), (r, g, b), k, m in zip(
            p.tolist(), c.tolist(), cl.tolist(), it.tolist()
        )
    )


def _attrs(n, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 2**16, (n, 3)).astype(np.uint16),
        rng.integers(0, 256, n).astype(np.uint8),
        rng.integers(0, 2**16, n).astype(np.uint16),
    )


@needs_native
def test_format_points_random_parity():
    rng = np.random.default_rng(0)
    p = rng.random((20_000, 3)) * 2000 - 1000
    c, cl, it = _attrs(len(p))
    assert native.format_points(p, c, cl, it) == _python_ref(p, c, cl, it)


@needs_native
def test_format_points_adversarial_parity():
    """Near-tie .xxx5 values, signed zero, inf/nan, magnitudes around the
    9e12 fast-path cutoff, and subnormals — every snprintf-fallback branch."""
    vals = []
    for k in range(500):
        v = k * 0.0005
        vals += [v, -v, float(np.nextafter(v, np.inf)), float(np.nextafter(v, -np.inf))]
    vals += [
        0.0, -0.0, 1e13, -1e13, 9e12, float(np.nextafter(9e12, np.inf)),
        float("inf"), -float("inf"), float("nan"), 1e300, -1e300,
        5e-324, -5e-324, 2.5e-4, 0.0015, 0.0025, 1234567890123.456,
        float(np.copysign(np.nan, -1.0)),  # sign-bit nan: glibc would print -nan
    ]
    rng = np.random.default_rng(7)
    vals += list(rng.random(3000) * 2e13 - 1e13)
    pv = np.array(vals, np.float64)
    p = pv[: len(pv) // 3 * 3].reshape(-1, 3)
    c, cl, it = _attrs(len(p), seed=1)
    assert native.format_points(p, c, cl, it) == _python_ref(p, c, cl, it)


@needs_native
def test_format_points_empty_and_single():
    p = np.zeros((0, 3))
    c, cl, it = _attrs(0)
    assert native.format_points(p, c, cl, it) == ""
    p1 = np.array([[1.0, 2.0, 3.0]])
    c1, cl1, it1 = _attrs(1)
    assert native.format_points(p1, c1, cl1, it1) == _python_ref(p1, c1, cl1, it1)
