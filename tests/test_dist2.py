"""Real 2-process jax.distributed parity (tools/dist2.py).

Unlike test_distributed.py (single-process degeneration), this spawns two
worker processes joined via jax.distributed.initialize on the CPU backend
(gloo collectives) — an 8-device global mesh spanning a real process
boundary — and asserts exact parity with the single-process engine for
count/collect/density. This is the harness that caught the gloo s64
all_gather payload mangling (distributed.py::_allgather_keys).

Skips where 2-process CPU distributed init is unavailable.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

_PROBE = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"127.0.0.1:{sys.argv[2]}", num_processes=2,
                           process_id=int(sys.argv[1]))
assert jax.process_count() == 2
"""


def _distributed_cpu_available() -> bool:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _PROBE, str(i), str(port)],
            env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        for i in range(2)
    ]
    ok = True
    for p in procs:
        try:
            ok &= p.wait(timeout=120) == 0
        except subprocess.TimeoutExpired:
            p.kill()
            ok = False
    return ok


@pytest.mark.slow
def test_two_process_distributed_parity(tmp_path):
    if not _distributed_cpu_available():
        pytest.skip("2-process jax.distributed CPU init unavailable here")
    report = tmp_path / "report.json"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    # force multi-slab all-gathers (4 KB budget -> tens of rows per slab)
    # so the chunked winner/key gather path crosses the real 2-process gloo
    # boundary, not just the single-slab fast case
    env["AQPC_ALLGATHER_SLAB_KB"] = "4"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "dist2.py"),
         "--files", "3", "--points", "10000", "--json", str(report)],
        env=env, cwd=str(REPO), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"dist2 failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    rep = json.loads(report.read_text())
    assert rep["workers"][0]["process_count"] == 2
    # both workers agreed with the single-process engine on every query kind
    for key, val in rep["expected"].items():
        assert rep["workers"][0][key] == rep["workers"][1][key] == val > 0
    assert rep["written_points"] == rep["expected"]["bbox_count"]
