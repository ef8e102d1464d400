"""The bench must survive a hard-stalled device->host transfer path.

VERDICT r3 weak #1: on the driver box's TPU relay every readback can hang
FOREVER while compute and block_until_ready stay healthy; round 3's bench
died in a setup readback and shipped no number. These tests simulate that
failure mode by monkey-patching the bench's single raw-readback point to
block indefinitely and assert the nominal (block_until_ready-timed)
headline still comes out.
"""

import json
import subprocess
import sys
import threading
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


@pytest.fixture
def stalled_relay(monkeypatch):
    """Make every raw readback block forever, with sub-second deadlines so
    the guard trips fast."""

    def block_forever(x):
        threading.Event().wait()  # daemon thread: leaks harmlessly

    monkeypatch.setattr(bench, "_raw_readback", block_forever)
    monkeypatch.setattr(bench, "READBACK_TIMEOUT", 0.5)
    monkeypatch.setattr(bench, "PROBE_TIMEOUT", 0.5)
    monkeypatch.setitem(bench._readback_state, "ok", None)
    yield
    monkeypatch.setitem(bench._readback_state, "ok", None)


def test_reference_stage_survives_stall(stalled_relay):
    out = bench.run_reference(width=32, height=32, spp=1, bounces=2,
                              frames=1, scene_kind="cornell",
                              backend="brute")
    # nominal throughput is timed with block_until_ready only — it must
    # report; the live-ray counter needs a readback — it must degrade to
    # None, not hang
    assert out["mrays_nominal"] > 0
    assert out["mrays_live"] is None
    assert bench._readback_state["ok"] is False


def test_rmse_stage_skips_on_stall(stalled_relay):
    out = bench.run_rmse(size=16, restir_frames=1, oracle_frames=1,
                         oracle_spp=1, backend="brute")
    assert "error" in out and "stalled" in out["error"]


def test_guard_short_circuits_after_first_stall(stalled_relay):
    import jax.numpy as jnp

    t0 = __import__("time").monotonic()
    assert bench.guarded_readback(jnp.zeros(2)) is None  # trips (0.5 s)
    assert bench.guarded_readback(jnp.zeros(2), default=7) == 7  # instant
    assert __import__("time").monotonic() - t0 < 5.0


def test_smoke_headline_end_to_end_with_stall(tmp_path):
    """Full CLI path: bench --smoke with a blocked readback still prints a
    parseable headline JSON line (the round's hard requirement)."""
    sitedir = tmp_path / "site"
    sitedir.mkdir()
    # sitecustomize runs before bench's main: patch the raw readback point
    # process-wide, exactly like the broken relay behaves
    (sitedir / "usercustomize.py").write_text(
        "import threading, bench\n"
        "bench._raw_readback = lambda x: threading.Event().wait()\n"
        "bench.READBACK_TIMEOUT = 0.5\n"
        "bench.PROBE_TIMEOUT = 0.5\n")
    import os

    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}{sitedir}"
    proc = subprocess.run(
        [sys.executable, "-c",
         "import usercustomize, sys; sys.argv=['bench','--smoke','--cpu'];"
         "import bench; sys.exit(bench.main())"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600)
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON output; stderr: {proc.stderr[-500:]}"
    doc = json.loads(lines[-1])
    assert doc["value"] > 0
    assert doc["detail"]["quick"]["mrays_live"] is None
