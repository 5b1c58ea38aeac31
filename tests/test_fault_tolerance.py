"""Fault-tolerance parity (reference heartbeat-death + task re-execution,
ops #13/#14) — run in a subprocess so the retry-enabled master
(`local[2,2]`) doesn't collide with the shared test session."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_task_reexecution_preserves_output():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "fault_injection_demo.py")],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "fault-injection parity OK" in proc.stdout
