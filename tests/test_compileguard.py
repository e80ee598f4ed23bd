"""Compile-deadline watchdog (utils/compileguard.py).

The axon remote compile is erratic (identical graphs: 68 s vs >31 min,
docs/STATUS_r3.md item 3) and a hung compile blocks the main thread inside a
C++ wait where no Python-level interruption can fire — the guard must
hard-exit from a watchdog thread.  These tests pin that contract.
"""

import os
import subprocess
import sys

from pinn_elastodynamics_tpu.utils import compileguard

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fast_block_unaffected():
    with compileguard.deadline(5.0, "fast block"):
        x = sum(range(1000))
    assert x == 499500


def test_zero_deadline_disabled():
    with compileguard.deadline(0.0, "disabled"):
        pass


def test_watchdog_hard_exits_hung_process():
    """A block that outlives the deadline must die with the sentinel rc —
    even though it never returns to Python bytecode dispatch (time.sleep
    stands in for the blocking remote-compile C call)."""
    code = (
        "import time\n"
        "from pinn_elastodynamics_tpu.utils.compileguard import deadline\n"
        "with deadline(0.3, 'hung compile'):\n"
        "    time.sleep(30)\n"
    )
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=30, cwd=REPO,
    )
    assert p.returncode == compileguard.EXIT_COMPILE_TIMEOUT
    assert "COMPILE_TIMEOUT" in p.stderr


def test_env_configured_guard(monkeypatch):
    monkeypatch.delenv(compileguard.ENV_VAR, raising=False)
    assert compileguard.configured_deadline() == 0.0
    monkeypatch.setenv(compileguard.ENV_VAR, "12.5")
    assert compileguard.configured_deadline() == 12.5
    monkeypatch.setenv(compileguard.ENV_VAR, "not-a-number")
    assert compileguard.configured_deadline() == 0.0
    # guard() with no env var must be a transparent no-op.
    monkeypatch.delenv(compileguard.ENV_VAR, raising=False)
    with compileguard.guard("noop"):
        pass
