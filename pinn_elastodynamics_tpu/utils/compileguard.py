"""Bounded first-compile guard for TPU scripts (compile-latency mitigation).

The axon remote-compile latency is erratic: the SAME L-BFGS while_loop graph
compiled in 68 s at one hour and hung >31 min at another (round-3 semi
Fourier ablation, docs/STATUS_r3.md item 3), and the persistent compilation
cache cannot help because the axon plugin's executable-serialization path
hangs (scripts/compile_cache_probe.py).  The reference pays no such cost —
TF1 builds its graph once in-process (/root/reference/PlateHoleQuarter/
train/train.py:252-256) — so every queue slot here used to gamble its whole
window on one compile.

Mitigation: run compile-bearing first calls under a watchdog-thread
deadline.  A hung remote compile blocks the main thread inside a C++ wait,
where neither SIGALRM's Python handler nor any in-thread exception can fire
— so the watchdog is a daemon thread that hard-exits the process
(``os._exit``) with :data:`EXIT_COMPILE_TIMEOUT` when the deadline passes.
The outer relaunch loop (scripts/*_queue*.sh pattern) retries immediately; a
fresh compile attempt is usually fast, so a 31-minute hang becomes a bounded
retry instead of a lost slot.  Resume-from-checkpoint in the training
scripts makes the retry free of lost work.

Enabled via the ``PINN_COMPILE_DEADLINE`` env var (seconds; unset/0 = off),
so library code stays guard-free unless a queue script opts in.
"""

from __future__ import annotations

import contextlib
import os
import sys
import threading
import time

EXIT_COMPILE_TIMEOUT = 3
ENV_VAR = "PINN_COMPILE_DEADLINE"


def configured_deadline() -> float:
    """Seconds from the PINN_COMPILE_DEADLINE env var (0 = disabled)."""
    try:
        return float(os.environ.get(ENV_VAR, "0") or 0.0)
    except ValueError:
        return 0.0


@contextlib.contextmanager
def deadline(seconds: float, what: str = "first compile"):
    """Hard-bound a compile-bearing call via a watchdog daemon thread.

    If the block does not finish within ``seconds`` the process exits with
    :data:`EXIT_COMPILE_TIMEOUT` — the only interruption that works while
    the main thread is blocked inside the remote-compile C++ wait.  Metrics
    files must be flushed per-write (all our scripts do) since ``os._exit``
    skips atexit handlers.
    """
    if seconds <= 0:
        yield
        return

    done = threading.Event()
    t0 = time.perf_counter()

    def _watch():
        if not done.wait(seconds):
            print(
                f"COMPILE_TIMEOUT: {what} exceeded {seconds:.0f}s deadline "
                f"(elapsed {time.perf_counter() - t0:.0f}s); the axon "
                "remote compile is erratic — exiting for a fresh attempt",
                file=sys.stderr, flush=True,
            )
            os._exit(EXIT_COMPILE_TIMEOUT)

    watchdog = threading.Thread(target=_watch, daemon=True,
                                name="compile-deadline")
    watchdog.start()
    try:
        yield
    finally:
        done.set()


def guard(what: str = "first compile"):
    """Env-configured :func:`deadline`; a no-op unless PINN_COMPILE_DEADLINE
    is set.  Usage: ``with compileguard.guard("lbfgs segment"): ...``."""
    return deadline(configured_deadline(), what)
