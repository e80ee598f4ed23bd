"""Persistent XLA compilation cache for CPU-backend scripts.

The cache mechanism round-trips on the CPU backend (0.35 s compile ->
0.18 s AOT load across processes, scripts/compile_cache_probe.py) but the
axon TPU plugin's executable-serialization path hangs, so this is gated to
CPU-only entry points: the f64 polish/probe scripts whose first compile
otherwise costs minutes on the 1-core host every relaunch.

The cache lives inside the repo (gitignored) so it survives VM restarts
between driver windows.
"""

import os

CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cpu_cache",
)


def enable_cpu_compile_cache(jax, cache_dir: str = CACHE_DIR) -> str:
    """Enable the persistent compile cache; call only on CPU-backend scripts.

    Safe to call before any computation; caches every compile >= 1 s.
    Fails fast unless the process is pinned to the CPU backend (the axon
    TPU plugin hangs on the cache's executable-serialization path — a
    mis-ordered import would wedge a whole driver window, ADVICE r3).
    """
    platforms = jax.config.jax_platforms or ""
    if platforms.split(",")[0].strip().lower() != "cpu":
        raise RuntimeError(
            "enable_cpu_compile_cache requires jax_platforms='cpu' BEFORE "
            f"first jax use (got {platforms!r}); the persistent cache hangs "
            "the axon TPU plugin (scripts/compile_cache_probe.py)."
        )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
