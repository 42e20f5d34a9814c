"""Persistent XLA compilation cache with a single-writer guard.

The reference stack avoids recompiling its CppAD-generated libraries on
every launch (task.info:13-15, ``recompileLibrariesCppAd false``). Our
equivalent is the JAX persistent compilation cache — but on this image two
processes writing the cache concurrently SIGABRT inside
``put_executable_and_time`` (observed under pytest-xdist; documented in
tests/conftest.py). The workaround: only the process holding an exclusive
flock on ``<dir>/.writer.lock`` enables the cache. Everyone else compiles
in memory as before — correctness never depends on the cache.

Usage (bench.py, tools/*): call ``enable_persistent_cache()`` BEFORE the
first jit compilation. Returns True if the cache was enabled.
"""
from __future__ import annotations

import fcntl
import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "..", ".jax_cache")
_lock_handle = None  # keep the flock for process lifetime


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    global _lock_handle
    if os.environ.get("QM_NO_COMPILE_CACHE") == "1":
        return False
    cache_dir = cache_dir or os.environ.get("QM_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    lock_path = os.path.join(cache_dir, ".writer.lock")
    fh = open(lock_path, "w")
    try:
        fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        fh.close()
        return False  # another writer is live; compile in memory
    _lock_handle = fh

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything: the solve graph costs minutes, but even the small
    # helper jits add up across a session
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return True
