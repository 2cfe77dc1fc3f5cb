"""Persistent XLA compilation cache.

The flagship forward compiles in ~2 min over the tunneled TPU backend;
caching compiled executables on disk makes every subsequent process start
(bench runs, driver checks, resumed training) pay only a cache lookup.

Enabled from every entry point (run_nerf_batch, bench, __graft_entry__).
Override the location with ``MPSNERF_COMPILATION_CACHE`` (empty string
disables).
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "mpsnerf_tpu", "xla_cache"
)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache.

    Returns the cache directory, or ``None`` when disabled.  Safe to call
    multiple times and before/after backend initialization.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("MPSNERF_COMPILATION_CACHE", DEFAULT_DIR)
    if not cache_dir:
        return None

    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time (default
        # thresholds skip sub-second compiles, which is fine, but make the
        # floor explicit so tiny-but-hot eval chunks still cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError):  # read-only FS / very old jax
        return None
    return cache_dir
