"""Persistent XLA compilation cache.

The flagship forward compiles in ~2 min over the tunneled TPU backend;
caching compiled executables on disk makes every subsequent process start
(bench runs, driver checks, resumed training) pay only a cache lookup.

Enabled from every entry point (run_nerf_batch, bench, __graft_entry__).
Override the location with ``MPSNERF_COMPILATION_CACHE`` (empty string
disables) and the size bound with ``MPSNERF_COMPILATION_CACHE_MAX_GB``.

Hardening (round 4): XLA:CPU serializes executables AOT-compiled against
the build host's exact CPU features; loading such an entry on a host with
different features fails (``cpu_aot_loader.cc`` rejects the machine
features) and jax silently falls back to a cold compile — in round 3 that
turned an expected-fast driver dryrun into an 18-minute timeout.  So:

* entries live under a HOST-FINGERPRINT subdirectory (jax/jaxlib version,
  arch, the /proc/cpuinfo feature flags) — different-feature hosts never
  share entries, so a load either succeeds or is an honest first-compile
  miss;
* the cache is size-bounded via jax's LRU eviction
  (``jax_compilation_cache_max_size``), defaulting to 8 GiB;
* a failed entry load (jax's ``Error reading persistent compilation
  cache entry`` warning) is forced visible on stderr every time instead
  of being deduplicated away, so cold-compile regressions leave a trace.

Known residual (measured, not fixable by keying): XLA:CPU sometimes
bakes compiler-CHOSEN tuning features (``+prefer-no-gather`` /
``+prefer-no-scatter``) into gather/scatter-heavy executables — our
train-step and plan compiles — and its loader then rejects the entry
because those pseudo-features never appear in the host feature list,
even on the SAME machine that wrote it minutes earlier.  Small programs
round-trip fine (verified: 10 s compile -> 3.6 s warm).  Consequence:
the big CPU-mesh dryrun compiles must fit the budget COLD (they do,
since round 4 — __graft_entry__ docstring) and the cache's value is on
the TPU backend, where entries load normally.
"""

from __future__ import annotations

import hashlib
import os
import platform

BASE_DIR = os.path.join(os.path.expanduser("~"), ".cache", "mpsnerf_tpu")
DEFAULT_DIR = os.path.join(BASE_DIR, "xla_cache")


def host_fingerprint() -> str:
    """Short stable hash of everything that makes a serialized XLA:CPU
    executable host-specific: jax/jaxlib versions, the machine arch, and
    the CPU feature flags (LLVM derives the AOT target features from
    them).  TPU executables don't need this, but keying uniformly is
    cheap and keeps mixed-backend runs unambiguous."""
    try:
        import jax
        import jaxlib

        versions = f"{jax.__version__}/{jaxlib.__version__}"
    except Exception:  # pragma: no cover - jax is always present
        versions = "unknown"
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    blob = f"{versions}|{platform.machine()}|{flags}"
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def _sweep_legacy_flat_entries(root: str) -> None:
    """Pre-round-4 caches stored entries as loose files directly in the
    cache root (no host fingerprint); they are unreachable under the
    keyed layout and held ~4 GiB.  Remove top-level regular files only —
    fingerprint subdirectories are untouched."""
    try:
        for name in os.listdir(root):
            p = os.path.join(root, name)
            if os.path.isfile(p):
                os.unlink(p)
    except OSError:
        pass


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache.

    Returns the cache directory, or ``None`` when disabled.  Safe to call
    multiple times and before/after backend initialization.
    """
    if cache_dir is None:
        cache_dir = os.environ.get("MPSNERF_COMPILATION_CACHE", DEFAULT_DIR)
    if not cache_dir:
        return None
    if os.path.abspath(cache_dir) == os.path.abspath(DEFAULT_DIR):
        _sweep_legacy_flat_entries(cache_dir)
    cache_dir = os.path.join(cache_dir, host_fingerprint())

    import warnings

    import jax

    # jax warns exactly here when an entry exists but fails to
    # deserialize; "always" beats the default once-per-location dedup so
    # every cold-compile fallback is visible in the log
    warnings.filterwarnings(
        "always", message="Error reading persistent compilation cache"
    )

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took noticeable compile time (default
        # thresholds skip sub-second compiles, which is fine, but make the
        # floor explicit so tiny-but-hot eval chunks still cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        max_gb = float(
            os.environ.get("MPSNERF_COMPILATION_CACHE_MAX_GB", "8")
        )
        try:
            import filelock  # noqa: F401  (jax's LRU eviction needs it)

            jax.config.update(
                "jax_compilation_cache_max_size",
                int(max_gb * (1 << 30)),
            )
        except ImportError:
            pass  # unbounded, as before — better than failing
    except (OSError, AttributeError):  # read-only FS / very old jax
        return None
    return cache_dir
