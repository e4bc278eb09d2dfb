"""Persistent XLA compilation cache.

The remote-attached TPU compiles large programs slowly (tens of minutes for
the full inference pipeline on a cold link), so every entry point opts into
JAX's on-disk compilation cache: the first run pays the compile, every later
process with the same HLO loads the executable in seconds.
"""

from __future__ import annotations

import os


def apply_platform(platform: str) -> None:
    """Force the JAX platform (cfg.platform) before first backend use.

    Needed where a sitecustomize registers an accelerator PJRT plugin in
    every interpreter: there JAX_PLATFORMS in the environment is not enough
    and only jax.config wins.
    """
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def enable_compilation_cache(path: str | None = None) -> str:
    """Idempotently turn on the persistent compilation cache.

    Returns the cache directory. Honours JAX_COMPILATION_CACHE_DIR if the
    user already set one.
    """
    import jax

    cache_dir = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "pvnet_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, however small/fast to compile
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass  # older jax: flag names differ; cache is best-effort
    return cache_dir
