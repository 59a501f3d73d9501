"""Persistent XLA compilation cache.

The sandbox TPU backend compiles through a remote service at ~1-3 min per
program; the persistent cache turns warm starts into sub-second loads.
"""

import os


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax
    if jax.config.jax_compilation_cache_dir:
        return
    cache_dir = cache_dir or os.environ.get(
        "PECALLER_TPU_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "pecaller_tpu_xla"))
    # key by backend: CPU test runs must not load TPU-host AOT artifacts
    cache_dir = os.path.join(cache_dir, jax.default_backend())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
