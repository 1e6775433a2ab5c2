"""Persistent XLA compilation cache.

First-compile latency on TPU is tens of seconds per kernel configuration and,
without a persistent cache, is paid again by every process. Enabling the cache
makes cold starts (reference: 13 ms open + first query, baseline.txt:91) about
compile-free after the first process.
"""

import os


def enable_compilation_cache(path: str = "") -> None:
    import jax

    path = path or os.environ.get(
        "VECGO_COMPILE_CACHE", os.path.expanduser("~/.cache/vecgo_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
