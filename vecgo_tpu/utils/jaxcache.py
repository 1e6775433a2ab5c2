"""Persistent XLA compilation cache.

First-compile latency on TPU is tens of seconds per kernel configuration and,
without a persistent cache, is paid again by every process. Enabling the cache
makes cold starts (reference: 13 ms open + first query, baseline.txt:91) about
compile-free after the first process.

The cache directory is fingerprinted by the compile environment (jax/jaxlib
version, XLA flags, remote-compile settings, host CPU features): XLA's own
cache key does NOT cover everything — we observed a cache dir shared across
environments serve CPU AOT executables compiled with mismatched machine
features ("+prefer-no-scatter"), which then fail at execution with
INVALID_ARGUMENT buffer-count errors.
"""

import hashlib
import os


def _env_fingerprint() -> str:
    import jax

    parts = [
        jax.__version__,
        getattr(__import__("jaxlib"), "__version__", "?"),
        os.environ.get("XLA_FLAGS", ""),
        os.environ.get("JAX_PLATFORMS", ""),
        os.environ.get("PALLAS_AXON_REMOTE_COMPILE", ""),
    ]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    # Boot identity: /proc/cpuinfo flags are identical across similar VMs, but
    # XLA:CPU AOT executables embed finer-grained machine/tuning features
    # (+prefer-no-scatter etc.) — entries serialized on one host deserialize
    # on another into programs with mismatched buffer signatures
    # (INVALID_ARGUMENT "supplied 5 buffers but expected 6"). Scope the cache
    # to one boot: still cross-process, never cross-machine.
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f.read().strip())
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def enable_compilation_cache(path: str = "") -> None:
    import jax

    path = path or os.environ.get(
        "VECGO_COMPILE_CACHE", os.path.expanduser("~/.cache/vecgo_tpu_xla")
    )
    if path.lower() in ("off", "0", "none"):
        return
    path = os.path.join(path, _env_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
