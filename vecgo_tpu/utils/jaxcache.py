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
    # CPU identity: XLA:CPU AOT executables embed LLVM *tuning* features
    # (+prefer-no-scatter / +prefer-no-gather) chosen from the CPU MODEL, not
    # the ISA flags line — a live-migration to a different SKU keeps boot_id
    # and the flags line but changes the tuning set, and stale cache entries
    # then deserialize into programs with mismatched buffer signatures
    # (INVALID_ARGUMENT "supplied 5 buffers but expected 6"). Fingerprint the
    # model/stepping and core count alongside the flags so a migration (or a
    # resize) rotates the cache directory.
    try:
        wanted = ("flags", "model name", "model\t", "stepping")
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if line.startswith(wanted) and key not in seen:
                    seen.add(key)
                    parts.append(line.strip())
        parts.append(f"ncpu={os.cpu_count()}")
    except OSError:
        pass
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
