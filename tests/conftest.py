"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's `noasm`/`VECGO_SIMD=generic` testing strategy
(SURVEY.md §4): kernels are validated on CPU (Pallas interpret mode) against
jnp references; real-TPU numbers come from bench.py.

Must set env BEFORE jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize pins JAX_PLATFORMS=axon (real TPU); override
# explicitly so tests always run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-dominated (graph-search
# programs); repeat runs hit the cache.
from vecgo_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/vecgo_tpu_xla_cpu"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def tmp_db_dir(tmp_path):
    return str(tmp_path / "db")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
