"""Containment for a jax-0.9.0 executable-reuse bug.

Observed on both the XLA:CPU backend and the axon TPU tunnel: after certain
compiled programs have run in a process (sort/roll-heavy graph-build kernels),
a later — differently-shaped, otherwise-correct — jitted call fails at
dispatch with INVALID_ARGUMENT ("Execution supplied 5 buffers but compiled
program expected 6 buffers" on CPU; an opaque backend error on TPU).
Deterministic repro: run index/build_fast._prune_all once, then
FreshVamana.insert_batch — the first robust_prune dispatch fails; the exact
same call succeeds in a fresh process or after jax.clear_caches().

`call_compiled` wraps a jitted call: on that signature it retries once after a
barrier, then clears the jit caches (one recompile; the persistent compile
cache softens it) and retries again. Correctness is unaffected — only
compile time is re-paid.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("vecgo_tpu")

_ERRORS = None


def _errors():
    global _ERRORS
    if _ERRORS is None:
        import jax

        _ERRORS = (jax.errors.JaxRuntimeError, ValueError, RuntimeError)
    return _ERRORS


def call_compiled(fn, *args, **kwargs):
    """Invoke a jitted function, containing the executable-reuse bug."""
    import jax

    try:
        return jax.block_until_ready(fn(*args, **kwargs))
    except _errors() as e:
        if "INVALID_ARGUMENT" not in str(e):
            raise
        logger.warning("compiled call failed (%s); retrying after barrier", e)
    try:
        return jax.block_until_ready(fn(*args, **kwargs))
    except _errors() as e:
        if "INVALID_ARGUMENT" not in str(e):
            raise
        logger.warning("compiled call failed again; clearing jit caches")
        jax.clear_caches()
        return jax.block_until_ready(fn(*args, **kwargs))
