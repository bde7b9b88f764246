"""Ahead-of-time compilation for serving (plan-and-freeze).

The reference's fft_create gives users an explicit plan handle; the
jit-cache equivalent compiles lazily on first call.  For serving,
``precompile`` builds the executable up front (jax AOT lower+compile)
so the first production request pays zero compile latency; combine
with utils.cache.enable_compilation_cache for cross-process reuse.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["precompile"]


def precompile(fn, *example_args, **example_kwargs):
    """Return an AOT-compiled callable specialized to the example
    arguments' shapes/dtypes.

    Example::

        step = precompile(lambda v: ct.rfft_split(v),
                          jnp.zeros((4096, 960), jnp.float32))
        out = step(batch)   # no compile on first call
    """
    shaped = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        (example_args, example_kwargs))
    sargs, skwargs = shaped
    lowered = jax.jit(fn).lower(*sargs, **skwargs)
    compiled = lowered.compile()

    def run(*args, **kwargs):
        return compiled(*args, **kwargs)

    run.compiled = compiled
    run.cost_analysis = getattr(compiled, "cost_analysis", None)
    return run
