"""Plan/compilation persistence (SURVEY.md §5 checkpoint/resume analog).

The reference's create-once/use-many plan (`fft_t` + wsave twiddles)
maps to two caches here: host-side plan tables (plan.py lru_caches,
recomputable in microseconds) and XLA compiled executables — the
expensive part.  ``enable_compilation_cache`` persists compiled
programs across processes so a restarted job skips recompilation.
"""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache", "warm_plans"]


def enable_compilation_cache(path: str = "~/.cache/cfftpack_tpu_xla"):
    """Turn on JAX's persistent compilation cache at ``path``."""
    import jax
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return path


def warm_plans(sizes, with_twiddles: bool = True):
    """Precompute host plan tables for the given transform lengths
    (factorization, per-stage twiddles, Bluestein tables where needed) —
    the analog of calling fft_create ahead of time."""
    from .. import plan
    for n in sizes:
        plan.factor(n)
        if with_twiddles:
            plan.stage_twiddles(n)
            if plan.needs_bluestein(n):
                plan.bluestein_tables(n)
