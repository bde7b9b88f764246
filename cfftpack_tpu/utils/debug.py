"""Numerical debugging hooks (SURVEY.md §5).

The reference's only failure handling is integer return codes; here
shape errors raise at trace time and numeric failures can be trapped
with JAX's NaN/Inf machinery.
"""
from __future__ import annotations

__all__ = ["enable_nan_checks", "check_finite"]


def enable_nan_checks(enable: bool = True):
    """Raise on NaN/Inf produced by any jitted computation
    (jax_debug_nans re-runs the offending op un-jitted to locate it)."""
    import jax
    jax.config.update("jax_debug_nans", bool(enable))
    jax.config.update("jax_debug_infs", bool(enable))


def check_finite(*arrays, name: str = "array"):
    """Host-side assertion that every array is finite (post-hoc check
    for pipelines that keep NaN-checking off in production)."""
    import numpy as np
    for i, a in enumerate(arrays):
        v = np.asarray(a)
        if not np.all(np.isfinite(v)):
            bad = int(np.sum(~np.isfinite(v)))
            raise FloatingPointError(
                f"{name}[{i}]: {bad} non-finite values "
                f"(shape {v.shape}, dtype {v.dtype})")
