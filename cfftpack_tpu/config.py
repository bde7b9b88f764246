"""Global configuration: normalization conventions and dtype policy.

The reference library (cfftpack, /root/reference/cfftpack/cfftpack.h:58-66)
uses FFTPACK scaling: the *forward* transform is scaled by 1/N and the
inverse is unscaled — the opposite of numpy/FFTW.  An orthonormal toggle
(`fft_ortho`, cfftpack.h:67) switches both directions to 1/sqrt(N).

We expose this as a ``norm`` parameter:

=============  ====================  ====================
norm           forward scale         inverse scale
=============  ====================  ====================
``"fftpack"``  1/N                   1       (reference default)
``"ortho"``    1/sqrt(N)             1/sqrt(N)
``"backward"`` 1                     1/N     (numpy/scipy default)
``"forward"``  1/N                   1       (alias of fftpack)
=============  ====================  ====================
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

VALID_NORMS = ("fftpack", "ortho", "backward", "forward")
DEFAULT_NORM = "fftpack"


def check_norm(norm: str | None) -> str:
    if norm is None:
        return DEFAULT_NORM
    if norm not in VALID_NORMS:
        raise ValueError(f"norm must be one of {VALID_NORMS}, got {norm!r}")
    return norm


def fwd_scale(norm: str, n: int) -> float:
    """Scalar applied to the forward transform output."""
    norm = check_norm(norm)
    if norm in ("fftpack", "forward"):
        return 1.0 / n
    if norm == "ortho":
        return float(1.0 / np.sqrt(n))  # Python float: no f64 promotion
    return 1.0  # backward


def inv_scale(norm: str, n: int) -> float:
    """Scalar applied to the inverse transform output."""
    norm = check_norm(norm)
    if norm in ("fftpack", "forward"):
        return 1.0
    if norm == "ortho":
        return float(1.0 / np.sqrt(n))  # Python float: no f64 promotion
    return 1.0 / n  # backward


def real_dtype_of(dtype) -> jnp.dtype:
    """Real dtype underlying a complex (or real) dtype."""
    d = jnp.dtype(dtype)
    if d == jnp.complex64:
        return jnp.dtype(jnp.float32)
    if d == jnp.complex128:
        return jnp.dtype(jnp.float64)
    return d


def complex_dtype_of(dtype) -> jnp.dtype:
    """Complex dtype matching a real (or complex) dtype's precision."""
    d = jnp.dtype(dtype)
    if d in (jnp.dtype(jnp.float64), jnp.dtype(jnp.complex128)):
        return jnp.dtype(jnp.complex128)
    return jnp.dtype(jnp.complex64)
