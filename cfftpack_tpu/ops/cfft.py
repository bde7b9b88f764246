"""Complex FFT core: mixed-radix Stockham autosort, any length.

TPU-first re-design of the reference's complex FFT engine
(``c1fm1f_``/``c1fm1b_`` stage loop, /root/reference/cfftpack/fftpack.c:1931-2142,
radix kernels ``c1f{2,3,4,5,g}k{f,b}_`` fftpack.c:96-1922):

* Same mathematical stage schedule (ip in factor(n), l1*ip*ido = n) but in
  the *Stockham autosort* formulation: each stage is a radix-p butterfly
  over a (B, L, p, m/p) view, a twiddle multiply, and an (L, p) axis swap.
  Natural-order output, no bit-reversal pass, no ping-pong `na` toggle —
  the data layout at every stage is a dense rectangle, which is what the
  TPU vector unit and XLA's tiling want.
* Radices 2/3/4/5 are hard-coded butterflies (adds + a few mults, exactly
  the classic identities); other small primes use a dense p x p DFT matrix
  contraction (MXU-friendly; the analog of the generic kernel c1fgkf_).
* Lengths with a prime factor > plan.MAX_DIRECT_RADIX use Bluestein's
  chirp-z transform (O(n log n) for ANY n — strictly better than the
  reference, which degrades to O(n^2) on large primes, cfftextra.h:24-28).

Everything here is shape-static, trace-friendly, and vmap/shard_map
compatible: transforms are pure functions over the last axis.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import plan
from ..config import (DEFAULT_NORM, check_norm, complex_dtype_of, fwd_scale,
                      inv_scale)

__all__ = ["fft", "ifft", "fft2", "ifft2", "fftn", "ifftn"]

# Python-float constants (weakly typed under JAX -> no unwanted promotion)
_SQ3_2 = float(np.sqrt(3.0) / 2.0)
_C5_1, _S5_1 = float(np.cos(2 * np.pi / 5)), float(np.sin(2 * np.pi / 5))
_C5_2, _S5_2 = float(np.cos(4 * np.pi / 5)), float(np.sin(4 * np.pi / 5))


def _butterfly(T, p: int, inverse: bool):
    """DFT of length p over axis -2 of T (..., p, m).

    sign convention: forward kernel is exp(-2j*pi*j*k/p); inverse conj.
    """
    sgn = 1.0 if inverse else -1.0  # sign of the imaginary (sine) terms
    Tj = [T[..., j, :] for j in range(p)]
    if p == 1:
        return T
    if p == 2:
        return jnp.stack([Tj[0] + Tj[1], Tj[0] - Tj[1]], axis=-2)
    if p == 3:
        t = Tj[1] + Tj[2]
        d = Tj[1] - Tj[2]
        m1 = Tj[0] - 0.5 * t
        m2 = (sgn * 1j * _SQ3_2) * d
        return jnp.stack([Tj[0] + t, m1 + m2, m1 - m2], axis=-2)
    if p == 4:
        a = Tj[0] + Tj[2]
        b = Tj[0] - Tj[2]
        c = Tj[1] + Tj[3]
        d = (sgn * 1j) * (Tj[1] - Tj[3])
        return jnp.stack([a + c, b + d, a - c, b - d], axis=-2)
    if p == 5:
        t1 = Tj[1] + Tj[4]
        t2 = Tj[2] + Tj[3]
        t3 = Tj[1] - Tj[4]
        t4 = Tj[2] - Tj[3]
        u0 = Tj[0] + t1 + t2
        a1 = Tj[0] + _C5_1 * t1 + _C5_2 * t2
        a2 = Tj[0] + _C5_2 * t1 + _C5_1 * t2
        b1 = (sgn * 1j) * (_S5_1 * t3 + _S5_2 * t4)
        b2 = (sgn * 1j) * (_S5_2 * t3 - _S5_1 * t4)
        return jnp.stack([u0, a1 + b1, a2 + b2, a2 - b2, a1 - b1], axis=-2)
    # generic small prime: dense DFT matrix on the MXU
    D = plan.dft_matrix(p)
    if inverse:
        D = np.conj(D)
    D = jnp.asarray(D, dtype=T.dtype)
    return jnp.einsum("kp,...pj->...kj", D, T, preferred_element_type=T.dtype)


def _stockham(x, n: int, inverse: bool):
    """Unscaled mixed-radix DFT over the last axis of x (..., n)."""
    if n == 1:
        return x
    cdtype = x.dtype
    shape = x.shape
    S = x.reshape(-1, 1, n)
    B = S.shape[0]
    L, m = 1, n
    for p, tw in zip(plan.factor(n), plan.stage_twiddles(n)):
        mn = m // p
        T = S.reshape(B, L, p, mn)
        U = _butterfly(T, p, inverse)
        if mn > 1:  # stage twiddle (all-ones when mn == 1)
            twc = np.conj(tw) if inverse else tw
            U = U * jnp.asarray(twc, dtype=cdtype)[None, None]
        S = jnp.swapaxes(U, 1, 2).reshape(B, L * p, mn)
        L *= p
        m = mn
    return S.reshape(shape)


def _bluestein(x, n: int, inverse: bool):
    """Unscaled DFT of arbitrary length n via the chirp-z transform."""
    m, chirp, bq = plan.bluestein_tables(n)
    cdtype = x.dtype
    if inverse:
        chirp = np.conj(chirp)
        bq = np.conj(bq)
    a = x * jnp.asarray(chirp, dtype=cdtype)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, m - n)]
    a = jnp.pad(a, pad)
    aq = _stockham(a, m, inverse=False)
    cq = aq * jnp.asarray(bq, dtype=cdtype)
    # unscaled inverse DFT of length m, then 1/m normalization
    conv = _stockham(cq, m, inverse=True) * (1.0 / m)
    return conv[..., :n] * jnp.asarray(chirp, dtype=cdtype)


def _dft_last_axis(x, n: int, inverse: bool):
    """Unscaled DFT over the last axis — complex boundary over the
    split-real engine (core.py).  TPU-facing code should call
    core.sfft / the *_split API directly: the XLA TPU backend has no
    complex support, so this wrapper only executes on CPU."""
    from . import core
    yr, yi = core.sfft(jnp.real(x), jnp.imag(x), n, inverse)
    return jax.lax.complex(yr, yi).astype(x.dtype)


def _dft_last_axis_xla_complex(x, n: int, inverse: bool):
    """Legacy complex-dtype path (kept for A/B testing on CPU)."""
    if plan.needs_bluestein(n):
        return _bluestein(x, n, inverse)
    return _stockham(x, n, inverse)


def _apply_axis(x, axis: int, fn):
    axis = axis % x.ndim
    if axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    y = fn(x)
    if axis != x.ndim - 1:
        y = jnp.moveaxis(y, -1, axis)
    return y


def _fft_impl(x, axis: int, norm: str, inverse: bool):
    x = jnp.asarray(x)
    if not -x.ndim <= axis < x.ndim:
        raise ValueError(f"axis {axis} out of range for rank-{x.ndim} input")
    cdtype = complex_dtype_of(x.dtype)
    x = x.astype(cdtype)
    n = x.shape[axis]
    if n < 1:
        raise ValueError(f"transform length must be >= 1, got {n}")
    y = _apply_axis(x, axis, partial(_dft_last_axis, n=n, inverse=inverse))
    s = inv_scale(norm, n) if inverse else fwd_scale(norm, n)
    if s != 1.0:
        y = y * jnp.asarray(s, dtype=cdtype)
    return y


# One compiled executable per (shape, dtype, axis, norm, direction) — the
# TPU analog of the reference's create-once plans (fft_create + wsave,
# cfftpack.c:10-31): planning = trace + XLA compile, cached by jax.jit.
_fft_jit = jax.jit(_fft_impl, static_argnums=(1, 2, 3))


def fft(x, axis: int = -1, norm: str = DEFAULT_NORM):
    """Forward complex FFT along ``axis``.

    Default norm="fftpack" scales by 1/N (reference convention,
    cfftpack.h:100-102).  Any length is supported in O(n log n).
    """
    return _fft_jit(x, axis, check_norm(norm), False)


def ifft(x, axis: int = -1, norm: str = DEFAULT_NORM):
    """Inverse complex FFT along ``axis`` (unscaled under norm="fftpack")."""
    return _fft_jit(x, axis, check_norm(norm), True)


def _fftn_core(x, axes, norm: str, inverse: bool):
    y = x
    for ax in axes:
        y = _fft_impl(y, ax, norm, inverse)
    return y


_fftn_jit = jax.jit(_fftn_core, static_argnums=(1, 2, 3))


def _fftn_impl(x, axes, norm: str, inverse: bool):
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    return _fftn_jit(x, tuple(int(a) for a in axes), norm, inverse)


def fft2(x, axes=(-2, -1), norm: str = DEFAULT_NORM):
    """2-D FFT, row-column order (the TPU analog of cfft2f_,
    fftpack.c:2363-2434, which runs batched 1-D passes per axis)."""
    return _fftn_impl(x, axes, check_norm(norm), inverse=False)


def ifft2(x, axes=(-2, -1), norm: str = DEFAULT_NORM):
    return _fftn_impl(x, axes, check_norm(norm), inverse=True)


def fftn(x, axes=None, norm: str = DEFAULT_NORM):
    return _fftn_impl(x, axes, check_norm(norm), inverse=False)


def ifftn(x, axes=None, norm: str = DEFAULT_NORM):
    return _fftn_impl(x, axes, check_norm(norm), inverse=True)


# ------------------------------------------------- split (re, im) API
# TPU entry points: pairs of real arrays in, pairs out.  The XLA TPU
# backend rejects complex-typed programs, and split planes are the
# native layout for Pallas kernels anyway.

def _fft_split_impl(xr, xi, axis: int, norm: str, inverse: bool):
    from . import core
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    if xr.shape != xi.shape:
        raise ValueError("re/im shapes differ")
    n = xr.shape[axis]
    axis = axis % xr.ndim
    move = axis != xr.ndim - 1
    if move:
        xr = jnp.moveaxis(xr, axis, -1)
        xi = jnp.moveaxis(xi, axis, -1)
    yr, yi = core.sfft(xr, xi, n, inverse)
    s = inv_scale(norm, n) if inverse else fwd_scale(norm, n)
    if s != 1.0:
        yr = yr * s
        yi = yi * s
    if move:
        yr = jnp.moveaxis(yr, -1, axis)
        yi = jnp.moveaxis(yi, -1, axis)
    return yr, yi


_fft_split_jit = jax.jit(_fft_split_impl, static_argnums=(2, 3, 4))


def fft_split(xr, xi, axis: int = -1, norm: str = DEFAULT_NORM):
    """Forward FFT on an (re, im) pair of real arrays — the TPU path."""
    return _fft_split_jit(xr, xi, axis, check_norm(norm), False)


def ifft_split(xr, xi, axis: int = -1, norm: str = DEFAULT_NORM):
    return _fft_split_jit(xr, xi, axis, check_norm(norm), True)
