"""High-precision (double-float) FFT — f64-class accuracy on f32-only TPUs.

``fft_hp``/``ifft_hp`` run the same Stockham mixed-radix schedule as the
f32 engine (core._stockham; reference stage schedule c1fm1f_,
/root/reference/cfftpack/fftpack.c:2041-2142) but carry every value as
a double-float (hi, lo) pair of f32 arrays (ops/df64.py), with all
twiddle/butterfly constants split exactly from host f64.  Measured
accuracy ~1e-14 relative — the reference's C-double tolerance class
(testall.c's 1e-13 bar) — from pure f32 VPU arithmetic, so it executes
on TPU backends where native f64 is slow or hangs outright
(BASELINE.md "f64 on-TPU" gap; core._warn_f64_tpu).

Scope: any n whose factors are <= 32 after greedy {4,2,3,5,odd}
factorization (plan.factor) — i.e. every fast size and all odd primes
up to 31.  Larger primes would need a df64 Bluestein (padded
convolution); they raise with a pointer to the CPU x64 path instead.

Cost model: each df64 op is 6-28 f32 flops, so expect roughly 20-40x
the f32 engine's time — this is the accuracy mode, not the throughput
mode.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .. import plan
from ..config import DEFAULT_NORM, check_norm, fwd_scale, inv_scale
from .df64 import (df_add, df_sub, df_mul, df_neg, df_split_host,
                   df_merge_host)

__all__ = ["fft_hp", "ifft_hp", "sfft_hp"]

_MAX_HP_FACTOR = 32


def _const(v: float, like):
    """Host f64 scalar -> df pair of device scalars."""
    hi, lo = df_split_host(np.float64(v))
    return (jnp.asarray(hi, dtype=like.dtype),
            jnp.asarray(lo, dtype=like.dtype))


def _cmul_df(ar, ai, br, bi):
    """Complex product of df-complex values (each a (hi, lo) pair)."""
    t1 = df_mul(*ar, *br)
    t2 = df_mul(*ai, *bi)
    t3 = df_mul(*ar, *bi)
    t4 = df_mul(*ai, *br)
    return (df_sub(*t1, *t2), df_add(*t3, *t4))


def _cadd(a, b):
    return (df_add(*a[0], *b[0]), df_add(*a[1], *b[1]))


def _csub(a, b):
    return (df_sub(*a[0], *b[0]), df_sub(*a[1], *b[1]))


def _cmul_j(a, sgn: float):
    """Multiply by sgn*1j: exact (swap + negate)."""
    re, im = a
    if sgn > 0:
        return (df_neg(*im), re)
    return (im, df_neg(*re))


def _butterfly_hp(T, p: int, inverse: bool):
    """Length-p DFT over axis -2 of df-complex T = (re_pair, im_pair);
    each pair element has shape (..., p, m).  Mirrors core._butterfly's
    radix algebra with exactly-split constants."""
    sgn = 1.0 if inverse else -1.0

    def pick(j):
        return ((T[0][0][..., j, :], T[0][1][..., j, :]),
                (T[1][0][..., j, :], T[1][1][..., j, :]))

    X = [pick(j) for j in range(p)]

    def stack(cols):
        re_h = jnp.stack([c[0][0] for c in cols], axis=-2)
        re_l = jnp.stack([c[0][1] for c in cols], axis=-2)
        im_h = jnp.stack([c[1][0] for c in cols], axis=-2)
        im_l = jnp.stack([c[1][1] for c in cols], axis=-2)
        return ((re_h, re_l), (im_h, im_l))

    if p == 1:
        return T
    if p == 2:
        return stack([_cadd(X[0], X[1]), _csub(X[0], X[1])])
    if p == 4:
        a = _cadd(X[0], X[2])
        b = _csub(X[0], X[2])
        c = _cadd(X[1], X[3])
        d = _cmul_j(_csub(X[1], X[3]), sgn)
        return stack([_cadd(a, c), _cadd(b, d), _csub(a, c), _csub(b, d)])
    # generic small radix (3, 5, odd primes <= 31): dense DFT sum with
    # df-split matrix constants.  Vectorized over the OUTPUT bin axis
    # (each term is a (..., p, m) df op against a (p, 1) constant
    # column), so the traced graph is O(p) ops, not O(p^2) — the
    # unrolled double loop made p=31 compile-prohibitive.
    D = plan.dft_matrix(p)
    if inverse:
        D = np.conj(D)
    dtype = T[0][0].dtype

    def col_const(v):
        hi, lo = df_split_host(v)
        return (jnp.asarray(hi, dtype=dtype)[:, None],
                jnp.asarray(lo, dtype=dtype)[:, None])

    acc = None
    for j in range(p):
        dr = col_const(D[:, j].real)               # (p, 1) df pairs
        di = col_const(D[:, j].imag)
        xr, xi = X[j]
        xr_b = (xr[0][..., None, :], xr[1][..., None, :])
        xi_b = (xi[0][..., None, :], xi[1][..., None, :])
        term = _cmul_df(xr_b, xi_b, dr, di)        # (..., p, m)
        acc = term if acc is None else _cadd(acc, term)
    return acc


def _twiddle_tables_hp(tw, inverse: bool, dtype):
    twi = np.conj(tw) if inverse else tw
    rh, rl = df_split_host(twi.real)
    ih, il = df_split_host(twi.imag)
    return tuple(jnp.asarray(v, dtype=dtype)[None, None]
                 for v in (rh, rl, ih, il))


def _stockham_hp(Rh, Rl, Ih, Il, n: int, inverse: bool):
    shape = Rh.shape
    arrs = [a.reshape(-1, 1, n) for a in (Rh, Rl, Ih, Il)]
    B = arrs[0].shape[0]
    L, m = 1, n
    for p, tw in zip(plan.factor(n), plan.stage_twiddles(n)):
        mn = m // p
        view = [a.reshape(B, L, p, mn) for a in arrs]
        T = ((view[0], view[1]), (view[2], view[3]))
        U = _butterfly_hp(T, p, inverse)
        if mn > 1:
            trh, trl, tih, til = _twiddle_tables_hp(tw, inverse,
                                                    arrs[0].dtype)
            re, im = _cmul_df((U[0][0], U[0][1]), (U[1][0], U[1][1]),
                              (trh, trl), (tih, til))
            U = (re, im)
        flat = []
        for pair in (U[0], U[1]):
            for a in pair:
                flat.append(jnp.swapaxes(a, 1, 2).reshape(B, L * p, mn))
        arrs = flat
        L *= p
        m = mn
    return tuple(a.reshape(shape) for a in arrs)


@partial(jax.jit, static_argnums=(4, 5))
def _sfft_hp_jit(Rh, Rl, Ih, Il, n: int, inverse: bool):
    return _stockham_hp(Rh, Rl, Ih, Il, n, inverse)


def sfft_hp(Rh, Rl, Ih, Il, n: int, inverse: bool):
    """Unscaled df64 DFT over the last axis of a df-complex quad
    (re_hi, re_lo, im_hi, im_lo) — the on-device entry point."""
    for p in plan.factor(n):
        if p > _MAX_HP_FACTOR:
            raise ValueError(
                f"fft_hp: factor {p} of n={n} exceeds {_MAX_HP_FACTOR} "
                "(df64 Bluestein not implemented — use a fast size, or "
                "the CPU x64 path for large-prime lengths)")
    return _sfft_hp_jit(Rh, Rl, Ih, Il, n, inverse)


def _fft_hp(x, inverse: bool, norm: str):
    x = np.asarray(x)
    n = x.shape[-1]
    if n == 0:
        raise ValueError("fft_hp: empty transform axis")
    xr = np.asarray(x.real, dtype=np.float64)
    xi = np.asarray(x.imag, dtype=np.float64)
    Rh, Rl = df_split_host(xr)
    Ih, Il = df_split_host(xi)
    out = sfft_hp(jnp.asarray(Rh), jnp.asarray(Rl), jnp.asarray(Ih),
                  jnp.asarray(Il), n, inverse)
    rh, rl, ih, il = (np.asarray(a) for a in out)
    yr = df_merge_host(rh, rl)
    yi = df_merge_host(ih, il)
    s = inv_scale(norm, n) if inverse else fwd_scale(norm, n)
    y = yr + 1j * yi
    if s != 1.0:
        y = y * np.float64(s)
    return y


def fft_hp(x, norm: str = DEFAULT_NORM):
    """Forward FFT at double-float precision (host f64 in/out; the
    transform itself runs on-device in f32 pairs)."""
    return _fft_hp(x, False, check_norm(norm))


def ifft_hp(y, norm: str = DEFAULT_NORM):
    return _fft_hp(y, True, check_norm(norm))
