"""Split-complex (re, im) transform engine — the TPU-native core.

TPUs have no native complex arithmetic: not in Pallas (the guide's
layout rules), and the XLA TPU backend this framework targets rejects
complex-typed programs outright (execution returns UNIMPLEMENTED).
Interleaved complex is also hostile to the (8, 128) vector layout.  So
the ENGINE works on pairs of real arrays (re, im); the complex-dtype
API in cfft.py/rfft.py is a thin boundary wrapper that CPU users get
for free, while TPU-facing code (bench, apps, Pallas kernels) calls
the ``*_split`` entry points directly.

Algorithms mirror the complex engine (see cfft.py's docstring for the
reference mapping to fftpack.c's c1fm1f_/radix kernels): Stockham
autosort mixed radix 2/3/4/5 + dense-matrix odd radices + Bluestein
for large primes.  All tables are host-precomputed float64, cast to
the working dtype at trace time.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import plan

__all__ = ["sfft", "srfft", "sirfft"]

_SQ3_2 = float(np.sqrt(3.0) / 2.0)
_C5_1, _S5_1 = float(np.cos(2 * np.pi / 5)), float(np.sin(2 * np.pi / 5))
_C5_2, _S5_2 = float(np.cos(4 * np.pi / 5)), float(np.sin(4 * np.pi / 5))


def _slice_axis(T, j: int, ax: int):
    idx = [slice(None)] * T.ndim
    idx[ax] = j
    return T[tuple(idx)]


def _butterfly(Tr, Ti, p: int, inverse: bool, axis: int = -2):
    """Length-p DFT over ``axis`` of an (re, im) pair.

    Shared by the XLA engine (axis -2 of (..., p, m)) and the Pallas
    kernel (axis 1 of (L, p, mn, TB)) so the butterfly math exists
    exactly once.
    """
    sgn = 1.0 if inverse else -1.0
    ax = axis % Tr.ndim
    R = [_slice_axis(Tr, j, ax) for j in range(p)]
    I = [_slice_axis(Ti, j, ax) for j in range(p)]
    if p == 1:
        return Tr, Ti
    if p == 2:
        return (jnp.stack([R[0] + R[1], R[0] - R[1]], axis=ax),
                jnp.stack([I[0] + I[1], I[0] - I[1]], axis=ax))
    if p == 3:
        tr, ti = R[1] + R[2], I[1] + I[2]
        dr, di = R[1] - R[2], I[1] - I[2]
        m1r = R[0] - 0.5 * tr
        m1i = I[0] - 0.5 * ti
        # m2 = sgn*1j*sq32*d  ->  re: -sgn*sq32*di, im: sgn*sq32*dr
        m2r = -(sgn * _SQ3_2) * di
        m2i = (sgn * _SQ3_2) * dr
        return (jnp.stack([R[0] + tr, m1r + m2r, m1r - m2r], axis=ax),
                jnp.stack([I[0] + ti, m1i + m2i, m1i - m2i], axis=ax))
    if p == 4:
        ar, ai = R[0] + R[2], I[0] + I[2]
        br, bi = R[0] - R[2], I[0] - I[2]
        cr, ci = R[1] + R[3], I[1] + I[3]
        # d = sgn*1j*(T1-T3)
        dr = -sgn * (I[1] - I[3])
        di = sgn * (R[1] - R[3])
        return (jnp.stack([ar + cr, br + dr, ar - cr, br - dr], axis=ax),
                jnp.stack([ai + ci, bi + di, ai - ci, bi - di], axis=ax))
    if p == 5:
        t1r, t1i = R[1] + R[4], I[1] + I[4]
        t2r, t2i = R[2] + R[3], I[2] + I[3]
        t3r, t3i = R[1] - R[4], I[1] - I[4]
        t4r, t4i = R[2] - R[3], I[2] - I[3]
        u0r, u0i = R[0] + t1r + t2r, I[0] + t1i + t2i
        a1r = R[0] + _C5_1 * t1r + _C5_2 * t2r
        a1i = I[0] + _C5_1 * t1i + _C5_2 * t2i
        a2r = R[0] + _C5_2 * t1r + _C5_1 * t2r
        a2i = I[0] + _C5_2 * t1i + _C5_1 * t2i
        # b1 = sgn*1j*(s1*t3 + s2*t4); b2 = sgn*1j*(s2*t3 - s1*t4)
        b1r = -sgn * (_S5_1 * t3i + _S5_2 * t4i)
        b1i = sgn * (_S5_1 * t3r + _S5_2 * t4r)
        b2r = -sgn * (_S5_2 * t3i - _S5_1 * t4i)
        b2i = sgn * (_S5_2 * t3r - _S5_1 * t4r)
        return (jnp.stack([u0r, a1r + b1r, a2r + b2r, a2r - b2r,
                           a1r - b1r], axis=ax),
                jnp.stack([u0i, a1i + b1i, a2i + b2i, a2i - b2i,
                           a1i - b1i], axis=ax))
    # generic small prime: dense p x p DFT matrix.  precision=HIGHEST is
    # required on TPU: the MXU otherwise multiplies f32 as bf16 (2e-3
    # error observed at p=17).
    D = plan.dft_matrix(p)
    if inverse:
        D = np.conj(D)
    Dr = jnp.asarray(D.real, dtype=Tr.dtype)
    Di = jnp.asarray(D.imag, dtype=Tr.dtype)
    if ax != Tr.ndim - 2:
        Tr = jnp.moveaxis(Tr, ax, -2)
        Ti = jnp.moveaxis(Ti, ax, -2)
    kw = dict(precision=jax.lax.Precision.HIGHEST,
              preferred_element_type=Tr.dtype)
    Yr = (jnp.einsum("kp,...pj->...kj", Dr, Tr, **kw)
          - jnp.einsum("kp,...pj->...kj", Di, Ti, **kw))
    Yi = (jnp.einsum("kp,...pj->...kj", Dr, Ti, **kw)
          + jnp.einsum("kp,...pj->...kj", Di, Tr, **kw))
    if ax != Yr.ndim - 2:
        Yr = jnp.moveaxis(Yr, -2, ax)
        Yi = jnp.moveaxis(Yi, -2, ax)
    return Yr, Yi


def _stockham(xr, xi, n: int, inverse: bool):
    if n == 1:
        return xr, xi
    shape = xr.shape
    Sr = xr.reshape(-1, 1, n)
    Si = xi.reshape(-1, 1, n)
    B = Sr.shape[0]
    L, m = 1, n
    for p, tw in zip(plan.factor(n), plan.stage_twiddles(n)):
        mn = m // p
        Ur, Ui = _butterfly(Sr.reshape(B, L, p, mn), Si.reshape(B, L, p, mn),
                            p, inverse)
        if mn > 1:
            twr = jnp.asarray(tw.real, dtype=xr.dtype)[None, None]
            twi_ = tw.imag if not inverse else -tw.imag
            twi = jnp.asarray(twi_, dtype=xr.dtype)[None, None]
            Vr = Ur * twr - Ui * twi
            Vi = Ur * twi + Ui * twr
            Ur, Ui = Vr, Vi
        Sr = jnp.swapaxes(Ur, 1, 2).reshape(B, L * p, mn)
        Si = jnp.swapaxes(Ui, 1, 2).reshape(B, L * p, mn)
        L *= p
        m = mn
    return Sr.reshape(shape), Si.reshape(shape)


def _cmul_tab(xr, xi, tr, ti):
    """(xr + i xi) * (tr + i ti) with host-table (tr, ti)."""
    return xr * tr - xi * ti, xr * ti + xi * tr


def _bluestein(xr, xi, n: int, inverse: bool):
    m, chirp, bq = plan.bluestein_tables(n)
    if inverse:
        chirp = np.conj(chirp)
        bq = np.conj(bq)
    cr = jnp.asarray(chirp.real, dtype=xr.dtype)
    ci = jnp.asarray(chirp.imag, dtype=xr.dtype)
    ar, ai = _cmul_tab(xr, xi, cr, ci)
    pad = [(0, 0)] * (xr.ndim - 1) + [(0, m - n)]
    ar = jnp.pad(ar, pad)
    ai = jnp.pad(ai, pad)
    Ar, Ai = _stockham(ar, ai, m, inverse=False)
    br = jnp.asarray(bq.real, dtype=xr.dtype)
    bi = jnp.asarray(bq.imag, dtype=xr.dtype)
    Cr, Ci = _cmul_tab(Ar, Ai, br, bi)
    Er, Ei = _stockham(Cr, Ci, m, inverse=True)
    s = 1.0 / m
    Er = Er[..., :n] * s
    Ei = Ei[..., :n] * s
    return _cmul_tab(Er, Ei, cr, ci)


def _warn_f64_tpu(dtype):
    """Every split entry point funnels here: f64 execution hangs on some
    TPU backends (axon v5e) and is slow emulation elsewhere."""
    import jax
    if dtype == jnp.float64 and jax.default_backend() == "tpu":
        import warnings
        warnings.warn(
            "float64 on TPU: most TPU generations emulate f64 slowly and "
            "some backends hang outright; prefer float32 on-chip "
            "(f64 parity is CPU-validated)", stacklevel=4)


def sfft(xr, xi, n: int, inverse: bool):
    """Unscaled mixed-radix DFT over the last axis of an (re, im) pair."""
    _warn_f64_tpu(xr.dtype)
    if plan.needs_bluestein(n):
        return _bluestein(xr, xi, n, inverse)
    return _stockham(xr, xi, n, inverse)


# ------------------------------------------------------- real transforms

def _half_tables(n: int):
    k = np.arange(n // 2 + 1)
    w = np.exp((-2j * np.pi / n) * k)
    return w.real, w.imag


def srfft(x, n: int):
    """Unscaled r2c DFT of real x -> (re, im) pair of n//2+1 bins.

    Even n: half-length complex trick (x packed into an n/2 pair);
    odd n: full pair FFT of (x, 0), truncated.  Matches rfft.py's
    complex-path semantics bit-for-bit (imag DC == 0 etc.).
    """
    _warn_f64_tpu(x.dtype)
    if n == 1:
        return x, jnp.zeros_like(x)
    if n % 2 == 0:
        m2 = n // 2
        zr = x[..., 0::2]
        zi = x[..., 1::2]
        Zr, Zi = sfft(zr, zi, m2, inverse=False)
        Zfr = jnp.concatenate([Zr, Zr[..., :1]], axis=-1)
        Zfi = jnp.concatenate([Zi, Zi[..., :1]], axis=-1)
        Zcr = Zfr[..., ::-1]
        Zci = -Zfi[..., ::-1]
        Zer = 0.5 * (Zfr + Zcr)
        Zei = 0.5 * (Zfi + Zci)
        # Zo = -0.5j*(Zf - Zc)
        Zor = 0.5 * (Zfi - Zci)
        Zoi = -0.5 * (Zfr - Zcr)
        wr, wi = _half_tables(n)
        wr = jnp.asarray(wr, dtype=x.dtype)
        wi = jnp.asarray(wi, dtype=x.dtype)
        yr = Zer + Zor * wr - Zoi * wi
        yi = Zei + Zor * wi + Zoi * wr
    else:
        Yr, Yi = sfft(x, jnp.zeros_like(x), n, inverse=False)
        yr = Yr[..., : n // 2 + 1]
        yi = Yi[..., : n // 2 + 1]
    yi = yi.at[..., 0].set(0.0)
    if n % 2 == 0:
        yi = yi.at[..., -1].set(0.0)
    return yr, yi


def sirfft(yr, yi, n: int):
    """Unscaled c2r inverse of a packed pair: returns n * x (real)."""
    if n == 1:
        return yr[..., 0:1]
    if n % 2 == 0:
        m2 = n // 2
        Ycr = yr[..., ::-1]
        Yci = -yi[..., ::-1]
        Zer = yr + Ycr
        Zei = yi + Yci
        wr, wi = _half_tables(n)
        wr = jnp.asarray(wr, dtype=yr.dtype)
        wi = jnp.asarray(-wi, dtype=yr.dtype)  # conj table
        dr = yr - Ycr
        di = yi - Yci
        Zor = dr * wr - di * wi
        Zoi = dr * wi + di * wr
        # Z = Ze + 1j*Zo  (truncated to m2)
        Zr = (Zer - Zoi)[..., :m2]
        Zi = (Zei + Zor)[..., :m2]
        zr, zi = sfft(Zr, Zi, m2, inverse=True)
        out = jnp.stack([zr, zi], axis=-1)
        return out.reshape(*zr.shape[:-1], n)
    tr = yr[..., 1:][..., ::-1]
    ti = -yi[..., 1:][..., ::-1]
    fr = jnp.concatenate([yr, tr], axis=-1)
    fi = jnp.concatenate([yi, ti], axis=-1)
    zr, _ = sfft(fr, fi, n, inverse=True)
    return zr


# ----------------------------------------------- shifted DFT (split)

def s_shifted_dft_real(x, n: int, m: int, a: float, b: float, nout: int):
    """U[k] = sum_{j<n} x[j] e^{-2i pi (j+a)(k+b)/m} for REAL x,
    zero-padded to m, returned as an (re, im) pair of nout bins.

    Split-real version of gdft.shifted_dft_padded — the workhorse of
    DCT-IV and the odd types V-VIII, TPU-executable.
    """
    j = np.arange(m)
    pre = np.exp(-2j * np.pi * (j + a) * b / m)
    k = np.arange(nout)
    post = np.exp(-2j * np.pi * k * a / m)
    pad = [(0, 0)] * (x.ndim - 1) + [(0, m - n)]
    xp = jnp.pad(x, pad)
    ar = xp * jnp.asarray(pre.real, dtype=x.dtype)
    ai = xp * jnp.asarray(pre.imag, dtype=x.dtype)
    Ar, Ai = sfft(ar, ai, m, inverse=False)
    Ar = Ar[..., :nout]
    Ai = Ai[..., :nout]
    pr = jnp.asarray(post.real, dtype=x.dtype)
    pi_ = jnp.asarray(post.imag, dtype=x.dtype)
    return Ar * pr - Ai * pi_, Ar * pi_ + Ai * pr
