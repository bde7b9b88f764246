"""Streaming REAL transforms (r2c / c2r / DCT-II / DCT-III) for the
huge-working-set regime — the round-5 answer to the structural 2x the
real transforms left on the table (round-4 verdict items 2-3): rfft
moved half the data of fft yet cost the same, because the XLA
formulations pay deinterleave + conjugate-mirror merge + interleave as
full HBM passes on top of a full-cost FFT.

Design: **batch-pair packing around the PERMUTED streaming kernel.**

* Two adjacent real batch rows become one complex row
  z = x[2p] + i*x[2p+1] — a reshape-slice (sublane-block addressing),
  zero data movement, where the half-length trick's stride-2 even/odd
  lane gather is a full relayout pass on TPU (RFFT_DIF_AB_r03).
  Classic two-for-one identity (reference r2c packing rfftf1_,
  /root/reference/cfftpack/fftpack.c:13517-13610).  The FFT work is
  therefore HALF of a batch-B complex transform.
* The pair runs through the PERMUTED stream kernel
  (ops/pallas_stream.py: natural in -> X[k2 + m*k1] at [row k2,
  lane k1]), skipping the kernel's natural-order output transpose.
* The conjugate-mirror merge U = (Z + conj(Zm))/2,
  V = -i(Z - conj(Zm))/2 (Zm_k = Z_{(n-k)%n}) runs as ONE fused XLA
  pass directly in the permuted layout — where the mirror is a sublane
  flip + lane flip + a row-0 lane rotate — composed with the
  un-permute transpose that natural-order output needs anyway.  Net
  HBM traffic ~ 4*B*n floats vs ~ 8*B*n for the complex kernel's
  natural path: rfft lands at half the complex cost, i.e. roofline-
  fraction PARITY with fft (the round-4 verdict item-1 bar).
* DCT-II rides the same pair kernel via the Makhoul permutation
  v = [x_even, reversed x_odd] (one fused XLA gather pass) and folds
  the phase rotation y_k = Re(ph_k * FFT(v)_k) into the merge pass;
  DCT-III mirrors it (phase + spectrum assembly in, inverse kernel,
  inverse Makhoul out).  Reference: cosqf1_/cosqb1_ fold pipelines,
  fftpack.c:5576-5741, re-derived as in dct.py _dct2_core/_dct3_core.

Why the merge is NOT inside the Pallas kernel (measured/API wall,
round 5): Mosaic has no `rev` lowering at all — even sublane reversal
of a (m, 128) tile is rejected (NotImplementedError: rev), pltpu.roll
requires stride_axis != axis so a strided roll cannot synthesize a
reversal, and an MXU row-mirror permutation matrix costs m^2*128
MACs/plane (~0.5 ms at m=512, b=256 — larger than the whole
transform).  A fully-fused kernel (merge + Nyquist-stash packing in
VMEM, interpret-mode-verified) was built and abandoned on this wall;
revisit if Mosaic grows `rev`/gather.  See BASELINE.md "Real stream
pipeline".

Eligibility: f32, even flat batch, and stream-kernel-eligible n
(n = 128*m, m a 5-smooth multiple of 16, m <= 4096).  Parity targets:
rfft_forward/rfft_inverse (cfftpack.c:433-494), dct/dct_inverse
(cfftpack.c:155-221).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .pallas_stream import _MAX_M, _N1, _stage_plan, _stream_pallas_2d

__all__ = ["rstream_eligible", "srfft_stream_pallas",
           "sirfft_stream_pallas", "sdct2_stream_pallas",
           "sdct3_stream_pallas"]

_H = _N1 // 2            # 64: lower-half lane region of the spectrum


def rstream_eligible(n: int, dtype, flat_batch: int) -> bool:
    """Gate shared by every real stream path: pairable batch + a
    stream-eligible transform length."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if flat_batch % 2 or flat_batch < 2:
        return False
    return (n % _N1 == 0 and n // _N1 <= _MAX_M
            and _stage_plan(n // _N1) is not None)


def _mirror_perm(t):
    """XLA conjugate-mirror index map on a permuted (P, m, 128) plane:
    out[k2, k1] = t[(m - k2) % m, lane], lane = (128 - k1) % 128 on
    row 0 and 127 - k1 elsewhere.

    The lane rotate is applied to the SINGLE self-mirror row only (a
    1-row slice): a where/select formulation was measured 2-3x worse
    end-to-end (RSTREAM_AB_r05 ab_v2 leg) because both select branches
    materialize and the row-0 branch lane-rotates the WHOLE plane."""
    R = t[:, ::-1, ::-1]                       # rows m-1..0, lanes flipped
    r0 = jnp.roll(R[:, -1:], 1, axis=2)        # row 0: lane (128-k1)%128
    return jnp.concatenate([r0, R[:, :-1]], axis=1)


def _merge_uv(Zr, Zi):
    """Permuted pair spectrum -> (U, V) full permuted spectra of the
    two real rows: U = (Z + conj(Zm))/2, V = -i(Z - conj(Zm))/2."""
    Zmr = _mirror_perm(Zr)
    Zmi = _mirror_perm(Zi)
    Ur = 0.5 * (Zr + Zmr)
    Ui = 0.5 * (Zi - Zmi)
    Vr = 0.5 * (Zi + Zmi)
    Vi = 0.5 * (Zmr - Zr)
    return Ur, Ui, Vr, Vi


def _nat_low(t, m):
    """Permuted plane -> natural bins 0..n/2-1 (lanes < 64 hold every
    bin k = k2 + m*k1 below Nyquist)."""
    P = t.shape[0]
    return jnp.swapaxes(t[:, :, :_H], 1, 2).reshape(P, _H * m)


@functools.partial(jax.jit, static_argnums=(1,))
def _rfft_stream(x, n: int):
    """(B, n) real, B even -> natural packed (B, n//2+1) split pair."""
    m = n // _N1
    x3 = x.reshape(-1, 2, m, _N1)
    Zr, Zi = _stream_pallas_2d(x3[:, 0], x3[:, 1], n, False)
    Ur, Ui, Vr, Vi = _merge_uv(Zr, Zi)
    nyq_r = jnp.stack([Ur[:, 0, _H], Vr[:, 0, _H]], axis=1)[..., None]
    lows = [_nat_low(t, m) for t in (Ur, Vr, Ui, Vi)]
    yr = jnp.concatenate(
        [jnp.stack(lows[:2], axis=1), nyq_r], axis=-1)
    yi = jnp.concatenate(
        [jnp.stack(lows[2:], axis=1), jnp.zeros_like(nyq_r)], axis=-1)
    # imag(DC) is (Zi - Zmi)/2 at the self-mirror bin 0 — an exact a-a
    # zero, preserving the packed contract (cfftpack.c:466-471)
    B = x.shape[0]
    return yr.reshape(B, -1), yi.reshape(B, -1)


@functools.partial(jax.jit, static_argnums=(2,))
def _irfft_stream(yr, yi, n: int):
    """Natural packed (B, n//2+1) split pair -> (B, n) real * n."""
    m = n // _N1
    h = n // 2
    ar = yr.reshape(-1, 2, h + 1)
    ai = yi.reshape(-1, 2, h + 1)
    Ur, Vr = ar[:, 0], ar[:, 1]
    Ui, Vi = ai[:, 0], ai[:, 1]
    # natural full Z: bins 0..h then the conjugate tail (slice+flip
    # fuses into the assembly; same math as core._sirfft_batchpair)
    Zr_low = Ur - Vi
    Zi_low = Ui + Vr
    Zr_hi = Ur[:, 1:h][:, ::-1] + Vi[:, 1:h][:, ::-1]
    Zi_hi = Vr[:, 1:h][:, ::-1] - Ui[:, 1:h][:, ::-1]
    Zr = jnp.concatenate([Zr_low, Zr_hi], axis=-1)
    Zi = jnp.concatenate([Zi_low, Zi_hi], axis=-1)
    # natural -> permuted tiles: flat k = k2 + m*k1 is the (128, m)
    # row-major view transposed
    Zr = jnp.swapaxes(Zr.reshape(-1, _N1, m), 1, 2)
    Zi = jnp.swapaxes(Zi.reshape(-1, _N1, m), 1, 2)
    zr, zi = _stream_pallas_2d(Zr, Zi, n, True)
    out = jnp.stack([zr, zi], axis=1)                # (P, 2, m, 128)
    return out.reshape(-1, n)


def srfft_stream_pallas(x, n: int):
    """core.srfft contract (unscaled r2c, natural packed n//2+1 bins)
    via the batch-pair streaming kernel.  Requires rstream_eligible."""
    lead = x.shape[:-1]
    yr, yi = _rfft_stream(x.reshape(-1, n), n)
    h1 = n // 2 + 1
    return yr.reshape(lead + (h1,)), yi.reshape(lead + (h1,))


def sirfft_stream_pallas(yr, yi, n: int):
    """core.sirfft contract (unscaled c2r: returns n * x)."""
    lead = yr.shape[:-1]
    out = _irfft_stream(yr.astype(jnp.float32).reshape(-1, n // 2 + 1),
                        yi.astype(jnp.float32).reshape(-1, n // 2 + 1),
                        n)
    return out.reshape(lead + (n,)).astype(yr.dtype)


# ------------------------------------------------- DCT-II / DCT-III

@functools.lru_cache(maxsize=32)
def _dct_phase_perm(n: int):
    """ph_k = exp(-i pi k / (2n)) laid out in the permuted (k2, k1)
    tile, host f64 -> f32 planes."""
    m = n // _N1
    k2 = np.arange(m)[:, None]
    k1 = np.arange(_N1)[None, :]
    ph = np.exp(-1j * np.pi * (k2 + m * k1) / (2 * n))
    return ph.real.astype(np.float32), ph.imag.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1,))
def _dct2_stream(x, n: int):
    """(B, n) real, B even -> unscaled DCT-II, natural order."""
    m = n // _N1
    B = x.shape[0]
    # Makhoul permutation v = [x_even, reversed x_odd] (one gather
    # pass; the kernel's BlockSpec cannot express element gathers and
    # Mosaic has no in-kernel rev — see module docstring)
    v = jnp.concatenate([x[:, 0::2], x[:, 1::2][:, ::-1]], axis=-1)
    v3 = v.reshape(-1, 2, m, _N1)
    Zr, Zi = _stream_pallas_2d(v3[:, 0], v3[:, 1], n, False)
    Ur, Ui, Vr, Vi = _merge_uv(Zr, Zi)
    phr, phi = (jnp.asarray(t) for t in _dct_phase_perm(n))
    yU = Ur * phr - Ui * phi                 # Re(ph * U), all n bins
    yV = Vr * phr - Vi * phi
    # permuted -> natural: flat bin k = k2 + m*k1 = (128, m) view^T
    out = jnp.stack([jnp.swapaxes(yU, 1, 2), jnp.swapaxes(yV, 1, 2)],
                    axis=1)
    return out.reshape(B, n)


@functools.partial(jax.jit, static_argnums=(1,))
def _dct3_stream(y, n: int):
    """(B, n), B even -> unscaled DCT-III (dct.py _dct3_core
    semantics), natural order."""
    m = n // _N1
    B = y.shape[0]
    rt2 = float(np.sqrt(2.0))
    # natural -> permuted tiles (free view + transpose pass, fused
    # with the phase/assembly FMAs below)
    y3 = y.reshape(-1, 2, _N1, m)
    yU = jnp.swapaxes(y3[:, 0], 1, 2)
    yV = jnp.swapaxes(y3[:, 1], 1, 2)
    phr, phi = (jnp.asarray(t) for t in _dct_phase_perm(n))
    row0 = (jax.lax.broadcasted_iota(jnp.int32, (1, m, _N1), 1) == 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, m, _N1), 2)
    dc = row0 & (lane == 0)
    ny = row0 & (lane == _H)

    def spectrum(t):
        # w_k = ph_k U_k has y_k = Re(w_k), y_{n-k} = -Im(w_k), so
        # U_k = conj(ph_k)(y_k - i y_{(n-k)%n}); self-mirror fixups
        # U_0 = y_0, U_{n/2} = sqrt(2) y_{n/2}
        tm = _mirror_perm(t)
        Ur = t * phr - tm * phi
        Ui = -(t * phi + tm * phr)
        Ur = jnp.where(dc, t, jnp.where(ny, rt2 * t, Ur))
        Ui = jnp.where(dc | ny, 0.0, Ui)
        return Ur, Ui

    Ur, Ui = spectrum(yU)
    Vr, Vi = spectrum(yV)
    zr, zi = _stream_pallas_2d(Ur - Vi, Ui + Vr, n, True)
    # inverse pipeline returns n*v; dct3(dct2(x)) = (n/2) x -> halve,
    # then invert the Makhoul permutation (scatter = transposed gather)
    half = np.float32(0.5)
    v = jnp.stack([zr, zi], axis=1).reshape(B, n) * half
    h = n // 2
    out = jnp.zeros_like(v)
    out = out.at[:, 0::2].set(v[:, :h])
    out = out.at[:, 1::2].set(v[:, h:][:, ::-1])
    return out


def sdct2_stream_pallas(x, n: int):
    """dct._dct2_core contract (unscaled DCT-II, natural order) via the
    batch-pair streaming kernel.  Requires rstream_eligible."""
    lead = x.shape[:-1]
    out = _dct2_stream(x.reshape(-1, n).astype(jnp.float32), n)
    return out.reshape(lead + (n,)).astype(x.dtype)


def sdct3_stream_pallas(y, n: int):
    """dct._dct3_core contract (unscaled DCT-III, natural order)."""
    lead = y.shape[:-1]
    out = _dct3_stream(y.reshape(-1, n).astype(jnp.float32), n)
    return out.reshape(lead + (n,)).astype(y.dtype)
