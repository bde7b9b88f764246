"""Pallas TPU kernel: fused four-step FFT for large n (4096..262144).

The XLA path's throughput decays with stage count (measured v5e: 0.83
of HBM roofline at n=1024, 0.41 at 4096, 0.06 at 65536 — every stage
materializes to HBM).  This kernel runs whole transforms per grid
step inside VMEM, one read + one write of the (re, im) planes.

Mosaic-driven design (every op keeps the lane dim intact — the
round-1 fused kernel lost 2.3x to relayouts from lane-crossing
reshapes and sub-8 sublane tiles):

* the caller lane-PAIRS transforms on the XLA side: a tile holds T
  pairs as (T, n2, 128) with j2 in sublanes and lanes = [t0: k1<64 |
  t1: k1>=64].  T*n2 is sized ~4096 rows so the MXU and DMA engines
  see large operations, not per-transform crumbs;
* stage A (dense n1-DFT over j1, lanes) is ONE right-multiplication
  (T*n2, 128) @ blockdiag(D64^T, D64^T) — lanes contract on the MXU,
  no transpose anywhere in the kernel;
* outer twiddle e^{sgn 2i pi k1 j2/n} as a lane-paired (n2, 128)
  VMEM-resident table, broadcast over T;
* stage B (the n2-point FFT) runs over SUBLANE rows: Stockham radix-4
  stages while the intra-block length m > 16 (all reshapes split or
  merge sublane dims only), then one unrolled 16-point DFT tail on
  16 row-slices — late Stockham stages with mn < 8 are exactly the
  sub-vreg tiles Mosaic pads 8x, so they are never materialized;
* Stockham autosorts: output rows are natural k2 order, lanes are k1;
  the (B, n2, n1) output reshapes to natural-order (B, n) for free in
  XLA (k = k1 + n1*k2).

All dots run precision=HIGHEST (the v5e MXU otherwise multiplies f32
as bf16).  In-core ancestor: cfft2f_'s row-column pass
(/root/reference/cfftpack/fftpack.c:2363-2434); the stage loop is the
c1fm1f_ analog (fftpack.c:2041-2142) with wsave tables pre-broadcast
across lanes.

Eligibility: f32, n = 64 * n2 with n2 in {64, 256, 1024, 4096} —
i.e. n in {4096, 16384, 65536, 262144}.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import plan

__all__ = ["fourstep_pallas_eligible", "sfft_fourstep_pallas"]

_N1 = 64
_LANES = 128
_TAIL = 16
_ROW_BUDGET = 4096            # ~ rows of 128 lanes per grid step
_HI = dict(precision=jax.lax.Precision.HIGHEST,
           preferred_element_type=jnp.float32)


def _stageb_plan(n2: int) -> int | None:
    """Number of radix-4 Stockham stages before the DFT-16 tail, or
    None if n2 is not 16 * 4^k."""
    s, m = 0, n2
    while m > _TAIL:
        if m % 4:
            return None
        m //= 4
        s += 1
    return s if m == _TAIL else None


def _tile_pairs(n2: int) -> int:
    return max(1, min(32, _ROW_BUDGET // n2))


def fourstep_pallas_eligible(n: int, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if n % _N1 != 0:
        return False
    n2 = n // _N1
    # n2 > 4096 exceeds the comfortable VMEM tile
    return n2 <= 4096 and _stageb_plan(n2) is not None


def _w(m: int, k: int, sign: float) -> complex:
    return complex(np.exp(sign * 2j * np.pi * k / m))


def _dft4(xs, sign: float):
    """4-point DFT of [(re, im)] pairs."""
    (a_r, a_i), (b_r, b_i), (c_r, c_i), (d_r, d_i) = xs
    t0r, t0i = a_r + c_r, a_i + c_i
    t1r, t1i = a_r - c_r, a_i - c_i
    t2r, t2i = b_r + d_r, b_i + d_i
    t3r = -sign * (b_i - d_i)
    t3i = sign * (b_r - d_r)
    return [(t0r + t2r, t0i + t2i), (t1r + t3r, t1i + t3i),
            (t0r - t2r, t0i - t2i), (t1r - t3r, t1i - t3i)]


def _dft16_rows(rows, sign: float):
    """16-point DFT of 16 (re, im) row pairs, radix-4 x 4 unrolled."""
    A = [_dft4([rows[4 * j1 + j0] for j1 in range(4)], sign)
         for j0 in range(4)]
    out = [None] * 16
    for q in range(4):
        col = []
        for j0 in range(4):
            w = _w(16, j0 * q, sign)
            ar, ai = A[j0][q]
            col.append((ar * w.real - ai * w.imag,
                        ar * w.imag + ai * w.real))
        B = _dft4(col, sign)
        for t in range(4):
            out[q + 4 * t] = B[t]
    return out


def _make_kernel(n: int, inverse: bool):
    n2 = n // _N1
    nstage = _stageb_plan(n2)
    T = _tile_pairs(n2)
    sign = 1.0 if inverse else -1.0

    def kernel(xr_ref, xi_ref, t1r_ref, t1i_ref, dr_ref, di_ref,
               twr_ref, twi_ref, or_ref, oi_ref):
        # ---- stage A: ONE blockdiag(D^T, D^T) right-multiplication
        DrT = dr_ref[:]                       # (128, 128)
        DiT = di_ref[:]
        Xr = xr_ref[:].reshape(T * n2, _LANES)
        Xi = xi_ref[:].reshape(T * n2, _LANES)
        Ar = jnp.dot(Xr, DrT, **_HI) - jnp.dot(Xi, DiT, **_HI)
        Ai = jnp.dot(Xr, DiT, **_HI) + jnp.dot(Xi, DrT, **_HI)
        # outer twiddle (lane-paired, broadcast over T)
        t1r = t1r_ref[:][None]                # (1, n2, 128)
        t1i = t1i_ref[:][None]
        A3r = Ar.reshape(T, n2, _LANES)
        A3i = Ai.reshape(T, n2, _LANES)
        sr = A3r * t1r - A3i * t1i
        si = A3r * t1i + A3i * t1r

        # ---- stage B: n2-point FFT over sublane rows (Stockham)
        L, m = 1, n2
        off = 0
        for _ in range(nstage):
            mn = m // 4
            Tr = sr.reshape(T, L, 4, mn, _LANES)
            Ti = si.reshape(T, L, 4, mn, _LANES)
            R = [Tr[:, :, j] for j in range(4)]
            I = [Ti[:, :, j] for j in range(4)]
            ar, ai = R[0] + R[2], I[0] + I[2]
            br, bi = R[0] - R[2], I[0] - I[2]
            cr, ci = R[1] + R[3], I[1] + I[3]
            dr_ = -sign * (I[1] - I[3])
            di_ = sign * (R[1] - R[3])
            Ur = jnp.stack([ar + cr, br + dr_, ar - cr, br - dr_],
                           axis=2)
            Ui = jnp.stack([ai + ci, bi + di_, ai - ci, bi - di_],
                           axis=2)
            twr = twr_ref[off: off + 4 * mn, :].reshape(
                1, 1, 4, mn, _LANES)
            twi = twi_ref[off: off + 4 * mn, :].reshape(
                1, 1, 4, mn, _LANES)
            Vr = Ur * twr - Ui * twi
            Vi = Ur * twi + Ui * twr
            # Stockham store: (T, L, p, mn) -> (T, p, L, mn)
            sr = Vr.swapaxes(1, 2).reshape(T, 4 * L * mn, _LANES)
            si = Vi.swapaxes(1, 2).reshape(T, 4 * L * mn, _LANES)
            off += 4 * mn
            L *= 4
            m = mn

        # ---- DFT-16 tail on contiguous 16-row blocks
        Tr = sr.reshape(T, L, _TAIL, _LANES)
        Ti = si.reshape(T, L, _TAIL, _LANES)
        rows = [(Tr[:, :, j], Ti[:, :, j]) for j in range(_TAIL)]
        outs = _dft16_rows(rows, sign)
        # final Stockham store: rows k16*L + l
        sr = jnp.stack([o[0] for o in outs], axis=1).reshape(
            T, _TAIL * L, _LANES)
        si = jnp.stack([o[1] for o in outs], axis=1).reshape(
            T, _TAIL * L, _LANES)
        or_ref[:] = sr
        oi_ref[:] = si

    return kernel, T


@functools.lru_cache(maxsize=64)
def _tables(n: int, inverse: bool):
    """Lane-paired outer twiddle, blockdiag D64^T, stage tables."""
    n2 = n // _N1
    sgn = 2j * np.pi if inverse else -2j * np.pi
    k1 = np.arange(_N1)[None, :]
    j2 = np.arange(n2)[:, None]
    t1 = np.exp(sgn * k1 * j2 / n)                      # (n2, 64)
    t1 = np.concatenate([t1, t1], axis=1)               # lane-paired
    D = plan.dft_matrix(_N1)
    if inverse:
        D = np.conj(D)
    DT = D.T
    BD = np.zeros((_LANES, _LANES), np.complex128)
    BD[:_N1, :_N1] = DT
    BD[_N1:, _N1:] = DT
    parts = []
    m = n2
    while m > _TAIL:
        mn = m // 4
        q = np.arange(4)[:, None]
        j = np.arange(mn)[None, :]
        tw = np.exp(sgn * q * j / m).reshape(4 * mn, 1)
        parts.append(np.repeat(tw, _LANES, axis=1))
        m = mn
    flat = (np.concatenate(parts, axis=0) if parts
            else np.zeros((1, _LANES), np.complex128))
    f32 = np.float32
    return (t1.real.astype(f32), t1.imag.astype(f32),
            BD.real.astype(f32), BD.imag.astype(f32),
            flat.real.astype(f32), flat.imag.astype(f32))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _fourstep_pallas_2d(xr, xi, n: int, inverse: bool):
    b = xr.shape[0]
    n2 = n // _N1
    T = _tile_pairs(n2)
    bp = -(-b // (2 * T)) * (2 * T)
    if bp != b:
        xr = jnp.pad(xr, ((0, bp - b), (0, 0)))
        xi = jnp.pad(xi, ((0, bp - b), (0, 0)))
    # lane-paired transposed feed: (bp/2, n2, 128), lanes = [t0|t1] k1
    def prep(v):
        v = v.reshape(bp // 2, 2, _N1, n2)
        v = jnp.transpose(v, (0, 3, 1, 2))              # (b2, n2, 2, 64)
        return v.reshape(bp // 2, n2, _LANES)
    x3r = prep(xr)
    x3i = prep(xi)
    kernel, _ = _make_kernel(n, inverse)
    tabs = [jnp.asarray(t) for t in _tables(n, inverse)]
    interp = jax.default_backend() != "tpu"
    ms = pl.ANY if interp else pltpu.VMEM
    blk = pl.BlockSpec((T, n2, _LANES), lambda i: (i, 0, 0),
                       memory_space=ms)
    tw = pl.BlockSpec(memory_space=ms)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(bp // (2 * T),),
        in_specs=[blk, blk] + [tw] * len(tabs),
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((bp // 2, n2, _LANES),
                                        xr.dtype)] * 2,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x3r, x3i, *tabs)
    # rows k2 natural, lanes [t0|t1] k1: flat [k2, k1] row-major is
    # exactly k = k1 + 64*k2 per transform
    def unprep(v):
        v = v.reshape(bp // 2, n2, 2, _N1)
        v = jnp.transpose(v, (0, 2, 1, 3))              # (b2, 2, n2, 64)
        return v.reshape(bp, n)[:b]
    return unprep(yr), unprep(yi)


def sfft_fourstep_pallas(xr, xi, n: int, inverse: bool):
    """Unscaled DFT over the last axis via the fused four-step kernel.

    Same contract as core.sfft; caller guarantees eligibility.
    """
    shape = xr.shape
    yr, yi = _fourstep_pallas_2d(xr.reshape(-1, n), xi.reshape(-1, n),
                                 n, inverse)
    return yr.reshape(shape), yi.reshape(shape)
