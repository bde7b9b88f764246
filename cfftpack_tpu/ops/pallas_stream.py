"""Pallas TPU kernel: streaming four-step FFT for the huge-working-set
regime (total elements >= ~2^23, n >= 2048 power-of-two).

Round-2 findings (BASELINE.md "Pallas kernel findings"): the shipped
fourstep kernel (ops/pallas_fourstep.py) keeps whole transforms
VMEM-resident but (a) pays TWO full XLA-side HBM transpose passes to
lane-pair its (n2, 128) feed, and (b) its stage body materializes a
stack + swapaxes relayout copy per radix-4 stage.  This kernel is the
round-3 redesign for the regime where the XLA engines collapse to a
sequential lax.map (0.07-0.21 of roofline, BASELINE.md dispatch grid):

* **Natural-layout feed, zero prep passes.**  Decimate j = 128*q + r:
  ``x.reshape(b, m, 128)`` puts r in LANES and q in sublanes with no
  data movement.  The four-step identity (reference 2-D driver
  cfft2f_, /root/reference/cfftpack/fftpack.c:2363-2434, re-derived
  for this layout):

      X[k2 + m*k1] = sum_r W_128^{r k1} * W_n^{r k2}
                     * (sum_q x[q, r] W_m^{q k2})

  - inner m-point DFT over SUBLANES (per lane, Stockham radix-4 with
    an optional lead radix-2 and an unrolled DFT-16 tail — the
    Mosaic-legal stage bodies of the round-2 kernel);
  - outer twiddle = one (m, 128) VMEM table multiply;
  - outer 128-point DFT = ONE full-width (bt*m, 128) @ D128 MXU
    contraction over lanes (precision=HIGHEST).

* **Streaming grid.** The grid walks batch tiles of bt transforms;
  Pallas's grid pipeline double-buffers the HBM->VMEM input DMA and
  the VMEM->HBM output DMA against the stage bodies, so butterflies
  hide behind the next tile's DMA (the VERDICT round-3 item-1 shape).

* **One VMEM pass per stage.** Twiddles are folded into the butterfly
  outputs BEFORE the Stockham store and the store stacks directly at
  the output-digit axis (axis 1) — no separate twiddle pass and no
  swapaxes relayout (two of the three per-stage VMEM copies of the
  round-2 kernel).

Output layout is PERMUTED: out[b, k2, k1] = X[k2 + m*k1] (rows k2,
lanes k1).  The inverse kernel consumes exactly this layout and emits
natural order, so fwd+filter+inv pipelines run with ZERO transposes
end-to-end.  Natural-order one-way entries (``sfft_stream_pallas``)
use the fwd_nat/inv_nat kernel variants, which fold the
permuted<->natural transpose into the kernel's VMEM instead of an XLA
HBM pass (~8-9% on natural roundtrips, STREAM_NAT_r05).

Eligibility: f32 planes, n = 128 * m with m a 5-smooth multiple of
16 (every power-of-two n >= 2048, plus 3/5-mixed sizes like 98304,
163840, 245760 — radix-3/5 row stages run first).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import plan
from .core import _C5_1, _C5_2, _S5_1, _S5_2, _SQ3_2
from .pallas_fourstep import _dft16_rows

__all__ = ["stream_pallas_eligible", "sfft_stream_pallas",
           "sfft_stream_pallas_permuted", "sfilter_stream_pallas",
           "mm2_eligible", "sfft_mm2_pallas", "sfft_mm2_pallas_permuted"]

_N1 = 128          # lanes = outer DFT length
_TAIL = 16
_ROW_BUDGET = 4096  # sublane rows (bt * m) per grid step
_ROW_BUDGET_BIG_M = 2048  # smaller tiles for m >= 1024 (see _tile_batch)
_MAX_M = 4096       # largest whole-transform row count that fits VMEM:
                    # m = 8192 (n = 2^20) needs 156.5M of the chip's
                    # 128M (double-buffered in/out windows + twiddle
                    # tables + stage copies — compile error recorded in
                    # BASELINE.md); m = 4096 compiles and wins on v5e
_HI = dict(precision=jax.lax.Precision.HIGHEST,
           preferred_element_type=jnp.float32)


def _stage_plan(m: int):
    """Radix schedule (list of stage radixes, tail-16 excluded) for
    m = 16 * 2^a * 3^b * 5^c (any 5-smooth multiple of 16), or None.
    Radix-16 middle stages (the same unrolled DFT-16 as the tail) are
    preferred for the power-of-two part: each stage pass materializes
    ONE stacked tile copy in VMEM regardless of radix, so fewer/fatter
    stages directly cut the kernel's dominant cost (stage-B VMEM
    passes; see BASELINE.md round-3 stream notes).  Odd radix-3/5
    stages run first (while rows are longest)."""
    if m < _TAIL or m % _TAIL:
        return None
    stages = []
    rest = m
    for p in (3, 5):
        while rest % p == 0:
            stages.append(p)
            rest //= p
    if rest < _TAIL or rest & (rest - 1):
        return None                      # non-5-smooth or tail too short
    t = rest.bit_length() - 1 - 4        # rest = 2^(t+4)
    if t % 2:
        stages.append(2)
        rest //= 2
    while rest > _TAIL:
        stages.append(16 if rest // 16 >= _TAIL else 4)
        rest //= stages[-1]
    return stages


def _tile_batch(m: int, rows: int = 0, b: int = 0) -> int:
    if not rows:
        # large-m transforms prefer SMALLER grid tiles: more grid
        # steps -> better DMA/compute overlap (STREAM65K_r05 rows
        # sweep at (131072, 64): bt2 355us vs default-bt4 839us;
        # confirmed within-run by the bt1 leg at 380us)
        rows = _ROW_BUDGET_BIG_M if m >= 1024 else _ROW_BUDGET
    bt = max(1, rows // m)
    # grid-step floor: below ~16 steps the double-buffered DMA cannot
    # hide behind the stage bodies and the default tile reads 2-5x
    # worse (STREAM65K_FWD_r05, both runs, (65536, 64): default-bt8 at
    # 8 steps worst leg; bt1/2/4 cluster ~300us).  Only kicks in at
    # small batch; (65536, 256) at 32 steps measured flat-to-worse
    # with smaller tiles and keeps the plain budget.
    if b and bt > 1 and b // bt < 16:
        bt = max(1, -(-b // 16))
    return bt


def stream_pallas_eligible(n: int, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return (n % _N1 == 0 and n // _N1 <= _MAX_M
            and _stage_plan(n // _N1) is not None)


@functools.lru_cache(maxsize=64)
def _tables(n: int, inverse: bool):
    """Host f64 tables: D128 (symmetric, conj for inverse), outer
    twiddle W_n^{r k2} as (m, 128), and the per-stage Stockham twiddles
    flattened to one (rows, 128) array (q-major per stage, lead radix-2
    first), all pre-broadcast across lanes (Mosaic rejects lane
    broadcasts of (x, 1) tables)."""
    m = n // _N1
    sgn = 2j * np.pi if inverse else -2j * np.pi
    D = plan.dft_matrix(_N1)
    if inverse:
        D = np.conj(D)
    k2 = np.arange(m)[:, None]
    r = np.arange(_N1)[None, :]
    t1 = np.exp(sgn * k2 * r / n)                       # (m, 128)
    parts = []
    mm = m
    for p in _stage_plan(m):
        mn = mm // p
        j = np.arange(mn)[None, :]
        tw = np.exp(sgn * np.arange(p)[:, None] * j / mm)   # (p, mn)
        parts.append(np.repeat(tw.reshape(p * mn, 1), _N1, axis=1))
        mm = mn
    flat = (np.concatenate(parts, axis=0) if parts
            else np.zeros((1, _N1), np.complex128))
    f32 = np.float32
    return (D.real.astype(f32), D.imag.astype(f32),
            t1.real.astype(f32), t1.imag.astype(f32),
            flat.real.astype(f32), flat.imag.astype(f32))


def _stockham_rows(sr, si, bt: int, m: int, sign: float,
                   twr_ref, twi_ref, lanes: int = _N1):
    """m-point DFT over axis 1 of (bt, m, lanes) planes: Stockham with
    radix-16 middle stages (unrolled DFT-16, same as the tail),
    radix-4/2 fill-in, twiddles fused pre-store, DFT-16 tail.  One
    stack per stage, no swapaxes.  ``lanes`` defaults to the stream
    kernel's 128; the column kernel passes wider blocks (its DMA rows
    are strided, so wider lane tiles amortize the stride —
    COL_LANES_AB_r05)."""
    L, mm, off = 1, m, 0

    def tw(q, mn):
        lo = off + q * mn
        return (twr_ref[lo: lo + mn, :][None, None],
                twi_ref[lo: lo + mn, :][None, None])

    for p in _stage_plan(m):
        mn = mm // p
        Tr = sr.reshape(bt, L, p, mn, lanes)
        Ti = si.reshape(bt, L, p, mn, lanes)
        R = [Tr[:, :, j] for j in range(p)]
        I = [Ti[:, :, j] for j in range(p)]
        if p == 2:
            u = [(R[0] + R[1], I[0] + I[1]), (R[0] - R[1], I[0] - I[1])]
        elif p == 3:
            tr3, ti3 = R[1] + R[2], I[1] + I[2]
            dr3, di3 = R[1] - R[2], I[1] - I[2]
            m1r = R[0] - 0.5 * tr3
            m1i = I[0] - 0.5 * ti3
            m2r = -(sign * _SQ3_2) * di3
            m2i = (sign * _SQ3_2) * dr3
            u = [(R[0] + tr3, I[0] + ti3), (m1r + m2r, m1i + m2i),
                 (m1r - m2r, m1i - m2i)]
        elif p == 5:
            t1r, t1i = R[1] + R[4], I[1] + I[4]
            t2r, t2i = R[2] + R[3], I[2] + I[3]
            t3r, t3i = R[1] - R[4], I[1] - I[4]
            t4r, t4i = R[2] - R[3], I[2] - I[3]
            a1r = R[0] + _C5_1 * t1r + _C5_2 * t2r
            a1i = I[0] + _C5_1 * t1i + _C5_2 * t2i
            a2r = R[0] + _C5_2 * t1r + _C5_1 * t2r
            a2i = I[0] + _C5_2 * t1i + _C5_1 * t2i
            b1r = -sign * (_S5_1 * t3i + _S5_2 * t4i)
            b1i = sign * (_S5_1 * t3r + _S5_2 * t4r)
            b2r = -sign * (_S5_2 * t3i - _S5_1 * t4i)
            b2i = sign * (_S5_2 * t3r - _S5_1 * t4r)
            u = [(R[0] + t1r + t2r, I[0] + t1i + t2i),
                 (a1r + b1r, a1i + b1i), (a2r + b2r, a2i + b2i),
                 (a2r - b2r, a2i - b2i), (a1r - b1r, a1i - b1i)]
        elif p == 4:
            ar, ai = R[0] + R[2], I[0] + I[2]
            br, bi = R[0] - R[2], I[0] - I[2]
            cr, ci = R[1] + R[3], I[1] + I[3]
            dr_ = -sign * (I[1] - I[3])
            di_ = sign * (R[1] - R[3])
            u = [(ar + cr, ai + ci), (br + dr_, bi + di_),
                 (ar - cr, ai - ci), (br - dr_, bi - di_)]
        else:
            u = _dft16_rows(list(zip(R, I)), sign)
        outs_r, outs_i = [u[0][0]], [u[0][1]]       # q=0: twiddle 1
        for q in range(1, p):
            wr, wi = tw(q, mn)
            ur, ui = u[q]
            outs_r.append(ur * wr - ui * wi)
            outs_i.append(ur * wi + ui * wr)
        # Stockham store: output digit q is the MSD -> stack at axis 1
        sr = jnp.stack(outs_r, axis=1).reshape(bt, p * L * mn, lanes)
        si = jnp.stack(outs_i, axis=1).reshape(bt, p * L * mn, lanes)
        off += p * mn
        L *= p
        mm = mn

    Tr = sr.reshape(bt, L, _TAIL, lanes)
    Ti = si.reshape(bt, L, _TAIL, lanes)
    rows = [(Tr[:, :, j], Ti[:, :, j]) for j in range(_TAIL)]
    outs = _dft16_rows(rows, sign)
    sr = jnp.stack([o[0] for o in outs], axis=1).reshape(bt, m, lanes)
    si = jnp.stack([o[1] for o in outs], axis=1).reshape(bt, m, lanes)
    return sr, si


def _make_kernel(n: int, inverse: bool, bt: int):
    m = n // _N1
    # inverse may be a mode string: "filter"/"inv_nat" are inverse-sign,
    # "fwd_nat" is forward-sign (natural-layout DMA variants)
    sign = -1.0 if inverse in (False, "fwd_nat") else 1.0

    def _cdot128(Yr, Yi, Dr, Di):
        """Complex (rows, 128) @ (128, 128) in THREE real MXU dots
        (Karatsuba: M3 = (Yr+Yi)(Dr+Di)) — 25% less MXU work than the
        4-dot form; stage A is the kernel's dominant FLOP term."""
        M1 = jnp.dot(Yr, Dr, **_HI)
        M2 = jnp.dot(Yi, Di, **_HI)
        M3 = jnp.dot(Yr + Yi, Dr + Di, **_HI)
        return M1 - M2, M3 - M1 - M2

    def fwd_kernel(xr_ref, xi_ref, dr_ref, di_ref, t1r_ref, t1i_ref,
                   twr_ref, twi_ref, or_ref, oi_ref):
        # inner m-DFT over sublanes (natural rows q -> bins k2)
        sr, si = _stockham_rows(xr_ref[:], xi_ref[:], bt, m, sign,
                                twr_ref, twi_ref)
        # outer twiddle W_n^{r k2}
        t1r = t1r_ref[:][None]
        t1i = t1i_ref[:][None]
        yr = sr * t1r - si * t1i
        yi = sr * t1i + si * t1r
        # outer DFT-128: contract LANES on the MXU (D symmetric)
        Zr, Zi = _cdot128(yr.reshape(bt * m, _N1),
                          yi.reshape(bt * m, _N1),
                          dr_ref[:], di_ref[:])
        or_ref[:] = Zr.reshape(bt, m, _N1)
        oi_ref[:] = Zi.reshape(bt, m, _N1)

    def _inv_body(xr, xi, dr_ref, di_ref, t1r_ref, t1i_ref,
                  twr_ref, twi_ref, or_ref, oi_ref):
        # reverse pipeline: outer DFT-128 first (permuted layout in)
        Yr, Yi = _cdot128(xr.reshape(bt * m, _N1),
                          xi.reshape(bt * m, _N1),
                          dr_ref[:], di_ref[:])
        yr = Yr.reshape(bt, m, _N1)
        yi = Yi.reshape(bt, m, _N1)
        t1r = t1r_ref[:][None]
        t1i = t1i_ref[:][None]
        sr = yr * t1r - yi * t1i
        si = yr * t1i + yi * t1r
        sr, si = _stockham_rows(sr, si, bt, m, sign, twr_ref, twi_ref)
        or_ref[:] = sr
        oi_ref[:] = si

    def inv_kernel(xr_ref, xi_ref, dr_ref, di_ref, t1r_ref, t1i_ref,
                   twr_ref, twi_ref, or_ref, oi_ref):
        _inv_body(xr_ref[:], xi_ref[:], dr_ref, di_ref, t1r_ref,
                  t1i_ref, twr_ref, twi_ref, or_ref, oi_ref)

    def filter_inv_kernel(xr_ref, xi_ref, dr_ref, di_ref, t1r_ref,
                          t1i_ref, twr_ref, twi_ref, fr_ref, fi_ref,
                          or_ref, oi_ref):
        # spectral multiply fused into the inverse prologue: the filter
        # tables arrive in the SAME permuted (k2, k1) layout as the
        # forward kernel's output — (1, m, 128) blocks broadcasting
        # over the batch tile — so the whole fwd+filter+inv pipeline
        # runs with zero transposes and zero standalone FMA passes
        fr = fr_ref[:]
        fi = fi_ref[:]
        xr = xr_ref[:]
        xi = xi_ref[:]
        _inv_body(xr * fr - xi * fi, xr * fi + xi * fr, dr_ref, di_ref,
                  t1r_ref, t1i_ref, twr_ref, twi_ref, or_ref, oi_ref)

    def fwd_nat_kernel(xr_ref, xi_ref, dr_ref, di_ref, t1r_ref,
                       t1i_ref, twr_ref, twi_ref, or_ref, oi_ref):
        # same pipeline, but the un-permute transpose happens IN VMEM
        # and the output DMA writes natural order directly — saving the
        # XLA transpose pass (a full HBM read+write) that
        # sfft_stream_pallas otherwise pays (STREAM_NAT_r05 A/B)
        sr, si = _stockham_rows(xr_ref[:], xi_ref[:], bt, m, sign,
                                twr_ref, twi_ref)
        t1r = t1r_ref[:][None]
        t1i = t1i_ref[:][None]
        yr = sr * t1r - si * t1i
        yi = sr * t1i + si * t1r
        Zr, Zi = _cdot128(yr.reshape(bt * m, _N1),
                          yi.reshape(bt * m, _N1),
                          dr_ref[:], di_ref[:])
        or_ref[:] = jnp.swapaxes(Zr.reshape(bt, m, _N1), 1, 2)
        oi_ref[:] = jnp.swapaxes(Zi.reshape(bt, m, _N1), 1, 2)

    def inv_nat_kernel(xr_ref, xi_ref, dr_ref, di_ref, t1r_ref,
                       t1i_ref, twr_ref, twi_ref, or_ref, oi_ref):
        # natural (bt, 128, m) in -> permute in VMEM -> inverse pipeline
        _inv_body(jnp.swapaxes(xr_ref[:], 1, 2),
                  jnp.swapaxes(xi_ref[:], 1, 2), dr_ref, di_ref,
                  t1r_ref, t1i_ref, twr_ref, twi_ref, or_ref, oi_ref)

    if inverse == "filter":
        return filter_inv_kernel
    if inverse == "inv_nat":
        return inv_nat_kernel
    if inverse == "fwd_nat":
        return fwd_nat_kernel
    return inv_kernel if inverse else fwd_kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _stream_pallas_2d(xr, xi, n: int, inverse: bool, rows: int = 0):
    """(b, m, 128) planes -> (b, m, 128) planes.  Forward: natural rows
    in, permuted (k2, k1) out.  Inverse: permuted in, natural out.
    ``rows`` overrides the per-grid-step sublane-row budget (0 = the
    measured default _ROW_BUDGET)."""
    b = xr.shape[0]
    m = n // _N1
    bt = _tile_batch(m, rows, b)
    bp = -(-b // bt) * bt
    if bp != b:
        pad = ((0, bp - b), (0, 0), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
    kernel = _make_kernel(n, inverse, bt)
    tabs = [jnp.asarray(t) for t in _tables(n, inverse)]
    interp = jax.default_backend() != "tpu"
    ms = pl.ANY if interp else pltpu.VMEM
    blk = pl.BlockSpec((bt, m, _N1), lambda i: (i, 0, 0),
                       memory_space=ms)
    tw = pl.BlockSpec(memory_space=ms)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[blk, blk] + [tw] * len(tabs),
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((bp, m, _N1), xr.dtype)] * 2,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi, *tabs)
    return yr[:b], yi[:b]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _stream_pallas_2d_nat(xr, xi, n: int, inverse: bool, rows: int = 0):
    """Natural-layout-side variant of _stream_pallas_2d: the permuted
    <-> natural transpose rides the kernel's VMEM (an in-register
    relayout) instead of a separate XLA HBM pass.

    Forward: (b, m, 128) natural rows in -> (b, 128, m) natural
    spectrum out (flat k = k1*m + k2).  Inverse: (b, 128, m) natural
    spectrum in -> (b, m, 128) natural signal out."""
    b = xr.shape[0]
    m = n // _N1
    bt = _tile_batch(m, rows, b)
    bp = -(-b // bt) * bt
    if bp != b:
        pad = ((0, bp - b), (0, 0), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
    kernel = _make_kernel(n, "inv_nat" if inverse else "fwd_nat", bt)
    tabs = [jnp.asarray(t) for t in _tables(n, bool(inverse))]
    interp = jax.default_backend() != "tpu"
    ms = pl.ANY if interp else pltpu.VMEM
    perm = pl.BlockSpec((bt, m, _N1), lambda i: (i, 0, 0),
                        memory_space=ms)
    nat = pl.BlockSpec((bt, _N1, m), lambda i: (i, 0, 0),
                       memory_space=ms)
    inb, outb = (nat, perm) if inverse else (perm, nat)
    out_shape = ((bp, m, _N1) if inverse else (bp, _N1, m))
    tw = pl.BlockSpec(memory_space=ms)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[inb, inb] + [tw] * len(tabs),
        out_specs=[outb, outb],
        out_shape=[jax.ShapeDtypeStruct(out_shape, xr.dtype)] * 2,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi, *tabs)
    return yr[:b], yi[:b]


def sfft_stream_pallas_permuted(xr, xi, n: int, inverse: bool,
                                rows: int = 0):
    """Permuted-layout streaming FFT over the last axis (same split
    contract as core.sfft, but the spectrum is laid out
    X[k2 + m*k1] at flat position [k2*128 + k1], m = n/128).

    forward(natural) -> permuted; inverse(permuted) -> natural; so a
    fwd -> pointwise-filter -> inv pipeline never transposes.  The
    filter must be permuted once on host to match (cheap, reusable).
    """
    shape = xr.shape
    xr2 = xr.reshape(-1, n // _N1, _N1)
    xi2 = xi.reshape(-1, n // _N1, _N1)
    yr, yi = _stream_pallas_2d(xr2, xi2, n, inverse, rows)
    return yr.reshape(shape), yi.reshape(shape)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _stream_filter_inv_2d(xr, xi, fpr, fpi, n: int, rows: int = 0):
    """Inverse-with-fused-filter: permuted (b, m, 128) spectrum planes
    and permuted (s, m, 128) filter tables -> natural (b, m, 128)
    planes.  Identical to filter-multiply + _stream_pallas_2d(inverse)
    but the multiply runs in VMEM inside the kernel (no standalone HBM
    pass).

    ``s = fpr.shape[0]`` > 1 supports the split pipeline: batch rows
    are (pair, k1)-ordered with k1 fastest, and row i uses filter slice
    k1 = i % s (requires bt == 1, which always holds in the split
    regime since splitting only fires for m = _MAX_M tiles)."""
    b = xr.shape[0]
    m = n // _N1
    s = fpr.shape[0]
    bt = 1 if s > 1 else _tile_batch(m, rows, b)
    bp = -(-b // bt) * bt
    if bp != b:
        pad = ((0, bp - b), (0, 0), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
    kernel = _make_kernel(n, "filter", bt)
    tabs = [jnp.asarray(t) for t in _tables(n, True)]
    interp = jax.default_backend() != "tpu"
    ms = pl.ANY if interp else pltpu.VMEM
    blk = pl.BlockSpec((bt, m, _N1), lambda i: (i, 0, 0),
                       memory_space=ms)
    tw = pl.BlockSpec(memory_space=ms)
    fb = pl.BlockSpec((1, m, _N1), lambda i: (i % s, 0, 0),
                      memory_space=ms)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[blk, blk] + [tw] * len(tabs) + [fb, fb],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((bp, m, _N1), xr.dtype)] * 2,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi, *tabs, fpr, fpi)
    return yr[:b], yi[:b]


def _filter_split_factor(n: int):
    """Smallest split s (1, 2, 4) putting the inner transform within
    the kernel's whole-transform VMEM budget, or None."""
    if n % _N1:
        return None
    for s in (1, 2, 4):
        if n % (s * _N1) == 0:
            m = n // (s * _N1)
            if m <= _MAX_M and _stage_plan(m) is not None:
                return s
    return None


def stream_filter_eligible(n: int, dtype) -> bool:
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return _filter_split_factor(n) is not None


@functools.lru_cache(maxsize=16)
def _split_twiddle(n: int, s: int):
    """Split twiddle W_n^{k1 j2} as (s, m, 128) f32 planes (j2 natural
    rows: j2 = 128 q + r)."""
    n_in = n // s
    k1 = np.arange(s)[:, None]
    j2 = np.arange(n_in)[None, :]
    t = np.exp(-2j * np.pi * k1 * j2 / n).reshape(s, n_in // _N1, _N1)
    return t.real.astype(np.float32), t.imag.astype(np.float32)


def sfilter_stream_pallas(x, ffr, ffi, n: int, rows: int = 0):
    """Fused real spectral filter for the huge-n streaming regime:
    returns ``sirfft(srfft(x) * F)`` (i.e. n * filtered x, unscaled)
    for real ``x`` with an EVEN flat batch.

    ``(ffr, ffi)`` is the FULL n-bin conjugate-symmetric extension of
    the filter (F[k] for k <= n/2, conj(F[n-k]) above).

    Pipeline (the zero-transpose shape the permuted layout was built
    for): pack adjacent batch rows z = x[2r] + i*x[2r+1] (sublane
    slice, no lane deinterleave), stream-kernel forward to the permuted
    spectrum, elementwise F-multiply fused into the inverse kernel's
    prologue (F permuted once to match), stream-kernel inverse back to
    natural order, unpack rows.  Because the filter extension is
    conjugate-symmetric, U' + iV' = F(U + iV) bin-by-bin, so the
    paired rows decode to the filtered reals exactly (classic
    two-for-one identity; reference hot path vargamma.c:42-106).

    For n past the kernel's whole-transform VMEM budget (m > _MAX_M,
    e.g. the 2^20 pricer grid) the transform splits s ways:
    z[j1*n_in + j2] as (s, n_in), an s-point DFT over j1 (XLA
    butterfly fused with the split twiddle W_n^{k1 j2}), inner stream
    FFTs over j2 at batch P*s, per-k1 filter slices indexed by the
    kernel grid, and the mirrored inverse — still zero transposes
    (the k1 axis lives in sublane-friendly leading position
    throughout).  Total HBM traffic: 4 passes unsplit, 8 split, vs
    ~10+ (with relayouts) for the deinterleave + merge-FMA +
    interleave composition.
    """
    lead = x.shape[:-1]
    B = 1
    for d in lead:
        B *= int(d)
    if B % 2:
        raise ValueError("sfilter_stream_pallas: flat batch must be even")
    s = _filter_split_factor(n)
    if s is None:
        raise ValueError(f"sfilter_stream_pallas: n={n} not eligible")
    n_in = n // s
    m = n_in // _N1
    P = B // 2
    xp = x.reshape(P, 2, s, m, _N1)
    zr, zi = xp[:, 0], xp[:, 1]                      # (P, s, m, 128)
    if s > 1:
        from .core import _butterfly
        zr, zi = _butterfly(zr, zi, s, inverse=False, axis=1)
        twr, twi = (jnp.asarray(t) for t in _split_twiddle(n, s))
        zr, zi = zr * twr - zi * twi, zr * twi + zi * twr
    Zr, Zi = _stream_pallas_2d(zr.reshape(P * s, m, _N1),
                               zi.reshape(P * s, m, _N1),
                               n_in, False, rows)
    # filter tables: k = k1 + s*(row + m*lane) -> (s, m, 128) slices
    fpr = jnp.transpose(ffr.reshape(_N1, m, s), (2, 1, 0))
    fpi = jnp.transpose(ffi.reshape(_N1, m, s), (2, 1, 0))
    wr, wi = _stream_filter_inv_2d(Zr, Zi, fpr, fpi, n_in, rows)
    wr = wr.reshape(P, s, m, _N1)
    wi = wi.reshape(P, s, m, _N1)
    if s > 1:
        twr, twi = (jnp.asarray(t) for t in _split_twiddle(n, s))
        ur = wr * twr + wi * twi                     # conj twiddle
        ui = wi * twr - wr * twi
        from .core import _butterfly
        wr, wi = _butterfly(ur, ui, s, inverse=True, axis=1)
    out = jnp.stack([wr.reshape(P, n), wi.reshape(P, n)], axis=1)
    return out.reshape(lead + (n,))


def sfft_stream_split(xr, xi, n: int, inverse: bool, rows: int = 0):
    """Natural-order streaming FFT for n PAST the kernel's
    whole-transform VMEM budget (m > _MAX_M): split n = s * n_in
    (s = _filter_split_factor), s-point XLA butterfly + split twiddle
    around inner stream-kernel FFTs at s-fold batch.

    Same contract as sfft_stream_pallas (natural in/out; inverse is
    the unscaled conjugate transform).  Costs one XLA digit-riffle
    transpose on the spectrum side (fwd: output assembly
    X[k1 + s*(row + m*lane)]; inv: the mirror-image decode) — three
    HBM read/write pairs total vs one for the in-budget kernel.
    """
    s = _filter_split_factor(n)
    if s is None:
        raise ValueError(
            f"sfft_stream_split: n={n} is not stream-split eligible "
            f"(needs n = s*128*m with s in {{1,2,4}}, m <= {_MAX_M} a "
            f"5-smooth multiple of {_TAIL})")
    if s == 1:
        return sfft_stream_pallas(xr, xi, n, inverse, rows)
    from .core import _butterfly
    n_in = n // s
    m = n_in // _N1
    shape = xr.shape
    b = 1
    for d in shape[:-1]:
        b *= int(d)
    twr, twi = (jnp.asarray(t) for t in _split_twiddle(n, s))
    if not inverse:
        zr = xr.reshape(b, s, m, _N1)
        zi = xi.reshape(b, s, m, _N1)
        zr, zi = _butterfly(zr, zi, s, inverse=False, axis=1)
        zr, zi = zr * twr - zi * twi, zr * twi + zi * twr
        Cr, Ci = _stream_pallas_2d(zr.reshape(b * s, m, _N1),
                                   zi.reshape(b * s, m, _N1),
                                   n_in, False, rows)
        # natural assembly: X[k1 + s*row + s*m*lane] -> (b, lane, row, k1)
        Cr = Cr.reshape(b, s, m, _N1)
        Ci = Ci.reshape(b, s, m, _N1)
        yr = jnp.transpose(Cr, (0, 3, 2, 1)).reshape(shape)
        yi = jnp.transpose(Ci, (0, 3, 2, 1)).reshape(shape)
        return yr, yi
    # inverse: decode natural spectrum into (k1, permuted-k2) tiles
    Cr = jnp.transpose(xr.reshape(b, _N1, m, s), (0, 3, 2, 1))
    Ci = jnp.transpose(xi.reshape(b, _N1, m, s), (0, 3, 2, 1))
    wr, wi = _stream_pallas_2d(Cr.reshape(b * s, m, _N1),
                               Ci.reshape(b * s, m, _N1),
                               n_in, True, rows)
    wr = wr.reshape(b, s, m, _N1)
    wi = wi.reshape(b, s, m, _N1)
    ur = wr * twr + wi * twi                          # conj twiddle
    ui = wi * twr - wr * twi
    zr, zi = _butterfly(ur, ui, s, inverse=True, axis=1)
    return zr.reshape(shape), zi.reshape(shape)


# ------------------------------------------------- two-matmul kernel
#
# Round-4 mid-range redesign (VERDICT r03 item 1).  Component probes on
# v5e (benchmarks/stream_mid_probe.py, STREAM_MID_AB_r04.jsonl) showed
# that at 2^22-element working sets the stream kernel's cost is ENTIRELY
# its VPU Stockham stage passes (+180-200us over the 146-151us Pallas
# copy floor, i.e. ~1 HBM-pass-equivalent PER STAGE), while a full
# (rows,128)@(128,128) Karatsuba MXU contraction adds only ~30us and an
# in-kernel swapaxes is free (~copy floor).  So the mid-range kernel
# does the WHOLE transform as two dense MXU contractions and zero
# Stockham stages:
#
#   n = 128*m, natural tile T[q, r] (sublanes q < m, lanes r < 128):
#     S[k2, r]  = sum_q T[q, r] W_m^{q k2}     inner m-DFT: transpose ->
#                                              (bt*128, m) @ D_m -> transpose
#     Y[k2, r]  = S[k2, r] * W_n^{r k2}        twiddle table (m, 128)
#     X[k2+m*k1]= sum_r Y[k2, r] W_128^{r k1}  outer: (bt*m,128) @ D_128
#
# Permuted output is the same (k2, k1) contract as the stream kernel;
# natural order is ONE MORE free in-kernel transpose (flat j = m*k1+k2
# is exactly the (128, m) row-major view of X^T).  The dense inner DFT
# is mathematically the textbook DFT matrix — exact at HIGHEST
# precision (same accuracy class as core._dft_axis2_dense).
#
# MEASURED OUTCOME (STREAM_MID_AB_r04.jsonl): correct to 2.1e-7 but
# LOSES to the flat XLA path at every mid-range size — in a fused
# kernel body the two contractions compose ~serially with the DMA
# instead of hiding under it, and XLA flat already sits at the chip's
# joint DMA/VPU/MXU limit (BASELINE.md "Mid-range Pallas attack").
# Kept opt-in (never auto-dispatched) for re-measurement on v5p/v6.
_MM2_MAX_M = 256          # MXU contraction length cap for D_m


@functools.lru_cache(maxsize=64)
def _mm2_tables(n: int, inverse: bool):
    m = n // _N1
    Dm = plan.dft_matrix(m)
    D1 = plan.dft_matrix(_N1)
    sgn = 2j * np.pi if inverse else -2j * np.pi
    k2 = np.arange(m)[:, None]
    r = np.arange(_N1)[None, :]
    t1 = np.exp(sgn * k2 * r / n)
    if inverse:
        Dm = np.conj(Dm)
        D1 = np.conj(D1)
    f32 = np.float32
    # Karatsuba needs D.re + D.im; precompute to save a VPU add
    return (Dm.real.astype(f32), Dm.imag.astype(f32),
            (Dm.real + Dm.imag).astype(f32),
            D1.real.astype(f32), D1.imag.astype(f32),
            (D1.real + D1.imag).astype(f32),
            t1.real.astype(f32), t1.imag.astype(f32))


def mm2_eligible(n: int, dtype) -> bool:
    return (jnp.dtype(dtype) == jnp.float32 and n % _N1 == 0
            and 2 <= n // _N1 <= _MM2_MAX_M)


def _cdot_kara(Yr, Yi, Dr, Di, Drpi):
    """Complex (rows, K) @ (K, K) in three real MXU dots."""
    M1 = jnp.dot(Yr, Dr, **_HI)
    M2 = jnp.dot(Yi, Di, **_HI)
    M3 = jnp.dot(Yr + Yi, Drpi, **_HI)
    return M1 - M2, M3 - M1 - M2


def _make_mm2_kernel(n: int, inverse: bool, bt: int, natural_out: bool):
    m = n // _N1

    def _inner_dot(xr, xi, mr, mi, mrpi):
        # m-DFT over sublanes: transpose so q is in lanes, dot, put k2
        # back in sublanes (in-kernel transposes ~= copy floor on v5e)
        tr = jnp.swapaxes(xr, 1, 2).reshape(bt * _N1, m)
        ti = jnp.swapaxes(xi, 1, 2).reshape(bt * _N1, m)
        sr, si = _cdot_kara(tr, ti, mr[:], mi[:], mrpi[:])
        return (jnp.swapaxes(sr.reshape(bt, _N1, m), 1, 2),
                jnp.swapaxes(si.reshape(bt, _N1, m), 1, 2))

    def fwd_kernel(xr_ref, xi_ref, mr, mi, mrpi, dr, di, drpi,
                   t1r_ref, t1i_ref, or_ref, oi_ref):
        sr, si = _inner_dot(xr_ref[:], xi_ref[:], mr, mi, mrpi)
        t1r = t1r_ref[:][None]
        t1i = t1i_ref[:][None]
        yr = sr * t1r - si * t1i
        yi = sr * t1i + si * t1r
        Zr, Zi = _cdot_kara(yr.reshape(bt * m, _N1),
                            yi.reshape(bt * m, _N1),
                            dr[:], di[:], drpi[:])
        Zr = Zr.reshape(bt, m, _N1)
        Zi = Zi.reshape(bt, m, _N1)
        if natural_out:
            or_ref[:] = jnp.swapaxes(Zr, 1, 2)
            oi_ref[:] = jnp.swapaxes(Zi, 1, 2)
        else:
            or_ref[:] = Zr
            oi_ref[:] = Zi

    def inv_kernel(xr_ref, xi_ref, mr, mi, mrpi, dr, di, drpi,
                   t1r_ref, t1i_ref, or_ref, oi_ref):
        # mirror pipeline; input permuted (k2, k1) unless natural_out
        # (then the NATURAL spectrum arrives as (128, m) tiles = the
        # permuted layout's free transpose)
        xr = xr_ref[:]
        xi = xi_ref[:]
        if natural_out:
            xr = jnp.swapaxes(xr, 1, 2)
            xi = jnp.swapaxes(xi, 1, 2)
        Yr, Yi = _cdot_kara(xr.reshape(bt * m, _N1),
                            xi.reshape(bt * m, _N1),
                            dr[:], di[:], drpi[:])
        yr = Yr.reshape(bt, m, _N1)
        yi = Yi.reshape(bt, m, _N1)
        t1r = t1r_ref[:][None]
        t1i = t1i_ref[:][None]
        sr = yr * t1r - yi * t1i
        si = yr * t1i + yi * t1r
        or_ref[:], oi_ref[:] = _inner_dot(sr, si, mr, mi, mrpi)

    return inv_kernel if inverse else fwd_kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _mm2_2d(xr, xi, n: int, inverse: bool, natural: bool, rows: int = 0):
    """Two-matmul kernel over (b, m, 128) planes (natural feed for the
    forward; permuted or natural spectrum per ``natural``)."""
    b = xr.shape[0]
    m = n // _N1
    bt = _tile_batch(m, rows)
    bp = -(-b // bt) * bt
    if bp != b:
        pad = ((0, bp - b), (0, 0), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
    kernel = _make_mm2_kernel(n, inverse, bt, natural)
    tabs = [jnp.asarray(t) for t in _mm2_tables(n, inverse)]
    interp = jax.default_backend() != "tpu"
    ms = pl.ANY if interp else pltpu.VMEM
    in_blk = pl.BlockSpec(
        (bt, _N1, m) if (inverse and natural) else (bt, m, _N1),
        lambda i: (i, 0, 0), memory_space=ms)
    out_blk = pl.BlockSpec(
        (bt, _N1, m) if (natural and not inverse) else (bt, m, _N1),
        lambda i: (i, 0, 0), memory_space=ms)
    oshape = ((bp, _N1, m) if (natural and not inverse)
              else (bp, m, _N1))
    tw = pl.BlockSpec(memory_space=ms)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(bp // bt,),
        in_specs=[in_blk, in_blk] + [tw] * len(tabs),
        out_specs=[out_blk, out_blk],
        out_shape=[jax.ShapeDtypeStruct(oshape, xr.dtype)] * 2,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi, *tabs)
    return yr[:b], yi[:b]


def sfft_mm2_pallas(xr, xi, n: int, inverse: bool, rows: int = 0):
    """Natural-order two-matmul FFT over the last axis (core.sfft
    contract) — natural in AND out, all layout fixes in-kernel."""
    shape = xr.shape
    m = n // _N1
    if inverse:
        xr2 = xr.reshape(-1, _N1, m)
        xi2 = xi.reshape(-1, _N1, m)
    else:
        xr2 = xr.reshape(-1, m, _N1)
        xi2 = xi.reshape(-1, m, _N1)
    yr, yi = _mm2_2d(xr2, xi2, n, inverse, True, rows)
    return yr.reshape(shape), yi.reshape(shape)


def sfft_mm2_pallas_permuted(xr, xi, n: int, inverse: bool,
                             rows: int = 0):
    """Permuted-spectrum two-matmul FFT (same (k2, k1) contract as
    sfft_stream_pallas_permuted; fwd natural->permuted, inv
    permuted->natural)."""
    shape = xr.shape
    xr2 = xr.reshape(-1, n // _N1, _N1)
    xi2 = xi.reshape(-1, n // _N1, _N1)
    yr, yi = _mm2_2d(xr2, xi2, n, inverse, False, rows)
    return yr.reshape(shape), yi.reshape(shape)


def sfft_stream_pallas(xr, xi, n: int, inverse: bool, rows: int = 0):
    """Natural-order streaming FFT over the last axis (core.sfft
    contract).  The permuted<->natural transpose rides the kernel's
    VMEM (_stream_pallas_2d_nat) instead of a separate XLA HBM pass —
    measured ~8-9% on the roundtrip at (65536, 64/256)
    (STREAM_NAT_r05); fwd+filter+inv pipelines should still use the
    *_permuted form (zero transposes anywhere)."""
    shape = xr.shape
    m = n // _N1
    if inverse:
        xr2 = xr.reshape(-1, _N1, m)
        xi2 = xi.reshape(-1, _N1, m)
        yr, yi = _stream_pallas_2d_nat(xr2, xi2, n, True, rows)
        return (yr.reshape(-1, n).reshape(shape),
                yi.reshape(-1, n).reshape(shape))
    xr2 = xr.reshape(-1, m, _N1)
    xi2 = xi.reshape(-1, m, _N1)
    yr, yi = _stream_pallas_2d_nat(xr2, xi2, n, False, rows)
    return (yr.reshape(-1, n).reshape(shape),
            yi.reshape(-1, n).reshape(shape))
