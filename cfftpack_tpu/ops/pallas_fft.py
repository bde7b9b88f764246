"""Pallas TPU kernel: fully-fused batched mixed-radix FFT.

The XLA path materializes every Stockham stage to HBM (XLA fuses some,
but stage transposes limit it).  This kernel keeps a whole batch tile
resident in VMEM and runs ALL stages on-chip: HBM traffic is exactly
one read + one write of the (re, im) planes — the speed-of-light
minimum (BASELINE.md: >=80% of HBM roofline).

Design (per the TPU guide):
* split (re, im) f32/f64 planes — no complex dtype on TPU;
* batch lives in the LANE dimension: each grid step processes a
  (TILE_B, n) block, transposed once in VMEM to (n, TILE_B) so every
  butterfly/twiddle/permute is a sublane operation over 128 lanes of
  independent transforms (the reference's lot/jump/inc batching,
  fftpack.c:2554, became the vector lane axis);
* one kernel instance runs the complete stage loop (factors 4/2/3/5 +
  dense-matrix odd radices) unrolled at trace time — the analog of
  c1fm1f_'s factor loop (fftpack.c:2041-2142) with the ping-pong
  buffers replaced by VMEM values;
* per-stage twiddles are host-precomputed and streamed in as two flat
  f32 arrays (the wsave analog, tables_ fftpack.c:15124), sliced at
  static offsets.

Eligibility: last-axis transforms, n's largest prime factor <= 32 (no
Bluestein in-kernel; those fall back to the XLA path), and the VMEM
working set must fit (tile size auto-shrinks for large n).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import plan
from .core import _butterfly

__all__ = ["pallas_eligible", "sfft_pallas"]

_LANES = 128
# scoped-VMEM budget we ask the compiler for (v5e default is 16 MiB;
# raising it is allowed up to the physical VMEM size)
_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_BUDGET = 48 * 1024 * 1024   # what our tile model targets


def _ntw(n: int) -> int:
    offs, _, _ = _flat_twiddles(n)
    return offs[-1]


def _vmem_need(n: int, tb: int) -> int:
    """Rough per-tile VMEM model: in/out blocks + ~6 live stage planes
    + the lane-broadcast twiddle tables."""
    data = 10 * n * tb * 4
    tw = 2 * _ntw(n) * tb * 4
    return data + tw


def pallas_eligible(n: int, dtype) -> bool:
    if n <= 1 or plan.needs_bluestein(n):
        return False
    if jnp.dtype(dtype).itemsize != 4:   # f32 path (f64 falls back)
        return False
    return _vmem_need(n, 8) <= _VMEM_BUDGET


def _tile_b(n: int) -> int:
    tb = _LANES
    while tb > 8 and _vmem_need(n, tb) > _VMEM_BUDGET:
        tb //= 2
    return tb


@functools.lru_cache(maxsize=512)
def _flat_twiddles(n: int):
    """(offsets, re, im): all stage tables concatenated (f64 host)."""
    tabs = plan.stage_twiddles(n)
    offs = [0]
    for t in tabs:
        offs.append(offs[-1] + t.size)
    flat = np.concatenate([t.ravel() for t in tabs]) if tabs else \
        np.zeros(0, dtype=np.complex128)
    return tuple(offs), flat.real.copy(), flat.imag.copy()


def _make_kernel(n: int, tb: int, inverse: bool):
    facs = plan.factor(n)
    offs, _, _ = _flat_twiddles(n)

    def kernel(xr_ref, xi_ref, twr_ref, twi_ref, or_ref, oi_ref):
        # one VMEM transpose puts the batch tile in the lanes
        sr = xr_ref[:].T                       # (n, TB)
        si = xi_ref[:].T
        L, m = 1, n
        for s, p in enumerate(facs):
            mn = m // p
            Tr = sr.reshape(L, p, mn, tb)
            Ti = si.reshape(L, p, mn, tb)
            Ur, Ui = _butterfly(Tr, Ti, p, inverse, axis=1)
            if mn > 1:
                # tables are pre-broadcast across lanes on the host so
                # the reshape only splits sublane dims (Mosaic rejects
                # unit-lane shape casts)
                twr = twr_ref[offs[s]: offs[s + 1], :].reshape(
                    1, p, mn, tb)
                twi = twi_ref[offs[s]: offs[s + 1], :].reshape(
                    1, p, mn, tb)
                if inverse:
                    twi = -twi
                Vr = Ur * twr - Ui * twi
                Vi = Ur * twi + Ui * twr
                Ur, Ui = Vr, Vi
            sr = Ur.transpose(1, 0, 2, 3).reshape(L * p * mn, tb)
            si = Ui.transpose(1, 0, 2, 3).reshape(L * p * mn, tb)
            L *= p
            m = mn
        or_ref[:] = sr.T
        oi_ref[:] = si.T

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3))
def _sfft_pallas_2d(xr, xi, n: int, inverse: bool):
    """(B, n) f32 pair -> (B, n) pair, B padded to the tile size."""
    b = xr.shape[0]
    tb = _tile_b(n)
    bp = -(-b // tb) * tb
    if bp != b:
        xr = jnp.pad(xr, ((0, bp - b), (0, 0)))
        xi = jnp.pad(xi, ((0, bp - b), (0, 0)))
    _, twr_f, twi_f = _flat_twiddles(n)
    twr = jnp.asarray(np.repeat(twr_f[:, None], tb, axis=1),
                      dtype=xr.dtype)
    twi = jnp.asarray(np.repeat(twi_f[:, None], tb, axis=1),
                      dtype=xr.dtype)
    kernel = _make_kernel(n, tb, inverse)
    interp = jax.default_backend() != "tpu"
    out_shape = [jax.ShapeDtypeStruct((bp, n), xr.dtype)] * 2
    grid = (bp // tb,)
    blk = pl.BlockSpec((tb, n), lambda i: (i, 0),
                       memory_space=pl.ANY if interp else pltpu.VMEM)
    tw_spec = pl.BlockSpec(memory_space=pl.ANY if interp
                           else pltpu.VMEM)
    yr, yi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[blk, blk, tw_spec, tw_spec],
        out_specs=[blk, blk],
        out_shape=out_shape,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(xr, xi, twr, twi)
    if bp != b:
        yr = yr[:b]
        yi = yi[:b]
    return yr, yi


def sfft_pallas(xr, xi, n: int, inverse: bool):
    """Unscaled DFT over the last axis via the fused Pallas kernel.

    Same contract as core.sfft; caller guarantees pallas_eligible(n).
    """
    shape = xr.shape
    xr2 = xr.reshape(-1, n)
    xi2 = xi.reshape(-1, n)
    yr, yi = _sfft_pallas_2d(xr2, xi2, n, inverse)
    return yr.reshape(shape), yi.reshape(shape)
