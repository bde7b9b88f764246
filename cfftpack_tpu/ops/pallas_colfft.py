"""Pallas TPU kernel: column FFT (transform over axis -2) with ZERO
transpose passes — the round-5 answer to the 2-D engine being the
weakest corner of the perf surface (round-4 verdict item 3 / round-5
task 2).

The XLA 2-D path (cfft._fft2_split_core) pays the column pass as
moveaxis -> flat row FFT -> moveaxis: two full HBM relayout passes
around the transform, and SWEEP2D_r04 put fft2 at 0.19 of roofline
with DCTN2D_AB_r04 showing the cost is exactly the two 1-D passes —
i.e. the relayouts and the huge-batch row engine are the whole story.

Design: the transform axis of a column FFT is the SUBLANE axis of the
natural (B, N0, N1) layout.  Tile N1 into 128-lane chunks
(free reshape to (B, N0, C, 128)) and walk a Pallas grid over
(batch, chunk): each grid step DMAs a (N0, 128) slab straight out of
the strided HBM layout (rows are contiguous 512-byte lane tiles,
stride N1*4 — a linear strided DMA, no host-side transpose), runs the
SAME Mosaic-legal Stockham-over-sublanes stage machinery as the
streaming kernel (pallas_stream._stockham_rows: radix-16/4/2/3/5
stages + unrolled DFT-16 tail, twiddles fused pre-store), and stores
the slab back natural-order.  HBM traffic is the roofline minimum:
one read + one write of each plane, no relayouts, no transposes.

Unlike the streaming row kernel there is NO outer lane DFT and NO
outer twiddle — the full length-N0 DFT runs in the sublane stages —
so output is natural-order (bins k0 in sublanes) and any N0 that
_stage_plan accepts (5-smooth multiple of 16, <= _MAX_M for VMEM)
works, independent of N1 (any multiple of 128).

Used by ops/cfft.fft2_split and friends to run the column pass of 2-D
transforms transpose-free (reference analog: the column loop of
cfft2f_, /root/reference/cfftpack/fftpack.c:2363-2434, which
strides down columns in C — the scalar-machine phrasing of the same
"no transpose" idea).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stream import (_MAX_M, _N1, _ROW_BUDGET, _stage_plan,
                            _stockham_rows)

__all__ = ["colfft_eligible", "scolfft_pallas"]

# auto-dispatch floor for cfft._fft_split_impl's column-pass branch
# (total elements across both planes of the 2-D slab; measured on-chip
# in COLFFT_AB_r05 — below this the fused XLA transpose+flat path wins)
_COL_MIN_ELEMS = 1 << 21


def colfft_eligible(n0: int, n1: int, dtype) -> bool:
    """Column kernel gate: transform length n0 must have a sublane
    stage plan and fit VMEM; the lane axis n1 must tile into 128s."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return (n1 % _N1 == 0 and n1 >= _N1 and n0 <= _MAX_M
            and _stage_plan(n0) is not None)


@functools.lru_cache(maxsize=64)
def _col_tables(n0: int, inverse: bool):
    """Per-stage Stockham twiddles for a length-n0 sublane DFT,
    flattened (rows, 128) and pre-broadcast across lanes (the same
    layout pallas_stream._tables builds for its inner m-point DFT)."""
    sgn = 2j * np.pi if inverse else -2j * np.pi
    parts = []
    mm = n0
    for p in _stage_plan(n0):
        mn = mm // p
        j = np.arange(mn)[None, :]
        tw = np.exp(sgn * np.arange(p)[:, None] * j / mm)
        parts.append(np.repeat(tw.reshape(p * mn, 1), _N1, axis=1))
        mm = mn
    flat = (np.concatenate(parts, axis=0) if parts
            else np.zeros((1, _N1), np.complex128))
    return flat.real.astype(np.float32), flat.imag.astype(np.float32)


def _make_col_kernel(n0: int, inverse: bool, bt: int):
    sign = 1.0 if inverse else -1.0

    def kernel(xr_ref, xi_ref, twr_ref, twi_ref, or_ref, oi_ref):
        sr, si = _stockham_rows(xr_ref[:], xi_ref[:], bt, n0, sign,
                                twr_ref, twi_ref)
        or_ref[:] = sr
        oi_ref[:] = si

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3))
def _colfft_pallas_4d(xr, xi, n0: int, inverse: bool):
    """(B, n0, C, 128) planes -> same shape, length-n0 DFT over axis 1
    (natural order in and out)."""
    B, _, C, _ = xr.shape
    bt = max(1, _ROW_BUDGET // n0)      # batch rows per grid step
    bp = -(-B // bt) * bt
    if bp != B:
        pad = ((0, bp - B), (0, 0), (0, 0), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
    kernel = _make_col_kernel(n0, inverse, bt)
    tabs = [jnp.asarray(t) for t in _col_tables(n0, inverse)]
    interp = jax.default_backend() != "tpu"
    ms = pl.ANY if interp else pltpu.VMEM
    # chunk dim squeezed out of the block: each grid step sees a
    # (bt, n0, 128) slab gathered by a strided DMA — the (n0, C)
    # "transpose" happens in the index map, never in HBM
    blk = pl.BlockSpec((bt, n0, None, _N1), lambda i, j: (i, 0, j, 0),
                       memory_space=ms)
    tw = pl.BlockSpec(memory_space=ms)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(bp // bt, C),
        in_specs=[blk, blk] + [tw] * len(tabs),
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((bp, n0, C, _N1), xr.dtype)] * 2,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi, *tabs)
    return yr[:B], yi[:B]


def scolfft_pallas(xr, xi, inverse: bool = False):
    """Unscaled DFT over axis -2 of split (re, im) planes of shape
    (..., n0, n1) — natural order, no transposes (see module
    docstring).  Requires colfft_eligible(n0, n1, dtype)."""
    shape = xr.shape
    n0, n1 = shape[-2], shape[-1]
    xr4 = xr.reshape(-1, n0, n1 // _N1, _N1)
    xi4 = xi.reshape(-1, n0, n1 // _N1, _N1)
    yr, yi = _colfft_pallas_4d(xr4, xi4, n0, inverse)
    return yr.reshape(shape), yi.reshape(shape)
