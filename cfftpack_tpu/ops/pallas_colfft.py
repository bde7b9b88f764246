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
# in COLFFT_AB_r05 — below this the fused XLA transpose+flat path
# wins); compared against ONE plane's element count
_COL_MIN_ELEMS = 1 << 21

# lane-block width: each DMA row of a column block is `lanes * 4` bytes
# contiguous at stride N1*4.  Wider blocks were hypothesized to
# amortize the stride but measured FLAT (COL_LANES_AB_r05: 4474 /
# 4595 / 4469 us at 128/256/512, (64, 1024, 1024)) and the wider
# tables+tiles VMEM-OOM the compiler at n0 = 4096 — the strided DMA is
# not the bottleneck on v5e.  Kept parameterized for v5p/v6 re-checks.
_COL_LANES = 128


def _col_lanes(n1: int) -> int:
    L = min(_COL_LANES, n1)
    while n1 % L:
        L //= 2
    return max(L, _N1)


def colfft_eligible(n0: int, n1: int, dtype) -> bool:
    """Column kernel gate: transform length n0 must have a sublane
    stage plan and fit VMEM; the lane axis n1 must tile into 128s."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    return (n1 % _N1 == 0 and n1 >= _N1 and n0 <= _MAX_M
            and _stage_plan(n0) is not None)


@functools.lru_cache(maxsize=64)
def _col_tables(n0: int, inverse: bool, lanes: int = _N1):
    """Per-stage Stockham twiddles for a length-n0 sublane DFT,
    flattened (rows, lanes) and pre-broadcast across lanes (the same
    layout pallas_stream._tables builds for its inner m-point DFT)."""
    sgn = 2j * np.pi if inverse else -2j * np.pi
    parts = []
    mm = n0
    for p in _stage_plan(n0):
        mn = mm // p
        j = np.arange(mn)[None, :]
        tw = np.exp(sgn * np.arange(p)[:, None] * j / mm)
        parts.append(np.repeat(tw.reshape(p * mn, 1), lanes, axis=1))
        mm = mn
    flat = (np.concatenate(parts, axis=0) if parts
            else np.zeros((1, lanes), np.complex128))
    return flat.real.astype(np.float32), flat.imag.astype(np.float32)


def _make_col_kernel(n0: int, inverse: bool, bt: int, scale: float,
                     lanes: int):
    sign = 1.0 if inverse else -1.0
    s = np.float32(scale)

    def kernel(xr_ref, xi_ref, twr_ref, twi_ref, or_ref, oi_ref):
        sr, si = _stockham_rows(xr_ref[:], xi_ref[:], bt, n0, sign,
                                twr_ref, twi_ref, lanes)
        # norm scale fused into the store: XLA cannot fuse an
        # elementwise multiply INTO a custom call, so an outside scale
        # is a full extra HBM pass at 2-D working-set sizes
        if scale != 1.0:
            sr = sr * s
            si = si * s
        or_ref[:] = sr
        oi_ref[:] = si

    return kernel


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _colfft_pallas_3d(xr, xi, n0: int, inverse: bool,
                      scale: float = 1.0, lanes: int = 0):
    """(B, n0, N1) planes -> same shape, length-n0 DFT over axis 1
    (natural order in and out).  The grid's second axis partitions the
    LANE dim into 128-wide chunks — each grid step DMAs a (bt, n0, 128)
    slab (a column of lane tiles; Mosaic-legal since the sublane dim is
    whole and the lane block divides N1), so the column "transpose"
    happens in block indexing, never as an HBM pass."""
    B, _, N1 = xr.shape
    lanes = lanes or _col_lanes(N1)
    bt = max(1, (_ROW_BUDGET * _N1 // lanes) // n0)  # rows per grid step
    bp = -(-B // bt) * bt
    if bp != B:
        pad = ((0, bp - B), (0, 0), (0, 0))
        xr = jnp.pad(xr, pad)
        xi = jnp.pad(xi, pad)
    kernel = _make_col_kernel(n0, inverse, bt, scale, lanes)
    tabs = [jnp.asarray(t) for t in _col_tables(n0, inverse, lanes)]
    interp = jax.default_backend() != "tpu"
    ms = pl.ANY if interp else pltpu.VMEM
    blk = pl.BlockSpec((bt, n0, lanes), lambda i, j: (i, 0, j),
                       memory_space=ms)
    tw = pl.BlockSpec(memory_space=ms)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(bp // bt, N1 // lanes),
        in_specs=[blk, blk] + [tw] * len(tabs),
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((bp, n0, N1), xr.dtype)] * 2,
        interpret=interp,
        compiler_params=None if interp else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi, *tabs)
    return yr[:B], yi[:B]


def scolfft_pallas(xr, xi, inverse: bool = False, scale: float = 1.0):
    """DFT over axis -2 of split (re, im) planes of shape (..., n0, n1)
    — natural order, no transposes (see module docstring), output
    multiplied by ``scale`` inside the kernel store.  Requires
    colfft_eligible(n0, n1, dtype)."""
    shape = xr.shape
    n0, n1 = shape[-2], shape[-1]
    yr, yi = _colfft_pallas_3d(xr.reshape(-1, n0, n1),
                               xi.reshape(-1, n0, n1), n0, inverse,
                               float(scale))
    return yr.reshape(shape), yi.reshape(shape)
