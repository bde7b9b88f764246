"""Sharded 2-D FFT: row-column with an all-to-all transpose.

Distributed analog of the reference's 2-D driver (cfft2f_,
fftpack.c:2363-2434: batched 1-D passes per axis, the second pass
reading with stride ldim).  Here rows are sharded over the mesh; the
strided second pass becomes one ICI all-to-all (BASELINE.json
configs[3]: 4096x4096, batch 64).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import DEFAULT_NORM, check_norm, complex_dtype_of, fwd_scale, \
    inv_scale
from ..ops.cfft import _dft_last_axis

__all__ = ["fft2_sharded", "ifft2_sharded"]


def _core(blk, n0, n1, inverse, axis_name):
    """blk: local (..., n0/D, n1) block, rows sharded."""
    a = _dft_last_axis(blk, n1, inverse)          # row FFTs (local)
    # transpose via all-to-all: shard columns, gather rows
    a = jax.lax.all_to_all(a, axis_name, split_axis=a.ndim - 1,
                           concat_axis=a.ndim - 2, tiled=True)
    a = jnp.swapaxes(a, -1, -2)                    # (..., n1/D, n0)
    a = _dft_last_axis(a, n0, inverse)             # column FFTs (local)
    a = jnp.swapaxes(a, -1, -2)                    # (..., n0, n1/D)
    a = jax.lax.all_to_all(a, axis_name, split_axis=a.ndim - 2,
                           concat_axis=a.ndim - 1, tiled=True)
    return a                                       # (..., n0/D, n1)


def _fft2_sharded(x, mesh, axis_name, inverse, norm, batch_axis_name=None):
    x = jnp.asarray(x)
    cdtype = complex_dtype_of(x.dtype)
    x = x.astype(cdtype)
    n0, n1 = x.shape[-2], x.shape[-1]
    d = mesh.shape[axis_name]
    if n0 % d or n1 % d:
        raise ValueError(f"2-D shape ({n0},{n1}) must divide mesh size {d}")
    lead = len(x.shape[:-2])
    ls = [None] * lead
    if batch_axis_name is not None and lead:
        ls[0] = batch_axis_name
    fs = shard_map(
        partial(_core, n0=n0, n1=n1, inverse=inverse, axis_name=axis_name),
        mesh=mesh,
        in_specs=P(*ls, axis_name, None),
        out_specs=P(*ls, axis_name, None),
    )
    y = fs(x)
    s = (inv_scale(norm, n0) * inv_scale(norm, n1) if inverse
         else fwd_scale(norm, n0) * fwd_scale(norm, n1))
    if s != 1.0:
        y = y * jnp.asarray(s, dtype=cdtype)
    return y


# jit-wrapped entries (see fourstep.py: eager shard_map is 30-60x
# slower than the compiled program and misses the persistent cache)
_fft2_sharded_jit = jax.jit(_fft2_sharded, static_argnums=(1, 2, 3, 4, 5))


def fft2_sharded(x, mesh: Mesh, axis_name: str = "data",
                 norm: str = DEFAULT_NORM,
                 batch_axis_name: str | None = None):
    """2-D FFT over the trailing two axes, rows sharded over the mesh.

    Output is sharded the same way as the input (rows over the mesh)."""
    return _fft2_sharded_jit(x, mesh, axis_name, False, check_norm(norm),
                             batch_axis_name)


def ifft2_sharded(y, mesh: Mesh, axis_name: str = "data",
                  norm: str = DEFAULT_NORM,
                  batch_axis_name: str | None = None):
    return _fft2_sharded_jit(y, mesh, axis_name, True, check_norm(norm),
                             batch_axis_name)


# ------------------------------------------------- split (re, im) API

def _core_pair(br, bi, n0, n1, inverse, axis_name):
    from ..ops import core

    def a2a(a):
        return jax.lax.all_to_all(a, axis_name, split_axis=a.ndim - 1,
                                  concat_axis=a.ndim - 2, tiled=True)

    def a2a_back(a):
        return jax.lax.all_to_all(a, axis_name, split_axis=a.ndim - 2,
                                  concat_axis=a.ndim - 1, tiled=True)

    ar, ai = core.sfft(br, bi, n1, inverse)        # rows (local)
    ar, ai = a2a(ar), a2a(ai)
    ar = jnp.swapaxes(ar, -1, -2)
    ai = jnp.swapaxes(ai, -1, -2)
    ar, ai = core.sfft(ar, ai, n0, inverse)        # columns (local)
    ar = jnp.swapaxes(ar, -1, -2)
    ai = jnp.swapaxes(ai, -1, -2)
    return a2a_back(ar), a2a_back(ai)


def _fft2_sharded_pair(xr, xi, mesh, axis_name, inverse, norm,
                       batch_axis_name=None):
    xr = jnp.asarray(xr)
    xi = jnp.asarray(xi)
    n0, n1 = xr.shape[-2], xr.shape[-1]
    d = mesh.shape[axis_name]
    if n0 % d or n1 % d:
        raise ValueError(f"2-D shape ({n0},{n1}) must divide mesh size {d}")
    lead = xr.ndim - 2
    ls = [None] * lead
    if batch_axis_name is not None and lead:
        ls[0] = batch_axis_name
    fs = shard_map(
        partial(_core_pair, n0=n0, n1=n1, inverse=inverse,
                axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(*ls, axis_name, None), P(*ls, axis_name, None)),
        out_specs=(P(*ls, axis_name, None), P(*ls, axis_name, None)),
    )
    yr, yi = fs(xr, xi)
    s = (inv_scale(norm, n0) * inv_scale(norm, n1) if inverse
         else fwd_scale(norm, n0) * fwd_scale(norm, n1))
    if s != 1.0:
        yr = yr * s
        yi = yi * s
    return yr, yi


_fft2_sharded_pair_jit = jax.jit(_fft2_sharded_pair,
                                 static_argnums=(2, 3, 4, 5, 6))


def fft2_sharded_split(xr, xi, mesh: Mesh, axis_name: str = "data",
                       norm: str = DEFAULT_NORM,
                       batch_axis_name: str | None = None):
    """Sharded 2-D FFT on an (re, im) pair — the on-TPU-pod path."""
    return _fft2_sharded_pair_jit(xr, xi, mesh, axis_name, False,
                                  check_norm(norm), batch_axis_name)


def ifft2_sharded_split(yr, yi, mesh: Mesh, axis_name: str = "data",
                        norm: str = DEFAULT_NORM,
                        batch_axis_name: str | None = None):
    return _fft2_sharded_pair_jit(yr, yi, mesh, axis_name, True,
                                  check_norm(norm), batch_axis_name)
