"""Component probes for the mid-range stream-kernel redesign (round 4).

VERDICT round-3 item 1 asks for a natural-layout stream kernel that
beats the flat XLA path at (4096, 1024) and (16384, 256) — both 2^22
elements where XLA flat sits at ~0.52 of HBM roofline.  Before picking
a design, this script measures the COST COMPONENTS of a Pallas grid
kernel at those tile shapes on the real chip, all within one run
(cross-run tunnel comparisons are unreliable — BASELINE.md protocol):

  copy       pure in->out through VMEM (DMA + grid-overhead floor)
  stages     _stockham_rows only (the per-stage VPU stack passes)
  mxu        stage B only (3-dot Karatsuba (rows,128)@(128,128))
  mxu4       stage B as 4 plain dots (no Karatsuba VPU adds)
  twiddle    the outer (m,128) table FMA only
  transpose  in-kernel (bt, m, 128) -> (bt, 128, m) swapaxes
  full       the shipped sfft_stream_pallas natural-order path
  fullp      the shipped permuted path (no XLA transpose)
  xla        the dispatched XLA engine (the bar to beat)

Timing: dependency-chained fori_loop slope (bench.py method), fwd-only
chains with a magnitude-preserving rescale.  Emits one JSON line per
(shape, probe).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.sweep import per_iter, hbm_bandwidth  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from cfftpack_tpu.ops import pallas_stream as ps  # noqa: E402
from cfftpack_tpu.ops.core import _stockham  # noqa: E402

_N1 = 128


def _probe_call(kernel, xr, xi, bt, m, extra=(), out_m=None):
    b = xr.shape[0]
    ms = pltpu.VMEM
    blk = pl.BlockSpec((bt, m, _N1), lambda i: (i, 0, 0), memory_space=ms)
    oblk = (blk if out_m is None else
            pl.BlockSpec((bt, out_m, m), lambda i: (i, 0, 0),
                         memory_space=ms))
    oshape = ((b, m, _N1) if out_m is None else (b, out_m, m))
    tw = pl.BlockSpec(memory_space=ms)
    return pl.pallas_call(
        kernel,
        grid=(b // bt,),
        in_specs=[blk, blk] + [tw] * len(extra),
        out_specs=[oblk, oblk],
        out_shape=[jax.ShapeDtypeStruct(oshape, xr.dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xr, xi, *extra)


def probes_for(n: int, b: int, rows: int):
    m = n // _N1
    bt = max(1, rows // m)
    sign = -1.0
    tabs = [jnp.asarray(t) for t in ps._tables(n, False)]
    Dr, Di, t1r, t1i, twr, twi = tabs

    def copy_k(xr, xi, orf, oif):
        orf[:] = xr[:] * 0.9999
        oif[:] = xi[:] * 0.9999

    def stages_k(xr, xi, twr_ref, twi_ref, orf, oif):
        sr, si = ps._stockham_rows(xr[:], xi[:], bt, m, sign,
                                   twr_ref, twi_ref)
        s = 1.0 / np.sqrt(m)
        orf[:] = sr * s
        oif[:] = si * s

    def mxu_k(xr, xi, dr, di, orf, oif):
        M1 = jnp.dot(xr[:].reshape(bt * m, _N1), dr[:], **ps._HI)
        M2 = jnp.dot(xi[:].reshape(bt * m, _N1), di[:], **ps._HI)
        M3 = jnp.dot(xr[:].reshape(bt * m, _N1) + xi[:].reshape(bt * m, _N1),
                     dr[:] + di[:], **ps._HI)
        s = 1.0 / np.sqrt(_N1)
        orf[:] = (M1 - M2).reshape(bt, m, _N1) * s
        oif[:] = (M3 - M1 - M2).reshape(bt, m, _N1) * s

    def mxu4_k(xr, xi, dr, di, orf, oif):
        a = xr[:].reshape(bt * m, _N1)
        bq = xi[:].reshape(bt * m, _N1)
        Yr = (jnp.dot(a, dr[:], **ps._HI) - jnp.dot(bq, di[:], **ps._HI))
        Yi = (jnp.dot(a, di[:], **ps._HI) + jnp.dot(bq, dr[:], **ps._HI))
        s = 1.0 / np.sqrt(_N1)
        orf[:] = Yr.reshape(bt, m, _N1) * s
        oif[:] = Yi.reshape(bt, m, _N1) * s

    def twiddle_k(xr, xi, t1r_ref, t1i_ref, orf, oif):
        a = t1r_ref[:][None]
        c = t1i_ref[:][None]
        orf[:] = xr[:] * a - xi[:] * c
        oif[:] = xr[:] * c + xi[:] * a

    def transpose_k(xr, xi, orf, oif):
        orf[:] = jnp.swapaxes(xr[:], 1, 2) * 0.9999
        oif[:] = jnp.swapaxes(xi[:], 1, 2) * 0.9999

    out = {
        "copy": lambda a, c: _probe_call(copy_k, a, c, bt, m),
        "stages": lambda a, c: _probe_call(stages_k, a, c, bt, m,
                                           extra=(twr, twi)),
        "mxu": lambda a, c: _probe_call(mxu_k, a, c, bt, m,
                                        extra=(Dr, Di)),
        "mxu4": lambda a, c: _probe_call(mxu4_k, a, c, bt, m,
                                         extra=(Dr, Di)),
        "twiddle": lambda a, c: _probe_call(twiddle_k, a, c, bt, m,
                                            extra=(t1r, t1i)),
    }
    if m == _N1:
        out["transpose"] = lambda a, c: _probe_call(
            transpose_k, a, c, bt, m, out_m=_N1)
    return out, bt


def main():
    shapes = [(4096, 1024), (16384, 256), (8192, 512)]
    rows_list = [int(s) for s in
                 os.environ.get("ROWS", "4096,16384").split(",")]
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1)}))
    r = np.random.default_rng(0)
    for n, b in shapes:
        m = n // _N1
        xr = jnp.asarray(r.standard_normal((b, m, _N1)).astype(np.float32))
        xi = jnp.asarray(r.standard_normal((b, m, _N1)).astype(np.float32))
        ideal = 2 * b * n * 8  # one read + one write of both planes
        # XLA flat bar (fwd-only chain, rescaled)
        s = 1.0 / np.sqrt(n)
        xf = xr.reshape(b, n)
        xg = xi.reshape(b, n)
        t = per_iter(lambda st: tuple(
            v * s for v in _stockham(st[0], st[1], n, False)), (xf, xg))
        print(json.dumps({"probe": "xla_flat", "n": n, "batch": b,
                          "t_us": round(t * 1e6, 2),
                          "roofline": round(ideal / t / bw, 3)}))
        for rows in rows_list:
            probes, bt = probes_for(n, b, rows)
            for name, fn in probes.items():
                try:
                    tp = per_iter(lambda st: fn(st[0], st[1]), (xr, xi))
                except Exception as e:  # noqa: BLE001
                    print(json.dumps({"probe": name, "n": n, "rows": rows,
                                      "error": str(e)[:120]}))
                    continue
                print(json.dumps({"probe": name, "n": n, "batch": b,
                                  "rows": rows, "bt": bt,
                                  "t_us": round(tp * 1e6, 2),
                                  "roofline": round(ideal / tp / bw, 3)}))
        # shipped full kernels (natural + permuted), default rows
        for name, fn in (
                ("full_natural", lambda a, c: ps.sfft_stream_pallas(
                    a.reshape(b, n), c.reshape(b, n), n, False)),
                ("full_permuted", lambda a, c: ps.sfft_stream_pallas_permuted(
                    a.reshape(b, n), c.reshape(b, n), n, False))):
            tp = per_iter(lambda st: tuple(
                v.reshape(b, m, _N1) * s
                for v in fn(st[0], st[1])), (xr, xi))
            print(json.dumps({"probe": name, "n": n, "batch": b,
                              "t_us": round(tp * 1e6, 2),
                              "roofline": round(ideal / tp / bw, 3)}))


if __name__ == "__main__":
    main()
