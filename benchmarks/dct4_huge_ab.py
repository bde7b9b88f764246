"""dct4 mid/huge-n component A/B (round-4 verdict item 7).

dct4's half-length sub-FFT rides core._fft_any (and thus the stream
kernel at eligible n); its pre stage (stride-2 + flip reads, quarter-
phase rotation) and post stage (rotation + the riffle interleave) do
not.  This measures where the time actually goes at (16384, 256) and
(65536, 256) — all within one run:

  dct4_full    ct.dct(x, 4) roundtrip/2 (public path)
  subfft       bare core.sfft at h = n/2, same batch (the ceiling the
               pre/post overhead is judged against)
  pre_subfft   pre stage + sub-FFT (adds the strided/flip reads)
  nopost       pre + sub-FFT + post rotation (no riffle)

The riffle premium = dct4_full - nopost; the pre premium =
pre_subfft - subfft.  BASELINE.md "DCT-IV pass economics" records the
round-2/3 evidence that both stages are Mosaic-inexpressible as stream
kernel prologue/epilogue (lane-strided reads; lane-interleave stores).

Usage: python benchmarks/dct4_huge_ab.py > benchmarks/results/DCT4_HUGE_r04.jsonl
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.sweep import per_iter, hbm_bandwidth  # noqa: E402

import jax.numpy as jnp  # noqa: E402

import cfftpack_tpu as ct  # noqa: E402
from cfftpack_tpu.ops import core  # noqa: E402


def _pre(x, n):
    h = n // 2
    p = np.arange(h)
    cr = x[..., 0::2]
    ci = x[..., ::-1][..., 0::2]
    pre = np.exp(-1j * np.pi * p / n)
    wr = cr * jnp.asarray(pre.real, x.dtype) - ci * jnp.asarray(
        pre.imag, x.dtype)
    wi = cr * jnp.asarray(pre.imag, x.dtype) + ci * jnp.asarray(
        pre.real, x.dtype)
    return wr, wi


def _post(Wr, Wi, n):
    h = n // 2
    p = np.arange(h)
    post = np.exp(-1j * np.pi * (2 * p + 0.5) / (2 * n))
    zr = Wr * jnp.asarray(post.real, Wr.dtype) - Wi * jnp.asarray(
        post.imag, Wr.dtype)
    zi = Wr * jnp.asarray(post.imag, Wr.dtype) + Wi * jnp.asarray(
        post.real, Wr.dtype)
    return zr, zi


def main():
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1)}))
    r = np.random.default_rng(0)
    for n, b in ((16384, 256), (65536, 256)):
        h = n // 2
        x = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        xr = jnp.asarray(r.standard_normal((b, h)).astype(np.float32))
        xi = jnp.asarray(r.standard_normal((b, h)).astype(np.float32))
        ideal = 2 * b * n * 4           # rw of the real plane
        sh = 1.0 / np.sqrt(h)

        variants = {
            "dct4_full": (lambda s: ct.idct(ct.dct(s, 4), 4), x, 2,
                          2 * ideal),
            "subfft": (lambda s: tuple(
                v * sh for v in core.sfft(s[0], s[1], h, False)),
                (xr, xi), 1, ideal),
            # fori state must keep its shape: the (b, h) pairs are
            # re-packed to (b, n) with a concat (the two halves write
            # into one output buffer; no extra pass observed in HLO)
            "pre_subfft": (lambda s: jnp.concatenate(
                [v * sh for v in core.sfft(*_pre(s, n), h, False)],
                axis=-1), x, 1, ideal),
            "nopost": (lambda s: jnp.concatenate(
                _post(*[v * sh for v in core.sfft(*_pre(s, n), h,
                                                  False)], n),
                axis=-1), x, 1, ideal),
        }
        for name, (body, state, ntrans, idl) in variants.items():
            try:
                t = per_iter(body, state, lo=2, hi=12)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "n": n,
                                  "error": str(e)[:120]}))
                continue
            tper = t / ntrans
            print(json.dumps({"variant": name, "n": n, "batch": b,
                              "t_us": round(tper * 1e6, 2),
                              "roofline": round(
                                  (idl / ntrans) / tper / bw, 3)}))


if __name__ == "__main__":
    main()
