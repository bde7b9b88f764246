"""dctn 2-D component A/B (round 4 follow-up to SWEEP2D_r04).

dctn-II at (64, 1024^2) measured 0.045 roofline — worse than the
composite of its parts (two chunked-regime 1-D passes + transposes)
predicts.  Components, all roundtrips (fwd+inv) within one run:

  axis1      dct2/idct2 along -1 only (the chunked-regime 1-D cost)
  axis0      dct2/idct2 along -2 only (adds the internal moveaxis)
  swap_form  explicit swapaxes + last-axis dct + swapaxes (does XLA
             handle an explicit transpose better than the moveaxis
             inside _apply_axis?)
  full       dctn/idctn over (-2, -1) (the shipped path)

Usage: python benchmarks/dctn2d_ab.py > benchmarks/results/DCTN2D_AB_r04.jsonl
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

import cfftpack_tpu as ct  # noqa: E402


def main():
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1)}))
    r = np.random.default_rng(0)
    for n, b in ((1024, 64), (4096, 4)):
        x = jnp.asarray(r.standard_normal((b, n, n)).astype(np.float32))
        ideal_axis = 2 * (b * n * n * 4) * 2   # rw real, fwd+inv

        @jax.jit
        def rt_swap(s):
            t = jnp.swapaxes(s, -1, -2)
            t = ct.idct(ct.dct(t, 2), 2)
            return jnp.swapaxes(t, -1, -2)

        variants = {
            "axis1": lambda s: ct.idct(ct.dct(s, 2), 2),
            "axis0": lambda s: ct.idct(ct.dct(s, 2, axis=-2), 2,
                                       axis=-2),
            "swap_form": rt_swap,
            "full": lambda s: ct.idctn(
                ct.dctn(s, type=2, axes=(-2, -1)), type=2,
                axes=(-2, -1)),
        }
        for name, body in variants.items():
            try:
                t = per_iter(body, x, lo=2, hi=10) / 2.0
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "n": n,
                                  "error": str(e)[:120]}))
                continue
            idl = ideal_axis if name != "full" else 2 * ideal_axis
            print(json.dumps({"variant": name, "n": n, "batch": b,
                              "t_us": round(t * 1e6, 1),
                              "roofline": round(
                                  (idl / 2) / t / bw, 4)}))


if __name__ == "__main__":
    main()
