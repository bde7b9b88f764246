"""Bare rfft at huge n: engine A/B (round-4 verdict item 2).

rfft roofline at (16384,256)/(65536,256) was 0.23/0.12 in SWEEP_r03.
The candidates that avoid the half-length path's deinterleave + merge
passes:

  half (status quo)   stride-2 pack, n/2 complex FFT (rides _fft_any,
                      incl. the stream kernel at eligible sizes),
                      slice+flip merge
  batchpair           z = x[2r] + i*x[2r+1] over BATCH rows (sublane-
                      cheap), FULL-length FFT at batch/2, mirror
                      separation.  Round 2 measured this LOSING for
                      even n BELOW 16384 (the full-width mirror read
                      cancels the saved deinterleave); never measured
                      at >= 16384 where the passes amortize
                      differently.

Both roundtrip (fwd+inv) so the separation/merge passes of each
formulation are fully exercised; numerics checked vs numpy outside
the timing chains.

Usage: python benchmarks/rfft_huge_ab.py > benchmarks/results/RFFT_HUGE_r04.jsonl
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


from cfftpack_tpu.ops import core  # noqa: E402


def main():
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1)}))
    r = np.random.default_rng(0)
    for n, b in ((16384, 256), (65536, 256)):
        x = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        ideal_rt = 2 * (b * n * 4 + b * (n + 2) * 4)

        # numerics (outside timing): batchpair vs numpy
        yr, yi = core._srfft_batchpair(x[:8], n)
        w = np.fft.rfft(np.asarray(x[:8], np.float64))
        err = (np.abs(np.asarray(yr) + 1j * np.asarray(yi) - w).max()
               / np.abs(w).max())
        print(json.dumps({"check": "batchpair_vs_numpy", "n": n,
                          "rel_err": f"{err:.2e}"}))

        def rt_half(s):
            a, c = core.srfft(s, n)
            return core.sirfft(a, c, n) * (1.0 / n)

        def rt_pair(s):
            a, c = core._srfft_batchpair(s, n)
            return core._sirfft_batchpair(a, c, n) * (1.0 / n)

        for name, body in (("half_status_quo", rt_half),
                           ("batchpair", rt_pair)):
            try:
                t = per_iter(body, x, lo=2, hi=12) / 2.0
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "n": n,
                                  "error": str(e)[:120]}))
                continue
            print(json.dumps({"variant": name, "n": n, "batch": b,
                              "t_us": round(t * 1e6, 2),
                              "roofline": round(
                                  (ideal_rt / 2) / t / bw, 3)}))


if __name__ == "__main__":
    main()
