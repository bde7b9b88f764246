"""Prime/Bluestein length on-chip coverage (round-4 verdict item 5).

Measures fft_split at prime n (the reference's cfftextra O(n^2) gap —
cfftextra.h:24-28 falls back to a dense DFT on large primes; this
framework runs Bluestein chirp-z everywhere) plus the round-4
stream-eligible-pad A/B at huge prime n: the default 5-smooth pad is
rarely a multiple of 128, so the two inner length-m FFTs fall off the
stream kernel; core._stream_pad_for_bluestein picks a 128*5-smooth
pad when that costs <= 15% more elements.

Roofline fractions use the BARE ideal 2*n*8 bytes/transform — for
Bluestein that is intentionally pessimistic (the algorithm does ~2
length-m FFTs + 3 elementwise passes, m ~ 2n), so also emitted:
`m`, `vs_smooth` = t(prime n) / t(next 5-smooth n) within the run.

Usage: python benchmarks/prime_bench.py > benchmarks/results/PRIME_r04.jsonl
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
from cfftpack_tpu import plan  # noqa: E402
from cfftpack_tpu.ops import core  # noqa: E402


def main():
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1)}))
    r = np.random.default_rng(0)
    # (prime n, batch) at ~2^22-elem working sets
    configs = [(1009, 4096), (4099, 1024), (65537, 64)]
    if os.environ.get("PRIME_CONFIGS"):          # e.g. "65537:64"
        configs = [tuple(int(v) for v in c.split(":"))
                   for c in os.environ["PRIME_CONFIGS"].split(",")]
    for n, b in configs:
        xr = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        ideal = 2 * b * n * 8
        m0 = plan.fft_next_fast_size(2 * n - 1)
        ms = core._stream_pad_for_bluestein(n, b, np.float32)

        # numeric check vs numpy (outside timing, few rows)
        got = ct.fft_split(xr[:4], xi[:4], norm="ortho")
        w = np.fft.fft(np.asarray(xr[:4], np.float64)
                       + 1j * np.asarray(xi[:4], np.float64),
                       norm="ortho")
        gc = np.asarray(got[0]) + 1j * np.asarray(got[1])
        print(json.dumps({"check": "fft_vs_numpy", "n": n,
                          "rel_err": f"{np.abs(gc - w).max() / np.abs(w).max():.2e}"}))

        ns = plan.fft_next_fast_size(n)
        xs = jnp.asarray(
            r.standard_normal((b, ns)).astype(np.float32))
        ys = jnp.asarray(
            r.standard_normal((b, ns)).astype(np.float32))

        t_auto = per_iter(lambda st: ct.fft_split(
            st[0], st[1], norm="ortho"), (xr, xi), lo=2, hi=10)
        print(json.dumps({"variant": "bluestein_auto", "n": n,
                          "batch": b, "m": ms if ms else m0,
                          "t_us": round(t_auto * 1e6, 2),
                          "roofline_bare": round(ideal / t_auto / bw,
                                                 3)}))
        if ms is not None:
            orig = core._stream_pad_for_bluestein
            core._stream_pad_for_bluestein = lambda *a: None
            try:
                t_def = per_iter(lambda st: ct.fft_split(
                    st[0], st[1], norm="ortho"), (xr, xi), lo=2, hi=10)
            finally:
                core._stream_pad_for_bluestein = orig
            print(json.dumps({"variant": "bluestein_default_pad",
                              "n": n, "batch": b, "m": m0,
                              "t_us": round(t_def * 1e6, 2),
                              "speedup_stream_pad": round(
                                  t_def / t_auto, 3)}))
        t_s = per_iter(lambda st: ct.fft_split(
            st[0], st[1], norm="ortho"), (xs, ys), lo=2, hi=10)
        print(json.dumps({"variant": "smooth_neighbor", "n": ns,
                          "batch": b, "t_us": round(t_s * 1e6, 2),
                          "vs_smooth": round(t_auto / t_s, 2)}))


if __name__ == "__main__":
    main()
