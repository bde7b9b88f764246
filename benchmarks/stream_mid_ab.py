"""Round-4 mid-range A/B: two-matmul kernel vs flat XLA vs the round-3
stream kernel at the VERDICT item-1 shapes.

All variants timed within ONE run (fwd-only chains, magnitude-
preserving rescale, slope method).  Numerics checked on-chip against
the XLA engine OUTSIDE the timing chains.  Appends JSON lines suitable
for benchmarks/results/STREAM_MID_AB_r04.jsonl.
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

from cfftpack_tpu.ops import pallas_stream as ps  # noqa: E402
from cfftpack_tpu.ops.core import _stockham, _fft_any  # noqa: E402


def main():
    shapes = [(4096, 1024), (8192, 512), (16384, 256), (32768, 256)]
    rows_list = [int(s) for s in os.environ.get("ROWS", "4096").split(",")]
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1)}))
    r = np.random.default_rng(0)
    for n, b in shapes:
        s = 1.0 / np.sqrt(n)
        xr = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        ideal = 2 * b * n * 8

        # on-chip numeric check vs the XLA engine (outside timing)
        yr0, yi0 = _stockham(xr[:8], xi[:8], n, False)
        yr1, yi1 = ps.sfft_mm2_pallas(xr[:8], xi[:8], n, False)
        ref = np.abs(np.asarray(yr0)) + np.abs(np.asarray(yi0))
        err = (np.abs(np.asarray(yr1) - np.asarray(yr0))
               + np.abs(np.asarray(yi1) - np.asarray(yi0))).max()
        rel = float(err / ref.max())
        print(json.dumps({"check": "mm2_vs_xla", "n": n,
                          "rel_err": f"{rel:.2e}"}))

        variants = {
            "xla_flat": lambda a, c: _stockham(a, c, n, False),
            "xla_dispatched": lambda a, c: _fft_any(a, c, n, False),
            "stream_r03_nat": lambda a, c: ps.sfft_stream_pallas(
                a, c, n, False),
        }
        for rows in rows_list:
            variants[f"mm2_nat_r{rows}"] = (
                lambda a, c, rw=rows: ps.sfft_mm2_pallas(a, c, n, False,
                                                         rw))
            variants[f"mm2_perm_r{rows}"] = (
                lambda a, c, rw=rows: ps.sfft_mm2_pallas_permuted(
                    a, c, n, False, rw))
        for name, fn in variants.items():
            try:
                t = per_iter(lambda st: tuple(
                    v * s for v in fn(st[0], st[1])), (xr, xi))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "n": n,
                                  "error": str(e)[:120]}))
                continue
            print(json.dumps({"variant": name, "n": n, "batch": b,
                              "t_us": round(t * 1e6, 2),
                              "roofline": round(ideal / t / bw, 3)}))


if __name__ == "__main__":
    main()
