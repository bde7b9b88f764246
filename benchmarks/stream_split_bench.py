"""One-run A/B: natural-order split-stream complex FFT
(sfft_stream_split, s-point XLA butterfly around inner stream kernels)
vs the currently-dispatched core.sfft engines, at n past the stream
kernel's whole-transform VMEM cap (m > 4096: n >= 2^20 pow2).

Bodies are unscaled fwd + unscaled inv roundtrips (exact identity x*n,
rescaled 1/n -> magnitude preserving); per-transform time = slope/2.
Sanity: each variant's numerics are checked outside the timing chain.

Usage: python benchmarks/stream_split_bench.py [n,b ...]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sweep import per_iter, hbm_bandwidth  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.ops import core
    from cfftpack_tpu.ops import pallas_stream as ps

    shapes = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
    if not shapes:
        shapes = [(1048576, 16), (1048576, 64), (2097152, 8)]
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1),
                      "device": jax.devices()[0].device_kind}))

    for n, b in shapes:
        r = np.random.default_rng(2)
        xr = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        inv_n = 1.0 / n

        def rt_core(s):
            yr, yi = core.sfft(s[0], s[1], n, False)
            zr, zi = core.sfft(yr, yi, n, True)
            return zr * inv_n, zi * inv_n

        def rt_split(s):
            yr, yi = ps.sfft_stream_split(s[0], s[1], n, False)
            zr, zi = ps.sfft_stream_split(yr, yi, n, True)
            return zr * inv_n, zi * inv_n

        # numerics outside the chain
        a = jax.jit(rt_split)((xr[:2], xi[:2]))
        err = float(max(jnp.abs(a[0] - xr[:2]).max(),
                        jnp.abs(a[1] - xi[:2]).max()))

        ideal = 2 * (2 * b * n * 8)       # 2 transforms, r+w of 2 planes
        lo, hi = 4, 24
        for name, body in (("fft_core_dispatch", rt_core),
                           ("fft_stream_split", rt_split)):
            t = per_iter(body, (xr, xi), lo=lo, hi=hi) / 2
            print(json.dumps({
                "metric": name, "n": n, "batch": b,
                "t_us_per_fft": round(t * 1e6, 1),
                "roofline_frac": round(ideal / 2 / t / bw, 4),
                **({"rt_err": round(err, 9)}
                   if name == "fft_stream_split" else {}),
            }))


if __name__ == "__main__":
    main()
