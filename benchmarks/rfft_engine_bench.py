"""One-run A/B: half-length vs batch-pair real-FFT engine (core.srfft).

Variants are compared WITHIN one run (cross-run tunnel variance ~2x;
CLAUDE.md).  Each variant gets a FRESH jax.jit closure so the module
engine flag is read at trace time.  Bodies are fwd+inv roundtrips; the
printed time is per transform (per_iter/2).

Usage: python benchmarks/rfft_engine_bench.py [n batch [n batch ...]]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter, hbm_bandwidth  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.ops import core

    args = [int(a) for a in sys.argv[1:]]
    shapes = (list(zip(args[0::2], args[1::2])) if args else
              [(1024, 4096), (4096, 1024), (16384, 256), (65536, 64),
               (1125, 2048)])
    bw = hbm_bandwidth()
    dev = jax.devices()[0]
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1),
                      "device": dev.device_kind}))

    for n, b in shapes:
        r = np.random.default_rng(0)
        v = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        ideal = 2 * (b * n * 4 + b * (n // 2 + 1) * 2 * 4)  # rw fwd+inv
        for engine in ("half", "pair"):
            if engine == "half" and n % 2:
                continue
            core._RFFT_ENGINE = engine

            @jax.jit
            def body(s):
                yr, yi = core.srfft(s, n)
                return core.sirfft(yr, yi, n) * (1.0 / n)

            t = per_iter(body, v) / 2.0
            print(json.dumps({
                "metric": f"rfft_{engine}", "n": n, "batch": b,
                "t_us_per_transform": round(t * 1e6, 2),
                "roofline_frac": round((ideal / 2 / t) / bw, 4),
            }))
    core._RFFT_ENGINE = "auto"


if __name__ == "__main__":
    main()
