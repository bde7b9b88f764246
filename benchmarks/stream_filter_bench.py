"""One-run A/B: fused streaming-filter pipeline (batch-pair pack +
permuted stream kernels + in-kernel F-multiply) vs the round-2 fused
rfilter path (deinterleave + half-length FFTs + merge-FMA + interleave)
at huge-n shapes.

Protocol (CLAUDE.md bench discipline): variants compared WITHIN one
run; the chained fori body is one full filter pipeline per iteration
with a PHASE-ONLY filter (|F| = 1) so magnitudes are preserved across
the chain; numerics are checked outside the timing chain.

Usage: python benchmarks/stream_filter_bench.py [n,b n,b ...]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from sweep import per_iter, hbm_bandwidth  # noqa: E402


def main():
    import importlib

    import jax
    import jax.numpy as jnp
    rmod = importlib.import_module("cfftpack_tpu.ops.rfft")

    shapes = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]]
    if not shapes:
        shapes = [(65536, 256), (131072, 128), (1048576, 16),
                  (1048576, 80)]
    bw = hbm_bandwidth()
    dev = jax.devices()[0]
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1),
                      "device": dev.device_kind}))

    for n, b in shapes:
        r = np.random.default_rng(1)
        v = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        theta = r.uniform(0, 2 * np.pi, n // 2 + 1)
        theta[0] = 0.0          # real DC/Nyquist (a real filter's rfft)
        theta[-1] = 0.0
        fr = jnp.asarray(np.cos(theta).astype(np.float32))
        fi = jnp.asarray(np.sin(theta).astype(np.float32))

        # call the two fused bodies DIRECTLY (no dispatch gate): the
        # round-2 XLA path vs the round-3 streaming-pallas path, both
        # scaled 1/n (the fftpack-norm pipeline) so the chain preserves
        # magnitude under the phase-only filter
        def mk(bodyfn):
            def f(s):
                return bodyfn(s, fr, fi, n) * (1.0 / n)
            return jax.jit(f)

        old = mk(rmod._rfilter_fused_xla)
        if not rmod._use_stream_filter(v, fr, fi, n):
            print(json.dumps({"metric": "filter_stream", "n": n,
                              "batch": b, "skipped": "ineligible"}))
            new = None
        else:
            new = mk(rmod._rfilter_stream)

        # numerics outside the timing chain
        err = 0.0
        if new is not None:
            a = np.asarray(old(v[:8]))
            c = np.asarray(new(v[:8]))
            err = float(np.abs(a - c).max() / max(1e-9, np.abs(a).max()))

        ideal = 2 * b * n * 4          # read x + write out
        for name, body in (("filter_old", old),
                           ("filter_stream", new)):
            if body is None:
                continue
            lo, hi = (4, 54) if b * n >= (1 << 24) else (4, 204)
            t = per_iter(body, v, lo=lo, hi=hi)
            print(json.dumps({
                "metric": name, "n": n, "batch": b,
                "t_us_per_call": round(t * 1e6, 1),
                "roofline_frac": round(ideal / t / bw, 4),
                **({"rel_err_vs_old": round(err, 9)}
                   if name == "filter_stream" else {}),
            }))


if __name__ == "__main__":
    main()
