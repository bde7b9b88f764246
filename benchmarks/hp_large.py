"""hp (df64) engine large-n A/B: flat vs four-step vs chunked (round 4).

Round-3 verdict item 4: `hp.sfft_hp` ran one flat df stockham schedule
at every n, so hp at n >= 16384 likely falls off the same HBM cliff the
f32 engine fixed in round 2.  This measures the candidate engines
within ONE run (fwd-only chains, exact 2^-k rescale, slope method) at
2^22-element working sets (4 planes => 2x the f32 pair's bytes), plus
a small-batch config for the four-step crossover.

Variant numerics are checked against the FLAT hp engine outside the
timing chains (alias check — no extra oracle compiles).

Usage: python benchmarks/hp_large.py > benchmarks/results/HP_LARGE_r04.jsonl
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

from cfftpack_tpu.ops import hp  # noqa: E402


def main():
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1)}))
    r = np.random.default_rng(0)
    # (n, b): 2^22-elem row, then the small-batch four-step row
    configs = [(1024, 4096), (4096, 1024), (16384, 256), (65536, 64),
               (65536, 128)]
    for n, b in configs:
        dn = float(1.0 / np.sqrt(n))
        assert dn == 2.0 ** round(np.log2(dn))
        xr = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        quad = (xr, jnp.zeros_like(xr), xi, jnp.zeros_like(xi))
        ideal = 4 * b * n * 4 * 2   # rw of all 4 f32 planes

        variants = {
            "hp_flat": lambda s: hp._sfft_hp_jit(*s, n, False, False),
            "hp_dispatched": lambda s: hp._fft_any_hp(*s, n, False,
                                                      False),
        }
        from cfftpack_tpu.ops.core import _fourstep_split_n
        if _fourstep_split_n(n) is not None and n >= 4096:
            variants["hp_fourstep"] = lambda s: hp._fourstep_hp_jit(
                *s, n, False, False)
            if b % 32 == 0:
                variants["hp_chunk4_32"] = lambda s: hp._chunked_hp_jit(
                    *s, n, False, False, 32, True)
        if b % 128 == 0 and b >= 256:
            variants["hp_chunkflat_128"] = lambda s: hp._chunked_hp_jit(
                *s, n, False, False, 128, False)

        # numeric alias check vs flat (outside timing; full batch —
        # the chunked variants need their bc divisibility)
        ref = [np.asarray(v) for v in hp._sfft_hp_jit(*quad, n, False,
                                                      False)]
        for name, fn in variants.items():
            if name == "hp_flat":
                continue
            try:
                got = [np.asarray(v) for v in fn(quad)]
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"check": name, "n": n,
                                  "error": str(e)[:120]}))
                continue
            # compare VALUES (hi+lo in f64), not planes: two correct df
            # splits of the same value may put ~1 ulp(hi) in different
            # planes (plane-wise comparison misreads that as ~1e-9)
            gv = [got[0].astype(np.float64) + got[1],
                  got[2].astype(np.float64) + got[3]]
            rv = [ref[0].astype(np.float64) + ref[1],
                  ref[2].astype(np.float64) + ref[3]]
            scale = max(np.abs(rv[0]).max(), np.abs(rv[1]).max())
            err = max(np.abs(g - rf).max() for g, rf in zip(gv, rv))
            print(json.dumps({"check": name, "n": n,
                              "rel_err_vs_flat": f"{err / scale:.2e}"}))

        for name, fn in variants.items():
            def body(s, fn=fn):
                out = fn(s)
                return tuple(a * np.float32(dn) for a in out)
            try:
                t = per_iter(body, quad, lo=2, hi=10)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "n": n,
                                  "error": str(e)[:120]}))
                continue
            print(json.dumps({"variant": name, "n": n, "batch": b,
                              "t_us": round(t * 1e6, 2),
                              "roofline": round(ideal / t / bw, 3)}))


if __name__ == "__main__":
    main()
