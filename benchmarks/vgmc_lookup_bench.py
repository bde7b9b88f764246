"""A/B the inverse-CDF lookup idiom inside the VG MC device program.

The draw stage maps uniform p -> grid bin j = lower_bound(cdf, p) over
a 2048-entry monotone CDF, for 10^5..10^7 draws.  Candidate idioms:

* scan       — jnp.searchsorted(method="scan"): log2(n) sequential
               gather rounds (int-heavy; the axon backend runs int
               code poorly — see BASELINE.md Halton A/B)
* sort       — jnp.searchsorted(method="sort"): one co-sort of
               (cdf, draws)
* itable     — two-level inverse table: quantize p to L levels, one
               small searchsorted builds table[l] = lower_bound(cdf,
               l/L) (device, L x log n), then each draw is ONE gather
               + at most a +1 comparison fixup.  Exactness: table cell
               l spans bins [table[l], table[l+1]]; within the cell the
               true lower_bound differs from table[l] only where
               cdf[j] splits the cell, fixed up by k comparison steps
               against the next k cdf values (k=2 covers cells spanning
               <= 2 occupied bins; tail cells span many EMPTY bins
               whose probability mass is < 1/L each).
* baseline   — no lookup (uniform + exp + mean): the floor.

Each variant prices with the same draws; printed price deltas vs scan
bound the idiom's bias.

Usage: python benchmarks/vgmc_lookup_bench.py
"""
from __future__ import annotations

import json
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cfftpack_tpu.models import montecarlo as mc  # noqa: E402

S, K, SIGMA, THETA, KAPPA, R, T = 100.0, 98.0, 0.12, -0.14, 0.2, 0.05, 1.0
N = 2048
LEVELS = 1 << 14


@partial(jax.jit, static_argnums=(1, 2))
def price(seed, samples: int, idiom: str, cdf, dx, params):
    S_, K_, r_, t_ = params
    n = cdf.shape[0]
    N2 = n // 2
    p = jax.random.uniform(jax.random.PRNGKey(seed), (samples,),
                           jnp.float32)
    if idiom == "baseline":
        j = (p * n).astype(jnp.int32)
    elif idiom == "itable":
        lv = (jnp.arange(LEVELS, dtype=jnp.float32)) / LEVELS
        table = jnp.searchsorted(cdf, lv).astype(jnp.int32)
        l = jnp.minimum((p * LEVELS).astype(jnp.int32), LEVELS - 1)
        j = table[l]
        for _ in range(2):   # fixup: advance while cdf[j] < p
            j = j + (cdf[jnp.minimum(j, n - 1)] < p)
        j = jnp.minimum(j, n - 1)
    else:
        j = jnp.minimum(jnp.searchsorted(cdf, p, method=idiom), n - 1)
    x = (j.astype(jnp.float32) - N2) * dx
    pay = jnp.maximum(S_ * jnp.exp(x) - K_, 0.0)
    return jnp.mean(pay) * jnp.exp(-r_ * t_)


def main():
    dev = jax.devices()[0]
    print(json.dumps({"metric": "device", "kind": dev.device_kind}),
          flush=True)
    out, pdf = mc.vg_distribution_grid(SIGMA, THETA, KAPPA, R, T, N)
    cdf = jnp.asarray(np.cumsum(pdf), jnp.float32)
    dx = jnp.asarray(float(out[1] - out[0]), jnp.float32)
    params = tuple(jnp.asarray(v, jnp.float32) for v in (S, K, R, T))

    for samples in (100000, 1048576, 16777216):
        row = {"metric": "vgmc_lookup", "samples": samples}
        for idiom in ("baseline", "scan", "sort", "itable"):
            def body(s, idiom=idiom):
                pr = price(s, samples, idiom, cdf, dx, params)
                return s + 1 + (pr * 0).astype(jnp.int32)
            pr = float(price(jnp.int32(0), samples, idiom, cdf, dx,
                             params))
            hi = max(8, min(204, (1 << 25) // samples))
            t = per_iter(body, jnp.int32(0), lo=4, hi=hi)
            row[f"{idiom}_us_per_draw"] = round(t / samples * 1e6, 5)
            row[f"{idiom}_price"] = round(pr, 6)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
