"""A/B: the fully-fused VMEM kernel (ops/pallas_fft.py) vs the shipped
XLA dispatch for LAST-AXIS transforms in the huge-batch regime
(bp * n >= 2^24, where core._fft_any falls back to chunked lax.map at
0.21-0.25 of roofline — BASELINE.md dispatch grid).

COLFFT_AB_r05's hugebatch_row leg measured the round-1 kernel WINNING
1.25x at (65536, 1024) — the first regime where it beats XLA (it loses
at 2^22-element sets, BASELINE.md round-2 Pallas findings).  This
sweep maps the win region to gate a dispatch.

Appends to benchmarks/results/ROWHUGE_AB_r05.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# (n, batch): 2^26- and 2^24-element programs across the chunked band
POINTS = [(512, 131072), (1024, 65536), (2048, 32768), (4096, 16384),
          (1024, 16384), (4096, 4096)]


def _loop_time(body, state, reps):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(s):
        out = jax.lax.fori_loop(0, reps, lambda i, v: body(v), s)
        return sum(jnp.sum(o * 1e-6) for o in jax.tree.leaves(out))

    float(prog(state))
    t = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(prog(state))
        t = min(t, time.perf_counter() - t0)
    return t


def _per_iter(body, state, lo, hi):
    return max((_loop_time(body, state, hi) - _loop_time(body, state, lo))
               / (hi - lo), 1e-9)


def main():
    import jax.numpy as jnp
    from cfftpack_tpu.ops import core
    from cfftpack_tpu.ops.pallas_fft import pallas_eligible, sfft_pallas

    r = np.random.default_rng(0)
    results = []

    for n, b in POINTS:
        assert pallas_eligible(n, jnp.float32)
        ar = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        ai = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        s = np.float32(1.0 / n)
        lo, hi = (2, 12) if b * n >= (1 << 25) else (2, 22)

        def pallas_rt(v):
            zr, zi = sfft_pallas(v[0], v[1], n, False)
            zr, zi = sfft_pallas(zr, zi, n, True)
            return zr * s, zi * s

        def xla_rt(v):
            zr, zi = core.sfft(v[0], v[1], n, inverse=False)
            zr, zi = core.sfft(zr, zi, n, inverse=True)
            return zr * s, zi * s

        row = {"leg": "rowhuge", "n": n, "b": b,
               "elems_log2": int(np.log2(b * n))}
        for name, body in (("pallas", pallas_rt), ("xla", xla_rt)):
            try:
                row[name + "_us"] = round(
                    _per_iter(body, (ar, ai), lo, hi) / 2 * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:200]
            print(json.dumps({name: row.get(name + "_us"), "n": n,
                              "b": b}), flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "ROWHUGE_AB_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
