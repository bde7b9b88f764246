"""Single-kernel forward-chain probe for the 65536 complex regime
(round-5 verdict item 3, second attempt).

The earlier roundtrip probes at (65536, 64) returned 0.0-slope garbage
twice — the known MULTI-KERNEL fori-body trap.  This probe chains the
PERMUTED forward kernel only: one pallas call per iteration, shape
stable (b, m, 128) -> (b, m, 128), magnitude preserved by the exact
2^-8 rescale (sqrt(65536)) — a single-op chain the tunnel measures
reliably (BASELINE.md bench protocol).

Legs per (n, b): permuted kernel at rows budgets {0, 512, 1024, 2048},
the natural-order entry (kernel + unpermute transpose; 2-op body,
less reliable — read comparatively), and the XLA fourstep fwd chain.
Appends to benchmarks/results/STREAM65K_FWD_r05.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


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


def _per_iter(body, state, lo=2, hi=22):
    return max((_loop_time(body, state, hi) - _loop_time(body, state, lo))
               / (hi - lo), 1e-9)


def main():
    import jax.numpy as jnp
    from cfftpack_tpu.ops import core
    from cfftpack_tpu.ops import pallas_stream as ps

    r = np.random.default_rng(0)
    results = []

    for n, b in ((65536, 64), (65536, 256)):
        m = n // 128
        s = np.float32(1.0 / np.sqrt(float(n)))
        assert s == 2.0 ** round(np.log2(s))
        ar = jnp.asarray(r.standard_normal((b, m, 128))
                         .astype(np.float32))
        ai = jnp.asarray(r.standard_normal((b, m, 128))
                         .astype(np.float32))
        af = ar.reshape(b, n)
        bf = ai.reshape(b, n)
        row = {"leg": "fwdchain", "n": n, "b": b,
               "ideal_us": round(b * n * 8 * 2 / 650e9 * 1e6, 1)}

        for rows in (0, 512, 1024, 2048):
            def perm_body(v, rows=rows):
                Zr, Zi = ps._stream_pallas_2d(v[0], v[1], n, False, rows)
                return Zr * s, Zi * s

            key = f"perm_rows{rows}_us"
            try:
                row[key] = round(_per_iter(perm_body, (ar, ai)) * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[key] = None
                row[key + "_err"] = repr(e)[:160]
            print(json.dumps({key: row[key], "b": b}), flush=True)

        def nat_body(v):
            Zr, Zi = ps.sfft_stream_pallas(v[0], v[1], n, False)
            return Zr * s, Zi * s

        def xla_body(v):
            Zr, Zi = core._fourstep_local(v[0], v[1], n, False)
            return Zr * s, Zi * s

        for key, body, st in (("natural_us", nat_body, (af, bf)),
                              ("fourstep_us", xla_body, (af, bf))):
            try:
                row[key] = round(_per_iter(body, st) * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[key] = None
                row[key + "_err"] = repr(e)[:160]
            print(json.dumps({key: row[key], "b": b}), flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "STREAM65K_FWD_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
