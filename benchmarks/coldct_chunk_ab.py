"""A/B: column-DCT formulations after the whole-body-chunk win
(round 5 follow-up).  At (64, 1024, 1024):

  a) coldct       — pair + column kernel + one fused merge (shipped)
  b) coldct_chunk — same, lax.map over image chunks (the merge/gather
                    passes otherwise run fused at 2^26 elements)
  c) moveaxis     — transpose + CHUNKED last-axis dct + transpose
                    (the row-body chunk win applied to the column)

Roundtrip dct2+dct3 over axis -2, per_iter/2 per transform.  Appends
to benchmarks/results/COLDCT_CHUNK_r05.jsonl.
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


def _per_iter(body, state, lo=2, hi=12):
    return max((_loop_time(body, state, hi) - _loop_time(body, state, lo))
               / (hi - lo), 1e-9)


def main():
    import importlib
    import jax
    import jax.numpy as jnp
    dctmod = importlib.import_module("cfftpack_tpu.ops.dct")

    r = np.random.default_rng(0)
    results = []

    for b, n0, n1 in ((64, 1024, 1024), (4, 4096, 4096)):
        x = jnp.asarray(r.standard_normal((b, n0, n1))
                        .astype(np.float32))
        s = np.float32(2.0 / n0)
        ic = max(2, min(16, b // 2 * 2 // max(1, b // 16)))  # images/chunk

        def col_rt(v):
            y = dctmod._coldct2_core(v, n0)
            return dctmod._coldct3_core(y, n0) * s

        def col_chunk_rt(v):
            def one(c):
                y = dctmod._coldct2_core(c, n0)
                return dctmod._coldct3_core(y, n0) * s
            cb = 2 if b <= 8 else 8
            return jax.lax.map(
                one, v.reshape(-1, cb, n0, n1)).reshape(b, n0, n1)

        def moveaxis_rt(v):
            vm = jnp.swapaxes(v, -2, -1)
            y = dctmod._dct2_core(vm, n0)       # body-chunked inside
            z = dctmod._dct3_core(y, n0) * s
            return jnp.swapaxes(z, -2, -1)

        row = {"leg": "ab", "b": b, "n0": n0, "n1": n1}
        for name, body in (("coldct", col_rt),
                           ("coldct_chunk", col_chunk_rt),
                           ("moveaxis_chunk", moveaxis_rt)):
            try:
                row[name + "_us"] = round(
                    _per_iter(body, x) / 2 * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:160]
            print(json.dumps({name: row.get(name + "_us"), "n0": n0}),
                  flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "COLDCT_CHUNK_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
