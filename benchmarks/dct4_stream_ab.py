"""A/B: DCT-IV permuted-stream tail (dct._dct4_stream_tail — fused
post-phase + un-permute + riffle over the permuted stream kernel) vs
the shipped natural-order path, on-chip (round-5 verdict item 6).

Within-ONE-run comparisons (roundtrip dct4/dst4-free: dct4 is its own
inverse up to 2/n).  Appends to benchmarks/results/DCT4_STREAM_r05.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

POINTS = [(65536, 256), (131072, 64)]


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
    import jax.numpy as jnp
    dctmod = importlib.import_module("cfftpack_tpu.ops.dct")

    r = np.random.default_rng(0)
    results = []

    # numerics on-chip: gated path vs gate-off at a small-but-eligible
    # size is covered in tests; here assert vs f64 oracle once
    n0, b0 = 65536, 256
    x0 = r.standard_normal((2, n0)).astype(np.float32)
    j = np.arange(n0)
    got = np.asarray(dctmod._dct4_core(jnp.asarray(x0), n0))
    # spot oracle at 8 random bins (full n^2 oracle too slow)
    ks = r.integers(0, n0, 8)
    C = np.cos(np.pi * (ks[:, None] + 0.5) * (j[None, :] + 0.5) / n0)
    want = x0.astype(np.float64) @ C.T
    err = float(np.abs(got[:, ks] - want).max() / np.abs(want).max())
    line = {"leg": "numerics_onchip", "n": n0, "err_spot": err}
    print(json.dumps(line), flush=True)
    results.append(line)
    assert err < 1e-4, err

    for n, b in POINTS:
        x = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        s = np.float32(2.0 / n)        # dct4(dct4(x)) = (n/2) x

        def stream_rt(v):
            return dctmod._dct4_core(
                dctmod._dct4_core(v, n), n) * s

        def xla_rt(v):
            ok = dctmod._dct4_stream_ok
            dctmod._dct4_stream_ok = lambda *a: False
            try:
                out = dctmod._dct4_core(
                    dctmod._dct4_core(v, n), n) * s
            finally:
                dctmod._dct4_stream_ok = ok
            return out

        row = {"leg": "ab", "n": n, "b": b}
        for name, body in (("dct4_stream", stream_rt), ("dct4_xla", xla_rt)):
            try:
                row[name + "_us"] = round(
                    _per_iter(body, x) / 2 * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:200]
            print(json.dumps({name: row.get(name + "_us"), "n": n}),
                  flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "DCT4_STREAM_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
