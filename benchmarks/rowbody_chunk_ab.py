"""A/B: chunk the WHOLE real/DCT row-pass body at huge batch (round 5).

The 2-D row passes run _dct2_core/srfft at 2^26 elements; only their
inner complex FFT is batch-chunked (core._fft_any), while the
deinterleave/table-FMA/riffle passes around it execute as one fused
XLA program — the exact regime where round-2 measured chunked lax.map
recovering 1.8-2.9x for plain FFTs (BASELINE.md dispatch grid).

Bodies (roundtrip, per_iter/2): full vs lax.map over 128-row chunks of
the complete dct2+dct3 / rfft+irfft pipelines at (65536, 1024) — the
1024^2 b64 row-pass shape.  Appends to
benchmarks/results/ROWBODY_CHUNK_r05.jsonl.
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
    from cfftpack_tpu.ops import core
    dctmod = importlib.import_module("cfftpack_tpu.ops.dct")

    r = np.random.default_rng(0)
    results = []
    B, n = 65536, 1024
    bc = 128
    x = jnp.asarray(r.standard_normal((B, n)).astype(np.float32))
    s2 = np.float32(2.0 / n)
    sr = np.float32(1.0 / n)

    def dct_full(v):
        return dctmod._dct3_core(dctmod._dct2_core(v, n), n) * s2

    def dct_chunked(v):
        def one(c):
            return dctmod._dct3_core(dctmod._dct2_core(c, n), n) * s2
        return jax.lax.map(one, v.reshape(-1, bc, n)).reshape(B, n)

    def rfft_full(v):
        yr, yi = core.srfft(v, n)
        return core.sirfft(yr, yi, n) * sr

    def rfft_chunked(v):
        def one(c):
            yr, yi = core.srfft(c, n)
            return core.sirfft(yr, yi, n) * sr
        return jax.lax.map(one, v.reshape(-1, bc, n)).reshape(B, n)

    # numerics first (tiny slice)
    a = np.asarray(dct_chunked(x))[:4]
    b_ = np.asarray(dct_full(x))[:4]
    err = float(np.abs(a - b_).max() / max(1.0, np.abs(b_).max()))
    line = {"leg": "numerics", "err_dct_chunk_vs_full": err}
    print(json.dumps(line), flush=True)
    results.append(line)
    assert err < 1e-6

    row = {"leg": "ab", "B": B, "n": n, "chunk": bc}
    for name, body in (("dct_full", dct_full),
                       ("dct_chunked", dct_chunked),
                       ("rfft_full", rfft_full),
                       ("rfft_chunked", rfft_chunked)):
        try:
            row[name + "_us"] = round(_per_iter(body, x) / 2 * 1e6, 2)
        except Exception as e:                            # noqa: BLE001
            row[name + "_us"] = None
            row[name + "_err"] = repr(e)[:160]
        print(json.dumps({name: row.get(name + "_us")}), flush=True)
    results.append(row)
    print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "ROWBODY_CHUNK_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
