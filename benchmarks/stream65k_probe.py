"""Round-5 verdict item 3: profile the >=65536 complex stream regime.

At (65536, 64) the stream kernel's grid has only b/bt = 8 steps
(bt = _ROW_BUDGET//m = 8) — suspected DMA-pipeline starvation: too few
grid steps for Pallas's double-buffering to hide the HBM DMA behind
the stage bodies, and the last/first tiles' DMA is always exposed.

Probe: sweep the per-grid-step sublane-row budget (``rows`` argument,
bt = rows // m) at (65536, 64), (65536, 256) and (131072, 64) with the
PERMUTED roundtrip (no natural-order transpose pollution), plus the
natural-order entry at the winner.  Also sweeps n=2^20 via the s-way
split path (sfft_stream_split) vs the chunked XLA dispatch.

Appends to benchmarks/results/STREAM65K_r05.jsonl.
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
    import jax.numpy as jnp
    from cfftpack_tpu.ops import pallas_stream as ps
    from cfftpack_tpu.ops import core

    r = np.random.default_rng(0)
    results = []

    for n, b in [(65536, 64), (65536, 256), (131072, 64)]:
        m = n // 128
        ar = jnp.asarray(r.standard_normal((b, m, 128))
                         .astype(np.float32))
        ai = jnp.asarray(r.standard_normal((b, m, 128))
                         .astype(np.float32))
        s = np.float32(1.0 / n)
        row = {"leg": "rows_sweep", "n": n, "b": b}
        for rows in (0, 512, 1024, 2048, 8192, 16384):
            bt = max(1, (rows or 4096) // m)
            if bt > b:
                continue

            def body(v, rows=rows):
                Zr, Zi = ps._stream_pallas_2d(v[0], v[1], n, False, rows)
                yr, yi = ps._stream_pallas_2d(Zr, Zi, n, True, rows)
                return yr * s, yi * s

            key = f"rows{rows}_bt{bt}_us"
            try:
                row[key] = round(
                    _per_iter(body, (ar, ai)) / 2 * 1e6, 2)
            except Exception as e:                    # noqa: BLE001
                row[key] = None
                row[key + "_err"] = repr(e)[:160]
            print(json.dumps({key: row[key], "n": n, "b": b}),
                  flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    # n = 2^20 single chip: split stream vs shipped dispatch
    n, b = 1 << 20, 8
    xr = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
    xi = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
    s = np.float32(1.0 / n)

    def split_rt(v):
        ar, ai = ps.sfft_stream_split(v[0], v[1], n, False)
        br, bi = ps.sfft_stream_split(ar, ai, n, True)
        return br * s, bi * s

    def ship_rt(v):
        ar, ai = core._fft_any(v[0], v[1], n, False)
        br, bi = core._fft_any(ar, ai, n, True)
        return br * s, bi * s

    row = {"leg": "n2e20", "n": n, "b": b}
    for name, body in (("split_stream", split_rt), ("shipped", ship_rt)):
        try:
            row[name + "_us"] = round(
                _per_iter(body, (xr, xi), 2, 8) / 2 * 1e6, 2)
        except Exception as e:                        # noqa: BLE001
            row[name + "_us"] = None
            row[name + "_err"] = repr(e)[:160]
        print(json.dumps(row), flush=True)
    results.append(row)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "STREAM65K_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
