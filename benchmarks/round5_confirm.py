"""Round-5 confirmation bundle (one TPU run, within-run comparisons):

1. numerics: split-stream dispatch at n=2^20 vs the chunked engine.
2. rows budget at large m: default(now 2048) vs 4096 vs 1024 at
   (131072, 64) and (262144, 32) — confirms the STREAM65K_r05 signal.
3. column DCT-II/III (dct._coldct*_core) vs the moveaxis path at the
   SWEEP2D dctn shapes.
4. shipped 2^20 path (now split-stream) vs the old fourstep fallback.

Appends to benchmarks/results/ROUND5_CONFIRM.jsonl.
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
    from cfftpack_tpu.ops import pallas_stream as ps
    dctmod = importlib.import_module("cfftpack_tpu.ops.dct")

    r = np.random.default_rng(0)
    results = []

    # --- 1. split-stream numerics at 2^20 (dispatch engages in core)
    n = 1 << 20
    xr = jnp.asarray(r.standard_normal((2, n)).astype(np.float32))
    xi = jnp.asarray(r.standard_normal((2, n)).astype(np.float32))
    ar, ai = jax.jit(core._fft_any, static_argnums=(2, 3))(
        xr, xi, n, False)
    br, bi = jax.jit(core._fourstep_local, static_argnums=(2, 3))(
        xr, xi, n, False)
    g = np.asarray(ar) + 1j * np.asarray(ai)
    w = np.asarray(br) + 1j * np.asarray(bi)
    err = float(np.abs(g - w).max() / np.abs(w).max())
    line = {"leg": "split2e20_numerics", "n": n, "err_vs_fourstep": err}
    print(json.dumps(line), flush=True)
    results.append(line)
    assert err < 5e-6, err

    # --- 2. rows budget at large m
    for n, b in ((131072, 64), (262144, 32)):
        m = n // 128
        ar = jnp.asarray(r.standard_normal((b, m, 128))
                         .astype(np.float32))
        ai = jnp.asarray(r.standard_normal((b, m, 128))
                         .astype(np.float32))
        s = np.float32(1.0 / n)
        row = {"leg": "rows_confirm", "n": n, "b": b}
        for rows in (1024, 2048, 4096):
            def body(v, rows=rows):
                Zr, Zi = ps._stream_pallas_2d(v[0], v[1], n, False, rows)
                yr, yi = ps._stream_pallas_2d(Zr, Zi, n, True, rows)
                return yr * s, yi * s

            key = f"rows{rows}_us"
            try:
                row[key] = round(_per_iter(body, (ar, ai)) / 2 * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[key] = None
                row[key + "_err"] = repr(e)[:160]
            print(json.dumps({key: row[key], "n": n}), flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    # --- 3. column DCT vs moveaxis path
    for b, n0, n1 in ((64, 1024, 1024), (4, 4096, 4096)):
        x = jnp.asarray(r.standard_normal((b, n0, n1))
                        .astype(np.float32))
        sc = np.float32(2.0 / n0)

        def col_rt(v):
            y = dctmod._coldct2_core(v, n0)
            return dctmod._coldct3_core(y, n0) * sc

        def xla_rt(v):
            vm = jnp.swapaxes(v, -2, -1)
            y = dctmod._dct2_core(vm, n0)
            z = dctmod._dct3_core(y, n0) * sc
            return jnp.swapaxes(z, -2, -1)

        row = {"leg": "coldct", "b": b, "n0": n0, "n1": n1}
        for name, body in (("coldct", col_rt), ("dct_xla", xla_rt)):
            try:
                row[name + "_us"] = round(
                    _per_iter(body, x) / 2 * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:200]
            print(json.dumps({name: row.get(name + "_us"), "n0": n0}),
                  flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    # --- 4. shipped 2^20 vs old fallback, timed
    n, b = 1 << 20, 8
    xr = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
    xi = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
    s = np.float32(1.0 / n)

    def ship_rt(v):
        ar, ai = core._fft_any(v[0], v[1], n, False)
        br, bi = core._fft_any(ar, ai, n, True)
        return br * s, bi * s

    def four_rt(v):
        ar, ai = core._fourstep_local(v[0], v[1], n, False)
        br, bi = core._fourstep_local(ar, ai, n, True)
        return br * s, bi * s

    row = {"leg": "n2e20_shipped", "n": n, "b": b}
    for name, body in (("shipped_split", ship_rt),
                       ("fourstep_old", four_rt)):
        try:
            row[name + "_us"] = round(
                _per_iter(body, (xr, xi), 2, 8) / 2 * 1e6, 2)
        except Exception as e:                            # noqa: BLE001
            row[name + "_us"] = None
            row[name + "_err"] = repr(e)[:200]
        print(json.dumps(row), flush=True)
    results.append(row)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "ROUND5_CONFIRM.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
