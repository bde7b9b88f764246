"""A/B: streaming real-transform Pallas kernels (ops/pallas_rstream.py)
vs the shipped XLA real paths, on-chip (round-5 verdict items 1/6).

Within-ONE-run comparisons only (tunnel variance; BASELINE.md bench
protocol).  Chains a fwd+inv roundtrip of a SINGLE transform family per
measurement (per_iter/2 is per-transform) with magnitude-preserving
scaling.  Emits one JSON line per point to stdout and
benchmarks/results/RSTREAM_AB_r05.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

POINTS = [(16384, 256), (32768, 256), (65536, 64), (65536, 256),
          (131072, 64)]


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
    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.ops import core
    import importlib
    dctmod = importlib.import_module("cfftpack_tpu.ops.dct")
    from cfftpack_tpu.ops import pallas_rstream as rs
    from cfftpack_tpu.ops import pallas_stream as ps

    r = np.random.default_rng(0)
    out_path = "benchmarks/results/RSTREAM_AB_r05.jsonl"
    results = []

    # on-chip numerics first (small size, fast compile)
    n0 = 2048
    x0 = r.standard_normal((4, n0)).astype(np.float32)
    want = np.fft.rfft(x0.astype(np.float64))
    yr, yi = jax.jit(rs.srfft_stream_pallas,
                     static_argnums=1)(jnp.asarray(x0), n0)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    err_r = float(np.abs(got - want).max() / np.abs(want).max())
    back = np.asarray(jax.jit(rs.sirfft_stream_pallas,
                              static_argnums=2)(yr, yi, n0)) / n0
    err_i = float(np.abs(back - x0).max())
    d1 = np.asarray(jax.jit(rs.sdct2_stream_pallas,
                            static_argnums=1)(jnp.asarray(x0), n0))
    d2 = np.asarray(dctmod._dct2_core(jnp.asarray(x0), n0))
    err_d2 = float(np.abs(d1 - d2).max() / np.abs(d2).max())
    d3 = np.asarray(jax.jit(rs.sdct3_stream_pallas,
                            static_argnums=1)(jnp.asarray(x0), n0))
    d4 = np.asarray(dctmod._dct3_core(jnp.asarray(x0), n0))
    err_d3 = float(np.abs(d3 - d4).max() / np.abs(d4).max())
    line = {"leg": "numerics_onchip", "n": n0,
            "err_rfft": err_r, "err_irfft_rt": err_i,
            "err_dct2": err_d2, "err_dct3": err_d3}
    print(json.dumps(line), flush=True)
    results.append(line)
    assert max(err_r, err_d2, err_d3) < 1e-5 and err_i < 1e-4

    for n, b in POINTS:
        x = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        s = np.float32(1.0 / n)
        lo, hi = (2, 12) if n * b >= (1 << 24) else (2, 22)

        def xla_rt(v):
            yr, yi = core.srfft(v, n)
            return core.sirfft(yr, yi, n) * s

        def krn_rt(v):
            yr, yi = rs.srfft_stream_pallas(v, n)
            return rs.sirfft_stream_pallas(yr, yi, n) * s

        def pair_kernel_rt(v):
            # lower bound: the bare permuted complex kernel at B/2
            # rows (what the pair trick wraps)
            x3 = v.reshape(-1, 2, n // 128, 128)
            ar, ai = ps._stream_pallas_2d(x3[:, 0], x3[:, 1], n, False)
            br, bi = ps._stream_pallas_2d(ar, ai, n, True)
            return jnp.stack([br, bi], axis=1).reshape(b, n) * s

        def pair_natural_rt(v):
            # variant C: batch-pair merge in NATURAL spectrum space over
            # the stream-backed sfft (kernel + unpermute transpose, then
            # slice+flip merge — core._srfft_batchpair over _fft_any)
            yr, yi = core._srfft_batchpair(v, n)
            return core._sirfft_batchpair(yr, yi, n) * s

        def dct_xla_rt(v):
            return dctmod._dct3_core(
                dctmod._dct2_core(v, n), n) * (2.0 * s)

        def dct_krn_rt(v):
            return rs.sdct3_stream_pallas(
                rs.sdct2_stream_pallas(v, n), n) * (2.0 * s)

        # complex stream kernel roundtrip for the frac yardstick
        xi = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))

        def cplx_rt(vv):
            ar, ai = ps.sfft_stream_pallas(vv[0], vv[1], n, False)
            br, bi = ps.sfft_stream_pallas(ar, ai, n, True)
            return br * s, bi * s

        row = {"leg": "ab_v2", "n": n, "b": b}
        for name, body, st in [
            ("rfft_xla", xla_rt, x), ("rfft_stream", krn_rt, x),
            ("pair_kernel", pair_kernel_rt, x),
            ("pair_natural", pair_natural_rt, x),
            ("dct2_xla", dct_xla_rt, x), ("dct2_stream", dct_krn_rt, x),
            ("cplx_stream", cplx_rt, (x, xi)),
        ]:
            try:
                row[name + "_us"] = round(
                    _per_iter(body, st, lo, hi) / 2 * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:200]
            print(json.dumps({name: row.get(name + "_us"),
                              "n": n}), flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    with open(out_path, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
