"""Lane-block width sweep for the column-FFT kernel (round 5).

Each DMA row of a column block is `lanes*4` bytes contiguous at stride
N1*4; wider blocks amortize the stride.  Sweeps lanes in {128, 256,
512, 1024} at the SWEEP2D shapes.  Appends to
benchmarks/results/COL_LANES_AB_r05.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

POINTS = [(64, 1024, 1024), (4, 4096, 4096)]


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
    from cfftpack_tpu.ops import pallas_colfft as pc

    r = np.random.default_rng(0)
    results = []

    for b, n0, n1 in POINTS:
        ar = jnp.asarray(r.standard_normal((b, n0, n1))
                         .astype(np.float32))
        ai = jnp.asarray(r.standard_normal((b, n0, n1))
                         .astype(np.float32))
        s = float(1.0 / n0)
        row = {"leg": "lanes", "b": b, "n0": n0, "n1": n1}
        for lanes in (128, 256, 512, 1024):
            def body(v, lanes=lanes):
                zr, zi = pc._colfft_pallas_3d(v[0], v[1], n0, False,
                                              1.0, lanes)
                return pc._colfft_pallas_3d(zr, zi, n0, True, s, lanes)

            key = f"lanes{lanes}_us"
            try:
                row[key] = round(
                    _per_iter(body, (ar, ai)) / 2 * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[key] = None
                row[key + "_err"] = repr(e)[:160]
            print(json.dumps({key: row[key], "n0": n0}), flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "COL_LANES_AB_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
