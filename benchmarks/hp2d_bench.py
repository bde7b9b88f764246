"""On-chip perf of the hp (double-float) 2-D transforms — round-4
verdict item 8: rfft2_hp/dctn-class 2-D df64 perf had never been
measured, and the large-n hp dispatch (hp._fft_any_hp) now applies to
every 2-D axis pass (hp._sfft_hp_body).

Times the ON-DEVICE jitted programs (_sfft2_hp_jit / _rfft2_hp_jit)
with the fori_loop slope protocol — host split/merge is excluded (it
is a host-API convenience, not the compute path).  Magnitude is kept
constant with an exact power-of-two rescale (safe for df pairs: scaling
both planes by 2^-k is exact).  Appends to
benchmarks/results/HP2D_r05.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

POINTS = [(4, 512, 512), (4, 1024, 1024)]


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


def _per_iter(body, state, lo=2, hi=8):
    return max((_loop_time(body, state, hi) - _loop_time(body, state, lo))
               / (hi - lo), 1e-9)


def main():
    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.ops import hp

    r = np.random.default_rng(0)
    results = []

    # numerics first: fft2_hp / rfft2_hp vs numpy f64 (device route)
    x0 = r.standard_normal((2, 256, 256))
    got = hp.fft2_hp(x0 + 0j, norm="backward")
    want = np.fft.fft2(x0)
    e_f = float(np.abs(got - want).max() / np.abs(want).max())
    got_r = hp.rfft2_hp(x0, norm="backward")
    want_r = np.fft.rfft2(x0)
    e_r = float(np.abs(got_r - want_r).max() / np.abs(want_r).max())
    line = {"leg": "numerics_onchip", "shape": [2, 256, 256],
            "err_fft2": e_f, "err_rfft2": e_r}
    print(json.dumps(line), flush=True)
    results.append(line)
    assert max(e_f, e_r) < 1e-13

    for b, n0, n1 in POINTS:
        # |fft2(x)| ~ sqrt(n0*n1)|x| for random x: one exact 2^-k
        # rescale per application preserves magnitude AND the df pair
        # invariant (both planes scaled by the same power of two)
        sc = np.float32(1.0 / np.sqrt(float(n0) * float(n1)))
        assert sc == 2.0 ** round(np.log2(sc))

        def quad(shape):
            return tuple(jnp.asarray(
                r.standard_normal(shape).astype(np.float32)) * w
                for w in (1.0, 1e-8, 1.0, 1e-8))

        q = quad((b, n0, n1))

        def fft2_body(s):
            out = hp._sfft2_hp_jit(*s, n0, n1, False, False)
            return tuple(a * sc for a in out)

        xr = jnp.asarray(r.standard_normal((b, n0, n1))
                         .astype(np.float32))
        xq = (xr, xr * np.float32(1e-8))

        def rfft2_rt_body(s):
            yq = hp._rfft2_hp_jit(s[0], s[1], n0, n1, False)
            zq = hp._irfft2_hp_jit(*yq, n0, n1, False)
            isc = np.float32(1.0 / (float(n0) * float(n1)))
            return zq[0] * isc, zq[1] * isc

        row = {"leg": "hp2d", "b": b, "n0": n0, "n1": n1}
        for name, body, st in [("fft2_hp", fft2_body, q),
                               ("rfft2_hp_rt", rfft2_rt_body, xq)]:
            try:
                t = _per_iter(body, st)
                if name.endswith("_rt"):
                    t /= 2
                row[name + "_us"] = round(t * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:200]
            print(json.dumps({name: row.get(name + "_us"),
                              "n0": n0}), flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "HP2D_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
