"""A/B: natural-layout stream kernels (_stream_pallas_2d_nat — the
permuted<->natural transpose fused into the kernel's VMEM/DMA) vs the
shipped kernel + XLA transpose composition (round 5).

Forward chains only (single-op bodies, shape-stable, exact 2^-8
rescale) — the reliable protocol per BASELINE.md.  Appends to
benchmarks/results/STREAM_NAT_r05.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

POINTS = [(65536, 64), (65536, 256), (131072, 64)]


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
    from cfftpack_tpu.ops import pallas_stream as ps

    r = np.random.default_rng(0)
    results = []

    # on-chip numerics first
    n0 = 65536
    m0 = n0 // 128
    x0 = r.standard_normal((2, n0)).astype(np.float32)
    y0 = r.standard_normal((2, n0)).astype(np.float32)
    zr, zi = ps._stream_pallas_2d_nat(
        jnp.asarray(x0.reshape(2, m0, 128)),
        jnp.asarray(y0.reshape(2, m0, 128)), n0, False)
    got = (np.asarray(zr) + 1j * np.asarray(zi)).reshape(2, n0)
    want = np.fft.fft(x0 + 1j * y0)
    err = float(np.abs(got - want).max() / np.abs(want).max())
    br, bi = ps._stream_pallas_2d_nat(zr, zi, n0, True)
    back = (np.asarray(br) + 1j * np.asarray(bi)).reshape(2, n0) / n0
    err_rt = float(np.abs(back - (x0 + 1j * y0)).max())
    line = {"leg": "numerics_onchip", "n": n0, "err_fwd": err,
            "err_rt": err_rt}
    print(json.dumps(line), flush=True)
    results.append(line)
    assert err < 5e-6 and err_rt < 5e-4

    for n, b in POINTS:
        m = n // 128
        # magnitude-preserving per-kernel rescale; exact power of two
        # nearest 1/sqrt(n) (for odd log2 n the chain drifts 2x per
        # roundtrip in magnitude — harmless over <= 22 iterations)
        s = np.float32(2.0 ** round(np.log2(1.0 / np.sqrt(float(n)))))
        ar = jnp.asarray(r.standard_normal((b, m, 128))
                         .astype(np.float32))
        ai = jnp.asarray(r.standard_normal((b, m, 128))
                         .astype(np.float32))
        af = ar.reshape(b, n)
        bf = ai.reshape(b, n)
        row = {"leg": "nat_ab", "n": n, "b": b,
               "ideal_us": round(b * n * 8 * 2 / 650e9 * 1e6, 1)}

        def fused_body(v):
            Zr, Zi = ps._stream_pallas_2d_nat(v[0], v[1], n, False)
            # output is (b, 128, m); feed back as permuted for shape
            # stability is wrong — instead rescale and transpose-free
            # chain the INVERSE natural kernel (also single op)
            Yr, Yi = ps._stream_pallas_2d_nat(Zr * s, Zi * s, n, True)
            return Yr * s, Yi * s

        def old_body(v):
            Zr, Zi = ps.sfft_stream_pallas(v[0], v[1], n, False)
            Yr, Yi = ps.sfft_stream_pallas(Zr * s, Zi * s, n, True)
            return Yr * s, Yi * s

        # roundtrip chains (shape-stable): fused = 2 kernels, zero XLA
        # transposes; old = 2 kernels + 2 XLA transpose passes
        for name, body, st in (
                ("fused_rt", fused_body, (ar, ai)),
                ("old_rt", old_body, (af, bf))):
            try:
                row[name + "_us"] = round(
                    _per_iter(body, st) * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:160]
            print(json.dumps({name: row.get(name + "_us"), "b": b,
                              "n": n}), flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "STREAM_NAT_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
