"""A/B: Pallas column-FFT kernel (ops/pallas_colfft.py) vs the XLA
moveaxis + flat-FFT column pass, on-chip (round-5 verdict item 2 —
the 2-D engine's transpose passes).

Within-ONE-run comparisons only (tunnel variance).  Bodies chain a
single fwd+inv roundtrip over the COLUMN axis (per_iter/2 is
per-transform) with ortho scaling, plus end-to-end fft2/rfft2 legs.
Appends to benchmarks/results/COLFFT_AB_r05.jsonl.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# (batch, n0, n1): SWEEP2D shapes + one mid-size point
POINTS = [(64, 1024, 1024), (4, 4096, 4096), (64, 256, 1024)]


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
    import cfftpack_tpu as ct
    from cfftpack_tpu.ops import core
    from cfftpack_tpu.ops import pallas_colfft as pc

    r = np.random.default_rng(0)
    results = []

    # on-chip numerics first
    x0 = r.standard_normal((2, 256, 256)).astype(np.float32)
    y0 = r.standard_normal((2, 256, 256)).astype(np.float32)
    zr, zi = jax.jit(pc.scolfft_pallas, static_argnums=2)(
        jnp.asarray(x0), jnp.asarray(y0), False)
    want = np.fft.fft(x0 + 1j * y0, axis=-2)
    got = np.asarray(zr) + 1j * np.asarray(zi)
    err = float(np.abs(got - want).max() / np.abs(want).max())
    br, bi = jax.jit(pc.scolfft_pallas, static_argnums=2)(zr, zi, True)
    rt = float(np.abs((np.asarray(br) + 1j * np.asarray(bi)) / 256
                      - (x0 + 1j * y0)).max())
    line = {"leg": "numerics_onchip", "shape": [2, 256, 256],
            "err_fwd": err, "err_rt": rt}
    print(json.dumps(line), flush=True)
    results.append(line)
    assert err < 1e-5 and rt < 1e-4

    for b, n0, n1 in POINTS:
        ar = jnp.asarray(r.standard_normal((b, n0, n1))
                         .astype(np.float32))
        ai = jnp.asarray(r.standard_normal((b, n0, n1))
                         .astype(np.float32))
        s = np.float32(1.0 / n0)
        elems = b * n0 * n1
        lo, hi = (2, 12) if elems >= (1 << 25) else (2, 22)

        def col_kernel_rt(v):
            zr, zi = pc.scolfft_pallas(v[0], v[1], False)
            yr, yi = pc.scolfft_pallas(zr, zi, True)
            return yr * s, yi * s

        def col_xla_rt(v):
            xr = jnp.moveaxis(v[0], -2, -1)
            xi = jnp.moveaxis(v[1], -2, -1)
            zr, zi = core.sfft(xr, xi, n0, inverse=False)
            zr, zi = core.sfft(zr, zi, n0, inverse=True)
            return (jnp.moveaxis(zr, -1, -2) * s,
                    jnp.moveaxis(zi, -1, -2) * s)

        def fft2_pub_rt(v):
            zr, zi = ct.fft2_split(v[0], v[1], norm="ortho")
            return ct.ifft2_split(zr, zi, norm="ortho")

        def fft2_xla_rt(v):
            # both passes through the moveaxis path (column forced XLA)
            zr, zi = core.sfft(v[0], v[1], n1, inverse=False)
            zr, zi = col_xla_rt((zr, zi))
            zr, zi = core.sfft(zr, zi, n1, inverse=True)
            sc = np.float32(1.0 / n1)
            return zr * sc, zi * sc

        row = {"leg": "ab", "b": b, "n0": n0, "n1": n1}
        for name, body, st in [
            ("col_kernel", col_kernel_rt, (ar, ai)),
            ("col_xla", col_xla_rt, (ar, ai)),
            ("fft2_pub", fft2_pub_rt, (ar, ai)),
            ("fft2_xla", fft2_xla_rt, (ar, ai)),
        ]:
            try:
                row[name + "_us"] = round(
                    _per_iter(body, st, lo, hi) / 2 * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:200]
            print(json.dumps({name: row.get(name + "_us"),
                              "n0": n0, "b": b}), flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    # huge-batch ROW pass: the fully-fused VMEM kernel (pallas_fft,
    # round-1 design — measured to lose to XLA at 2^22-elem sets) has
    # never been re-measured in the 2^26 chunked-dispatch regime the
    # 2-D row passes live in
    from cfftpack_tpu.ops.pallas_fft import sfft_pallas
    b, n = 65536, 1024
    ar = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
    ai = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
    s = np.float32(1.0 / n)

    def row_pallas_rt(v):
        zr, zi = sfft_pallas(v[0], v[1], n, False)
        zr, zi = sfft_pallas(zr, zi, n, True)
        return zr * s, zi * s

    def row_xla_rt(v):
        zr, zi = core.sfft(v[0], v[1], n, inverse=False)
        zr, zi = core.sfft(zr, zi, n, inverse=True)
        return zr * s, zi * s

    row = {"leg": "hugebatch_row", "b": b, "n": n}
    for name, body in (("row_pallas", row_pallas_rt),
                       ("row_xla", row_xla_rt)):
        try:
            row[name + "_us"] = round(
                _per_iter(body, (ar, ai), 2, 12) / 2 * 1e6, 2)
        except Exception as e:                            # noqa: BLE001
            row[name + "_us"] = None
            row[name + "_err"] = repr(e)[:200]
        print(json.dumps(row), flush=True)
    results.append(row)

    # rfft2 end-to-end (column pass rides colfft via the lane pad)
    for b, n0, n1 in ((64, 1024, 1024),):
        x = jnp.asarray(r.standard_normal((b, n0, n1))
                        .astype(np.float32))

        def rfft2_rt(v):
            yr, yi = ct.rfft2_split(v, norm="ortho")
            return ct.irfft2_split(yr, yi, (n0, n1), norm="ortho")

        row = {"leg": "rfft2", "b": b, "n0": n0, "n1": n1}
        try:
            row["rfft2_pub_us"] = round(
                _per_iter(rfft2_rt, x, 2, 12) / 2 * 1e6, 2)
        except Exception as e:                            # noqa: BLE001
            row["rfft2_pub_us"] = None
            row["rfft2_pub_err"] = repr(e)[:200]
        print(json.dumps(row), flush=True)
        results.append(row)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "COLFFT_AB_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
