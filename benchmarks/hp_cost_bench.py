"""hp (double-float) engine cost factor vs the f32 engine.

Round-2 measured 10.6x at (1024, 4096) (HP_FFT_r02.jsonl); the round-3
verdict asks for <= 7x with unchanged 1e-13 golden parity.  Round-3
lever: df_add is now Bailey's 11-flop sloppy add (df64.df_add; the
20-flop accurate form kept as df_add_accurate) — measured identical
accuracy class (~5e-15 rel) on every transform family including
pure-cancellation inputs.

Writes benchmarks/results/HP_FFT_r03.jsonl.  Run alone on the chip.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import _per_iter  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import cfftpack_tpu as ct
    from cfftpack_tpu.ops.hp import sfft_hp

    n, batch = 1024, 4096
    r = np.random.default_rng(0)
    xr = jnp.asarray(r.standard_normal((batch, n)).astype(np.float32))
    xi = jnp.asarray(r.standard_normal((batch, n)).astype(np.float32))
    dn = np.float32(1.0 / np.sqrt(n))          # exact 2^-5

    def f32_body(s):
        a, b = ct.fft_split(s[0], s[1], norm="ortho")
        return a, b

    t_f32 = _per_iter(f32_body, (xr, xi), lo=4, hi=104)

    def hp_body(s):
        out = sfft_hp(s[0], s[1], s[2], s[3], n, False)
        return tuple(a * dn for a in out)

    quad = (xr, jnp.zeros_like(xr), xi, jnp.zeros_like(xi))
    t_hp = _per_iter(hp_body, quad, lo=4, hi=24)

    # accuracy spot check on-chip: hp vs host numpy f64 at the bench n
    xs = np.asarray(xr[:2]) + 1j * np.asarray(xi[:2])
    got = ct.fft_hp(xs, norm="backward")
    ref = np.fft.fft(xs.astype(np.complex128))
    rel = float(np.abs(got - ref).max() / np.abs(ref).max())

    row = {"metric": "fft_hp_vs_f32", "n": n, "batch": batch,
           "t_hp_us": round(t_hp * 1e6, 1),
           "t_f32_us": round(t_f32 * 1e6, 1),
           "cost_factor": round(t_hp / t_f32, 1),
           "rel_err_vs_f64": rel,
           "df_add": "sloppy-11flop (round 3)"}
    print(json.dumps(row))
    out = os.path.join(os.path.dirname(__file__), "results",
                       "HP_FFT_r03.jsonl")
    with open(out, "w") as f:
        f.write(json.dumps(row) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
