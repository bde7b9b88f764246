"""One-run A/B: DCT-IV post-stage formulations (even n).

Current core (ops/dct.py _dct4_core): pre-rotation FMA -> half-length
complex FFT -> post-rotation FMA -> stack/flip interleave.  The fused
variant collapses the post-rotation and the even/odd interleave into
ONE broadcast table FMA over (Wr, Wi, flip Wr, flip Wi) — the same
restructuring that bought DCT-II 1.43x (see BASELINE.md).  dct2 is
timed in the same run for context.

Variants are compared WITHIN one run (cross-run tunnel variance ~2x;
CLAUDE.md).  Bodies are fwd+inv roundtrips (DCT-IV is an involution up
to 2/n); printed time is per transform (per_iter/2).

Usage: python benchmarks/dct4_bench.py [n batch [n batch ...]]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter, hbm_bandwidth  # noqa: E402


def _fused_dct4(x, n: int):
    import jax.numpy as jnp
    from cfftpack_tpu.ops import core
    h = n // 2
    p = np.arange(h)
    cr = x[..., 0::2]
    ci = x[..., 1::2][..., ::-1]
    pre = np.exp(-1j * np.pi * p / n)
    prer = jnp.asarray(pre.real, dtype=x.dtype)
    prei = jnp.asarray(pre.imag, dtype=x.dtype)
    wr = cr * prer - ci * prei
    wi = cr * prei + ci * prer
    Wr, Wi = core.sfft(wr, wi, h, inverse=False)
    post = np.exp(-1j * np.pi * (2 * p + 0.5) / (2 * n))
    z = np.zeros(h)
    T1 = np.stack([post.real, z], axis=1)
    T2 = np.stack([-post.imag, z], axis=1)
    T3 = np.stack([z, -post.imag[::-1]], axis=1)
    T4 = np.stack([z, -post.real[::-1]], axis=1)
    t1, t2, t3, t4 = (jnp.asarray(t, dtype=x.dtype)
                      for t in (T1, T2, T3, T4))
    y = (t1 * Wr[..., None] + t2 * Wi[..., None]
         + t3 * Wr[..., ::-1, None] + t4 * Wi[..., ::-1, None])
    return y.reshape(*x.shape[:-1], n)


def main():
    import jax
    import jax.numpy as jnp
    import importlib
    dctmod = importlib.import_module("cfftpack_tpu.ops.dct")

    args = [int(a) for a in sys.argv[1:]]
    shapes = (list(zip(args[0::2], args[1::2])) if args else
              [(1024, 4096), (4096, 1024), (16384, 256), (65536, 64)])
    bw = hbm_bandwidth()
    dev = jax.devices()[0]
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1),
                      "device": dev.device_kind}), flush=True)

    # correctness of the fused variant before timing it
    r = np.random.default_rng(1)
    for n in (4, 10, 64, 1024):
        xs = jnp.asarray(r.standard_normal((3, n)).astype(np.float64))
        want = np.asarray(dctmod._dct4_core(xs, n))
        got = np.asarray(_fused_dct4(xs, n))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 1e-12, (n, err)
    print(json.dumps({"metric": "fused_dct4_parity", "ok": True}),
          flush=True)

    for n, b in shapes:
        x = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        ideal = 2 * (2 * b * n * 4)  # rw fwd+inv, real n-vector both ways
        variants = {
            "dct4_current": lambda s, n=n: dctmod._dct4_core(
                dctmod._dct4_core(s, n) * (2.0 / n), n),
            "dct4_fused": lambda s, n=n: _fused_dct4(
                _fused_dct4(s, n) * (2.0 / n), n),
            "dct2_context": lambda s, n=n: dctmod._dct3_core(
                dctmod._dct2_core(s, n) * (2.0 / n), n),
        }
        for name, body in variants.items():
            t = per_iter(jax.jit(body), x) / 2.0
            print(json.dumps({
                "metric": name, "n": n, "batch": b,
                "t_us_per_transform": round(t * 1e6, 2),
                "roofline_frac": round((ideal / 2 / t) / bw, 4),
            }), flush=True)


if __name__ == "__main__":
    main()
