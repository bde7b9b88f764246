"""Per-pass component probe for the even-n DCT-IV core.

Times the three memory passes separately (input gather+pre-rotation,
half-length FFT, post-rotation+interleave) to locate where dct4's
overhead vs dct2 lives at each size.  Bodies map (b, n) -> (b, n) so
the fori_loop slope chains; the FFT probe chains a fwd+inv pair and
halves.  One-run comparison only (tunnel variance; CLAUDE.md).

Usage: python benchmarks/dct4_components.py [n batch [n batch ...]]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter, hbm_bandwidth  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.ops import core

    args = [int(a) for a in sys.argv[1:]]
    shapes = (list(zip(args[0::2], args[1::2])) if args else
              [(1024, 4096), (16384, 256)])
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1)}), flush=True)
    r = np.random.default_rng(0)

    for n, b in shapes:
        h = n // 2
        x = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        p = np.arange(h)
        pre = np.exp(-1j * np.pi * p / n)
        post = np.exp(-1j * np.pi * (2 * p + 0.5) / (2 * n))
        prer, prei, postr, posti = (
            jnp.asarray(t.astype(np.float32))
            for t in (pre.real, pre.imag, post.real, post.imag))

        def gather_pre(s):
            cr = s[..., 0::2]
            ci = s[..., 1::2][..., ::-1]
            wr = cr * prer - ci * prei
            wi = cr * prei + ci * prer
            return jnp.concatenate([wr, wi], axis=-1)

        def gather_pre_noflip(s):
            cr = s[..., 0::2]
            ci = s[..., 1::2]
            wr = cr * prer - ci * prei
            wi = cr * prei + ci * prer
            return jnp.concatenate([wr, wi], axis=-1)

        def post_interleave(s):
            zr0 = s[..., :h]
            zi0 = s[..., h:]
            zr = zr0 * postr - zi0 * posti
            zi = zr0 * posti + zi0 * postr
            return jnp.stack([zr, -zi[..., ::-1]],
                             axis=-1).reshape(*s.shape[:-1], n)

        def post_block(s):
            zr0 = s[..., :h]
            zi0 = s[..., h:]
            zr = zr0 * postr - zi0 * posti
            zi = zr0 * posti + zi0 * postr
            return jnp.concatenate([zr, -zi[..., ::-1]], axis=-1)

        def fft_pair(s):
            wr = s[..., :h]
            wi = s[..., h:]
            Wr, Wi = core.sfft(wr, wi, h, inverse=False)
            zr, zi = core.sfft(Wr, Wi, h, inverse=True)
            return jnp.concatenate([zr * (1.0 / h), zi * (1.0 / h)],
                                   axis=-1)

        for name, body, scale in (
                ("gather_pre", gather_pre, 1.0),
                ("gather_pre_noflip", gather_pre_noflip, 1.0),
                ("post_interleave", post_interleave, 1.0),
                ("post_block", post_block, 1.0),
                ("fft_half", fft_pair, 0.5)):
            t = per_iter(jax.jit(body), x) * scale
            print(json.dumps({"metric": name, "n": n, "batch": b,
                              "t_us": round(t * 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
