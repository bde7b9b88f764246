"""One-run A/B of lane-riffle idioms: y[2t]=a[t], y[2t+1]=b[t].

The DCT-IV post stage (and DCT-III's 4-way analog) writes an
interleaved output; the stack+reshape idiom costs ~5x a plain pass at
n=16384 (see dct4_components.py).  Candidate replacements:

  stack    — jnp.stack([a, b], -1).reshape (status quo, b628ab7)
  select   — broadcast each input across the pair dim and lane-select
             (one fused pass if XLA keeps the broadcast in registers)

plus the 4-way analogs (DCT-III's y4 interleave).

Usage: python benchmarks/riffle_bench.py [n batch [n batch ...]]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    args = [int(a) for a in sys.argv[1:]]
    shapes = (list(zip(args[0::2], args[1::2])) if args else
              [(1024, 4096), (2048, 2048), (4096, 1024), (8192, 512),
               (16384, 256), (32768, 128), (65536, 64)])
    r = np.random.default_rng(0)

    for n, b in shapes:
        h = n // 2
        x = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))

        def riffle_stack(s):
            a, c = s[..., :h], s[..., h:]
            return jnp.stack([a, c], axis=-1).reshape(*s.shape[:-1], n)

        evens = jnp.asarray((np.arange(n) % 2 == 0))

        def riffle_select(s):
            a, c = s[..., :h], s[..., h:]
            ar = jnp.broadcast_to(a[..., None], (*a.shape, 2)
                                  ).reshape(*s.shape[:-1], n)
            cr = jnp.broadcast_to(c[..., None], (*c.shape, 2)
                                  ).reshape(*s.shape[:-1], n)
            return jnp.where(evens, ar, cr)

        q = n // 4
        lane4 = jnp.asarray(np.arange(n) % 4, jnp.int32)

        def riffle4_stack(s):
            parts = [s[..., i * q:(i + 1) * q] for i in range(4)]
            return jnp.stack(parts, axis=-1).reshape(*s.shape[:-1], n)

        def riffle4_select(s):
            reps = [jnp.broadcast_to(s[..., i * q:(i + 1) * q][..., None],
                                     (*s.shape[:-1], q, 4)
                                     ).reshape(*s.shape[:-1], n)
                    for i in range(4)]
            return jnp.where(lane4 == 0, reps[0],
                             jnp.where(lane4 == 1, reps[1],
                                       jnp.where(lane4 == 2, reps[2],
                                                 reps[3])))

        variants = [("riffle_stack", riffle_stack),
                    ("riffle_select", riffle_select),
                    ("riffle4_stack", riffle4_stack),
                    ("riffle4_select", riffle4_select)]

        want = np.asarray(jax.jit(riffle_stack)(x))
        want4 = np.asarray(jax.jit(riffle4_stack)(x))
        for name, body in variants:
            got = np.asarray(jax.jit(body)(x))
            assert (got == (want4 if "4" in name else want)).all(), name
            t = per_iter(jax.jit(body), x)
            print(json.dumps({"metric": name, "n": n, "batch": b,
                              "t_us": round(t * 1e6, 2)}), flush=True)


if __name__ == "__main__":
    main()
