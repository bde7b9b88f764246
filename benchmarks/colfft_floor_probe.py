"""Component probe: what bounds the column kernel at ~0.33 of the
streaming roofline? (round 5; the STREAM_MID_PROBE_r04 methodology.)

Legs at (64, 1024, 1024) and (4, 4096, 4096):
  copy    — a Pallas kernel with the SAME (bt, n0, 128) column blocks
            that just copies in->out: the pure strided-DMA floor.
  colfft  — the full column FFT (DMA + sublane stages).
  xla_t   — one XLA transpose pass (a different access pattern with
            the same bytes, for scale).

If copy ~= colfft, the kernel is DMA-bound (strided column blocks are
the floor; the flat lane-width sweep COL_LANES_AB_r05 already showed
wider blocks don't help).  If copy << colfft, the stage bodies (VMEM
copies) dominate, same class as the mid-range wall.  Appends to
benchmarks/results/COLFLOOR_r05.jsonl.
"""
from __future__ import annotations

import functools
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
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from cfftpack_tpu.ops import pallas_colfft as pc

    r = np.random.default_rng(0)
    results = []

    @functools.partial(jax.jit, static_argnums=(1,))
    def col_copy(x, n0):
        B, _, N1 = x.shape
        bt = max(1, 4096 // n0)

        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:] * np.float32(1.0000001)

        blk = pl.BlockSpec((bt, n0, 128), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel, grid=(B // bt, N1 // 128),
            in_specs=[blk], out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((B, n0, N1), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x)

    for b, n0, n1 in ((64, 1024, 1024), (4, 4096, 4096)):
        ar = jnp.asarray(r.standard_normal((b, n0, n1))
                         .astype(np.float32))
        ai = jnp.asarray(r.standard_normal((b, n0, n1))
                         .astype(np.float32))
        s = np.float32(1.0 / n0)
        # one-plane bytes for the copy leg; both planes for colfft
        row = {"leg": "floor", "b": b, "n0": n0, "n1": n1,
               "ideal_1plane_us": round(
                   b * n0 * n1 * 4 * 2 / 650e9 * 1e6, 1)}

        def copy_body(v):
            return (col_copy(v[0], n0), col_copy(v[1], n0))

        def colfft_body(v):
            zr, zi = pc.scolfft_pallas(v[0], v[1], False)
            yr, yi = pc.scolfft_pallas(zr, zi, True, scale=s)
            return yr, yi

        def xla_t_body(v):
            return (jnp.swapaxes(v[0], -2, -1).reshape(v[0].shape)
                    * np.float32(1.0000001),
                    jnp.swapaxes(v[1], -2, -1).reshape(v[1].shape)
                    * np.float32(1.0000001))

        for name, body in (("copy", copy_body),
                           ("colfft_rt", colfft_body),
                           ("xla_transpose", xla_t_body)):
            try:
                t = _per_iter(body, (ar, ai))
                if name == "colfft_rt":
                    t /= 2            # per transform
                row[name + "_us"] = round(t * 1e6, 2)
            except Exception as e:                        # noqa: BLE001
                row[name + "_us"] = None
                row[name + "_err"] = repr(e)[:160]
            print(json.dumps({name: row.get(name + "_us"), "n0": n0}),
                  flush=True)
        results.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "COLFLOOR_r05.jsonl")
    with open(out, "a") as f:
        for line in results:
            f.write(json.dumps(line) + "\n")


if __name__ == "__main__":
    main()
