"""One-run end-to-end A/B of the riffle idiom inside real transforms.

Sweeps core._RIFFLE_IDIOM over {stack, select} for the three transforms
whose final un-permutation is a lane riffle (irfft, DCT-III, DCT-IV) at
the sweep (n, batch) grid; decides core._RIFFLE_SELECT_MIN.  Bodies are
fwd+inv roundtrips; printed time is per transform (per_iter/2).

Usage: python benchmarks/riffle_e2e_bench.py [n batch [n batch ...]]
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
    import importlib
    from cfftpack_tpu.ops import core
    dctmod = importlib.import_module("cfftpack_tpu.ops.dct")

    args = [int(a) for a in sys.argv[1:]]
    shapes = (list(zip(args[0::2], args[1::2])) if args else
              [(1024, 4096), (4096, 1024), (16384, 256), (65536, 64)])
    r = np.random.default_rng(0)

    for n, b in shapes:
        x = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        for idiom in ("stack", "select"):
            core._RIFFLE_IDIOM = idiom

            def rt_rfft(s, n=n):
                yr, yi = core.srfft(s, n)
                return core.sirfft(yr, yi, n) * (1.0 / n)

            def rt_dct3(s, n=n):
                return dctmod._dct2_core(
                    dctmod._dct3_core(s, n) * (2.0 / n), n)

            def rt_dct4(s, n=n):
                return dctmod._dct4_core(
                    dctmod._dct4_core(s, n) * (2.0 / n), n)

            for name, body in (("rfft", rt_rfft), ("dct3", rt_dct3),
                               ("dct4", rt_dct4)):
                t = per_iter(jax.jit(body), x) / 2.0
                print(json.dumps({
                    "metric": f"{name}_{idiom}", "n": n, "batch": b,
                    "t_us_per_transform": round(t * 1e6, 2)}),
                    flush=True)
    core._RIFFLE_IDIOM = "auto"


if __name__ == "__main__":
    main()
