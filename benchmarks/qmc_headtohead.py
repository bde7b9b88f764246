"""Head-to-head: reference QMC asian-option engine (C, host CPU) vs
cfftpack_tpu's fully-on-device pipeline.

The reference's quasi-Monte-Carlo demo (test/montecarlo.c:63-143)
prices an arithmetic-average asian option by building, PER PATH, a
Halton point, inverse-normal-transforming it, and running an
orthonormal DCT-IV to get a Brownian path (the PCA-equivalent
construction).  Its cost is dominated by the scalar per-path loop:
halton_sequence + 128 normal_icdf calls + one 128-pt DCT-IV + the
path walk, sequentially for every sample.

cfftpack_tpu runs the SAME pipeline as one jitted device program
(models/montecarlo.asian_option_qmc_device): a (samples, 128) Halton
block via a digit-parallel fori_loop, batched icdf, ONE batched
DCT-IV, and a cumsum path walk — sample count rides the batch axis.

Build the reference engine once (the same source files the golden
tools compile; main is renamed out of the way so ctypes can call
``asian_option`` directly — no reference code is modified):

    mkdir -p /tmp/refbuild && gcc -O2 -shared -fPIC -Dmain=ref_main \
        -I/root/reference /root/reference/test/montecarlo.c \
        /root/reference/test/util.c /root/reference/cfftpack/fftpack.c \
        /root/reference/cfftpack/cfftpack.c \
        /root/reference/cfftpack/cfftextra.c -lm \
        -o /tmp/refbuild/libmontecarlo.so

Outputs one JSON line per measurement: reference per-path time (host
C, f64), TPU per-path time (f32, slope method), the price agreement
between the two QMC pipelines, and the speedup.

Usage: python benchmarks/qmc_headtohead.py [--ref /tmp/refbuild/libmontecarlo.so]
"""
from __future__ import annotations

import argparse
import ctypes
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter  # noqa: E402

S, K, SIGMA, T, R = 100.0, 98.0, 0.17, 0.25, 0.02
STEPS = 128
IS_CALL = False


def load_reference(path: str):
    if not os.path.exists(path):
        print(json.dumps({"metric": "reference_skipped", "path": path}),
              flush=True)
        return None
    lib = ctypes.CDLL(path)
    fn = lib.asian_option
    fn.restype = ctypes.c_double
    fn.argtypes = [ctypes.c_bool] + [ctypes.c_double] * 5 + [
        ctypes.c_bool, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    return fn


def time_reference(fn, samples: int, run_index: int, qmc: bool):
    best, price = float("inf"), None
    for _ in range(3):
        t0 = time.perf_counter()
        price = fn(IS_CALL, S, K, SIGMA, T, R, not qmc, STEPS,
                   samples, run_index)
        best = min(best, time.perf_counter() - t0)
    return price, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/libmontecarlo.so")
    ap.add_argument("--samples", default="2000,8000,65536,262144")
    args = ap.parse_args()
    sizes = [int(s) for s in args.samples.split(",")]

    ref = load_reference(args.ref)

    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.models import montecarlo as mc

    dev = jax.devices()[0]
    print(json.dumps({"metric": "device", "kind": dev.device_kind,
                      "backend": dev.platform}), flush=True)

    for samples in sizes:
        row = {"metric": "qmc_asian", "samples": samples, "steps": STEPS}

        # ---- reference: per-path cost of its QMC engine (host C).
        # Only measured at sizes it finishes quickly; the per-path
        # cost is flat in `samples` (pure scalar loop).
        if ref is not None and samples <= 65536:
            price, t = time_reference(ref, samples, 1, qmc=True)
            row["ref_price"] = round(price, 12)
            row["ref_t_s"] = round(t, 6)
            row["ref_us_per_path"] = round(t / samples * 1e6, 3)

        # ---- cfftpack_tpu: one device program, slope-timed.  The
        # body chains on the start index through the price so the
        # fori_loop cannot collapse the iterations.
        start = jnp.int32(samples + 1)
        params = tuple(jnp.asarray(v, jnp.float32)
                       for v in (S, K, SIGMA, T, R))
        nd = 32  # fixed digit count: one compilation across sizes

        def body(s):
            p = mc._asian_qmc_program(s, samples, STEPS, nd, IS_CALL,
                                      "float32", params)
            return s + 1 + (p * 0).astype(jnp.int32)

        tpu_price = float(mc._asian_qmc_program(start, samples, STEPS, nd,
                                                IS_CALL, "float32", params))
        hi = max(8, min(204, (1 << 24) // samples))
        t = per_iter(body, start, lo=4, hi=hi)
        row["tpu_price_f32"] = round(tpu_price, 7)
        row["tpu_t_s"] = round(t, 6)
        row["tpu_us_per_path"] = round(t / samples * 1e6, 4)
        if "ref_price" in row:
            row["price_delta"] = round(tpu_price - row["ref_price"], 6)
        if "ref_us_per_path" in row:
            row["speedup_per_path"] = round(
                row["ref_us_per_path"] / row["tpu_us_per_path"], 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
