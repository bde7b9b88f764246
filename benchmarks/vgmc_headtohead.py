"""Head-to-head: reference VG Monte-Carlo (C++, host CPU) vs
cfftpack_tpu's fully-on-device pipeline.

test/vg_mc.cpp:27-114 is the reference's Levy-process MC demo: back
the Variance-Gamma PDF out of its characteristic function by FFT
(N=2048 delta-spike convolution), build the CDF, then walk 100,000
uniform draws through std::lower_bound one at a time to price a call.

cfftpack_tpu runs the SAME pipeline as one jitted device program
(models/montecarlo.vg_mc_price_device): split-real FFT propagation,
cumsum CDF, all draws generated on device and looked up with one
vectorized searchsorted, one payoff reduction.  Only the host-f64
characteristic-function table crosses to the device.

Build the reference engine once (no reference code is modified; the
shim exposes the C++ entry to ctypes):

    mkdir -p /tmp/refbuild && cd /tmp/refbuild && \
    printf 'void VarianceGammaMonteCarlo();\nextern "C" void ref_vg_mc() { VarianceGammaMonteCarlo(); }\n' > vgmc_shim.cpp && \
    gcc -O2 -fPIC -c /root/reference/cfftpack/fftpack.c \
        /root/reference/cfftpack/cfftpack.c \
        /root/reference/cfftpack/cfftextra.c && \
    g++ -O2 -fPIC -shared -Dmain=ref_main -I/root/reference \
        /root/reference/test/vg_mc.cpp vgmc_shim.cpp \
        fftpack.o cfftpack.o cfftextra.o -lm -o libvgmc.so

The reference binary seeds mt19937 from random_device, so its price
moves run to run at the 100k-draw MC scale (~0.05); the price check is
therefore against the dense-grid expectation (no MC noise) computed
from the same FFT distribution, with an MC-width tolerance.

Outputs one JSON line per measurement.  The reference's draw count is
hard-coded at M=100000; larger sample rows are TPU-only scaling data.

Usage: python benchmarks/vgmc_headtohead.py [--ref /tmp/refbuild/libvgmc.so]
"""
from __future__ import annotations

import argparse
import ctypes
import json
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter  # noqa: E402

# vg_mc.cpp:31-37, 87-90
S, K, SIGMA, THETA, KAPPA, R, T = 100.0, 98.0, 0.12, -0.14, 0.2, 0.05, 1.0
N = 2048            # vg_mc.cpp:28 (1024*2)
M_REF = 100000      # vg_mc.cpp:93


def run_reference(lib) -> tuple[float, float]:
    """One full reference run; returns (printed price, wall seconds).
    cout is captured via a temporary fd-1 redirect; the restore runs in
    a finally so a failing call cannot leave stdout pointed at the
    (closed) tempfile."""
    with tempfile.TemporaryFile() as tf:
        old = os.dup(1)
        sys.stdout.flush()
        try:
            os.dup2(tf.fileno(), 1)
            t0 = time.perf_counter()
            lib.ref_vg_mc()
            dt = time.perf_counter() - t0
            sys.stdout.flush()
        finally:
            os.dup2(old, 1)
            os.close(old)
        tf.seek(0)
        out = tf.read().decode()
    m = re.search(r"price:\s*([-0-9.eE+]+)", out)
    if not m:
        raise RuntimeError(f"unexpected reference output: {out!r}")
    return float(m.group(1)), dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/libvgmc.so")
    ap.add_argument("--samples", default="100000,1048576,16777216")
    args = ap.parse_args()
    sizes = [int(s) for s in args.samples.split(",")]

    lib = None
    if os.path.exists(args.ref):
        lib = ctypes.CDLL(args.ref)
    else:
        print(json.dumps({"metric": "reference_skipped", "path": args.ref}),
              flush=True)

    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.models import montecarlo as mc

    dev = jax.devices()[0]
    print(json.dumps({"metric": "device", "kind": dev.device_kind,
                      "backend": dev.platform}), flush=True)

    # dense-grid expectation: the FFT distribution integrated against
    # the payoff directly — the zero-MC-noise anchor both MCs estimate
    out_grid, pdf = mc.vg_distribution_grid(SIGMA, THETA, KAPPA, R, T, N)
    e_grid = float(np.sum(pdf * np.maximum(np.exp(out_grid) * S - K, 0.0))
                   * np.exp(-R * T))
    print(json.dumps({"metric": "grid_expectation", "n": N,
                      "value": round(e_grid, 9)}), flush=True)

    ref_prices, ref_best = [], float("inf")
    if lib is not None:
        for _ in range(5):
            price, dt = run_reference(lib)
            ref_prices.append(price)
            ref_best = min(ref_best, dt)
        print(json.dumps({
            "metric": "reference_vg_mc", "n": N, "samples": M_REF,
            "t_s": round(ref_best, 6),
            "us_per_draw": round(ref_best / M_REF * 1e6, 4),
            "price_mean": round(float(np.mean(ref_prices)), 6),
            "price_spread": round(float(np.ptp(ref_prices)), 6),
            "mean_err_vs_grid": round(float(np.mean(ref_prices)) - e_grid,
                                      6)}), flush=True)

    dx, ph = mc._vg_grid_setup(SIGMA, THETA, KAPPA, R, T, N)
    params = tuple(jnp.asarray(v, jnp.float32) for v in (S, K, R, T))
    phr = jnp.asarray(ph.real, jnp.float32)
    phi_ = jnp.asarray(ph.imag, jnp.float32)
    dxj = jnp.asarray(float(dx), jnp.float32)

    for samples in sizes:
        row = {"metric": "vg_mc", "n": N, "samples": samples}

        def body(s):
            p = mc._vg_mc_program(s, N, samples, True, "float32",
                                  params, phr, phi_, dxj)
            return s + 1 + (p * 0).astype(jnp.int32)

        price = float(mc._vg_mc_program(jnp.int32(0), N, samples, True,
                                        "float32", params, phr, phi_, dxj))
        hi = max(8, min(204, (1 << 25) // samples))
        t = per_iter(body, jnp.int32(0), lo=4, hi=hi)
        row["tpu_price_f32"] = round(price, 6)
        row["tpu_t_s"] = round(t, 6)
        row["tpu_us_per_draw"] = round(t / samples * 1e6, 5)
        row["err_vs_grid"] = round(price - e_grid, 6)
        if lib is not None and samples == M_REF:
            row["ref_us_per_draw"] = round(ref_best / M_REF * 1e6, 4)
            row["speedup_per_draw"] = round(
                (ref_best / M_REF) / (t / samples), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
