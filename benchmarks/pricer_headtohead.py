"""Head-to-head: reference conv pricer (C, host CPU) vs cfftpack_tpu.

The reference's own headline benchmark is test/vargamma.c:131-158 — a
Black-Scholes and a Variance-Gamma option priced by FFT convolution at
N = 128..2^20, one option per timed call (payoff setup + rfft plan +
forward + characteristic-function multiply + inverse).  Build it once:

    gcc -O2 -I/root/reference /root/reference/test/vargamma.c \
        /root/reference/test/util.c /root/reference/cfftpack/fftpack.c \
        /root/reference/cfftpack/cfftpack.c \
        /root/reference/cfftpack/cfftextra.c -lm -o /tmp/refbuild/vargamma

This script (a) runs that binary and parses its table, (b) times the
cfftpack_tpu pricer on the ambient device (real v5e via axon) at the
same sizes, two ways:

  latency    — one strike, full conv_bsvg_option wall time including
               host payoff setup, transfer, and fetch (warm jit; the
               reference number includes its rfft_create per call)
  throughput — a strike LADDER of B options priced in one rfilter
               pass (the TPU-native shape); per-option time from the
               fori_loop slope method

Prices are reported against the same anchors the reference prints
(closed-form BS / the QuantLib VG target); the TPU path is f32, so its
error floor is grid+f32 (~1e-3 on an ~8.8 price) vs the reference's
f64 floor.

Usage: python benchmarks/pricer_headtohead.py [--ref /tmp/refbuild/vargamma]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter  # noqa: E402

S, K, SIGMA, THETA, KAPPA, T, R = 100.0, 98.0, 0.12, -0.14, 0.2, 1.0, 0.05
VG_TARGET = 9.3424659413582116  # vargamma.c:117 (QuantLib)
SIZES = [128 << i for i in range(14)]  # 128..2^20


def run_reference(path: str):
    if not os.path.exists(path):
        print(json.dumps({"metric": "reference_skipped", "path": path}),
              flush=True)
        return {}
    out = subprocess.run([path], capture_output=True, text=True,
                         timeout=600).stdout
    ref = {}
    table = None
    for line in out.splitlines():
        if "CONV BS Price" in line:
            table = "bs"
            continue
        if "CONV VG Price" in line:
            table = "vg"
            continue
        m = re.match(r"\s*(\d+)\s+([-\d.]+)\s+([-\d.]+)\s+([\d.]+)", line)
        if m and table:
            n, price, err, dt = (int(m.group(1)), float(m.group(2)),
                                 float(m.group(3)), float(m.group(4)))
            ref[(table, n)] = (price, err, dt)
            print(json.dumps({"metric": f"ref_{table}", "n": n,
                              "price": price, "error": err,
                              "t_s": dt}), flush=True)
    return ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/vargamma")
    ap.add_argument("--sizes", default=",".join(str(s) for s in SIZES))
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    ref = run_reference(args.ref)

    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.models.pricing import conv_bsvg_option
    from cfftpack_tpu.models.chfun import bs_cf, vg_cf
    from cfftpack_tpu.ops.rfft import rfilter_split
    from cfftpack_tpu.plan import fft_next_fast_even_size

    # closed form via erf (no scipy dependency)
    from math import erf, exp, log, sqrt
    d1 = (log(S / K) + (R + SIGMA * SIGMA / 2) * T) / (SIGMA * sqrt(T))
    d2 = d1 - SIGMA * sqrt(T)
    nrm = lambda z: 0.5 * (1 + erf(z / sqrt(2)))       # noqa: E731
    cbs = S * nrm(d1) - K * exp(-R * T) * nrm(d2)

    dev = jax.devices()[0]
    print(json.dumps({"metric": "device", "kind": dev.device_kind,
                      "bs_closed_form": round(cbs, 12)}), flush=True)

    for n in sizes:
        N = fft_next_fast_even_size(n)
        for fam, anchor in (("bs", cbs), ("vg", VG_TARGET)):
            # ---- latency: one option end-to-end (matches the
            # reference's per-call semantics minus plan/compile)
            price = conv_bsvg_option(n, S, K, SIGMA, THETA, KAPPA, T, R,
                                     is_bs=(fam == "bs"))  # warm/compile
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                price = conv_bsvg_option(n, S, K, SIGMA, THETA, KAPPA,
                                         T, R, is_bs=(fam == "bs"))
                best = min(best, time.perf_counter() - t0)
            row = {"metric": f"tpu_{fam}_latency", "n": N,
                   "price": round(float(price), 9),
                   "error": round(float(price) - anchor, 9),
                   "t_s": round(best, 6)}
            r = ref.get((fam, n))
            if r:
                row["ref_t_s"] = r[2]
                row["speedup"] = round(r[2] / best, 2) if best else None
            print(json.dumps(row), flush=True)

        # ---- throughput: B-strike ladder, one rfilter pass (device
        # program is identical for BS/VG — only the host-built phi
        # differs — so one slope measurement covers both families)
        B = min(512, max(8, (1 << 25) // N))
        N2 = N // 2
        L = 2 * 10 * SIGMA * np.sqrt(T)
        ds = L / N
        du = 2 * np.pi / (ds * N)
        grid = np.log(S) + (N2 - np.arange(N)) * ds
        ks = np.linspace(80.0, 120.0, B)
        payoff = np.maximum(np.exp(grid)[None, :] - ks[:, None], 0.0)
        phi = np.asarray(bs_cf(np.arange(N2 + 1) * du, T, SIGMA, R))
        V = jnp.asarray(payoff.astype(np.float32))
        phir = jnp.asarray(phi.real.astype(np.float32))
        phin = jnp.asarray((-phi.imag).astype(np.float32))
        body = jax.jit(lambda v: rfilter_split(v, phir, phin))
        t = per_iter(body, V)
        row = {"metric": "tpu_ladder", "n": N, "batch": B,
               "t_us_per_option": round(t / B * 1e6, 3),
               "t_us_per_pass": round(t * 1e6, 1)}
        r = ref.get(("bs", n))
        if r:
            row["speedup_vs_ref_per_option"] = round(r[2] / (t / B), 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
