"""Head-to-head: reference native-f64 FFT (C, host) vs the TPU
double-float engine — the ACCURACY-mode comparison.

The reference's precision story is the C `double` (fft_real_t,
fftpack.h:59-64): every transform at ~1e-15.  The TPU in this
environment cannot run f64 at all (execution hangs), so the comparable
TPU path is ops/hp.py's double-float engine: (hi, lo) f32 pairs with
error-free-transformation arithmetic, ~5e-15 relative.

This harness times BOTH at the flagship shape (n=1024, batched) and
checks both accuracies against the same numpy f64 oracle — per-path
evidence that even the framework's accuracy mode outruns the
reference's native double transform per-transform.

Build the reference once (same objects as tools/make_golden.py):

    cd /tmp/refbuild && gcc -O2 -shared -fPIC fftpack.o cfftpack.o \
        cfftextra.o -lm -o libcfftref.so

Outputs one JSON line per measurement.

Usage: python benchmarks/hp_headtohead.py [--ref /tmp/refbuild/libcfftref.so]
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

N = 1024
BATCH = 4096
REPS_REF = 512


def time_reference(lib) -> tuple[float, float]:
    """Per-transform time + accuracy of the reference f64 complex FFT.

    fft_forward is in-place and 1/N-scaled; timing loops over REPS_REF
    fresh copies (the copy cost is subtracted via a memcpy baseline).
    """
    lib.fft_create.restype = ctypes.c_void_p
    f = lib.fft_create(N)
    assert f
    r = np.random.default_rng(0)
    x = (r.standard_normal(N) + 1j * r.standard_normal(N)).astype(
        np.complex128)
    # accuracy
    d = x.copy()
    lib.fft_forward(ctypes.c_void_p(f),
                    d.ctypes.data_as(ctypes.c_void_p))
    want = np.fft.fft(x) / N
    acc = float(np.linalg.norm(d - want) / np.linalg.norm(want))
    # timing: copy + transform, minus copy
    bufs = [x.copy() for _ in range(8)]

    def run(transform: bool):
        t0 = time.perf_counter()
        for i in range(REPS_REF):
            b = bufs[i % 8]
            np.copyto(b, x)
            if transform:
                lib.fft_forward(ctypes.c_void_p(f),
                                b.ctypes.data_as(ctypes.c_void_p))
        return time.perf_counter() - t0

    run(True)
    t_full = min(run(True) for _ in range(3))
    t_copy = min(run(False) for _ in range(3))
    lib.fft_free.argtypes = [ctypes.c_void_p]
    lib.fft_free(ctypes.c_void_p(f))
    return (t_full - t_copy) / REPS_REF, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild/libcfftref.so")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.ops.hp import _sfft_hp_jit
    from cfftpack_tpu.ops.df64 import df_split_host, df_merge_host
    from cfftpack_tpu.ops import core

    dev = jax.devices()[0]
    print(json.dumps({"metric": "device", "kind": dev.device_kind,
                      "backend": dev.platform}), flush=True)

    if os.path.exists(args.ref):
        lib = ctypes.CDLL(args.ref)
        t_ref, acc_ref = time_reference(lib)
        print(json.dumps({"metric": "reference_f64_fft", "n": N,
                          "us_per_transform": round(t_ref * 1e6, 3),
                          "rel_err_vs_numpy": acc_ref}), flush=True)
    else:
        t_ref = None
        print(json.dumps({"metric": "reference_skipped",
                          "path": args.ref}), flush=True)

    r = np.random.default_rng(0)
    x = r.standard_normal((BATCH, N)) + 1j * r.standard_normal((BATCH, N))
    Rh, Rl = df_split_host(x.real)
    Ih, Il = df_split_host(x.imag)
    quad = tuple(jnp.asarray(v) for v in (Rh, Rl, Ih, Il))

    out = _sfft_hp_jit(*quad, N, False)
    got = (df_merge_host(np.asarray(out[0]), np.asarray(out[1]))
           + 1j * df_merge_host(np.asarray(out[2]), np.asarray(out[3])))
    want = np.fft.fft(x, axis=-1)
    acc_hp = float(np.linalg.norm(got - want) / np.linalg.norm(want))

    # exact 2^-k rescale (1/sqrt(N)) keeps chained magnitudes bounded
    dn_f = float(1.0 / np.sqrt(N))
    assert dn_f == 2.0 ** round(np.log2(dn_f)), "need exact 2^-k rescale"
    dn = np.float32(dn_f)

    def body(s):
        o = _sfft_hp_jit(s[0], s[1], s[2], s[3], N, False)
        return tuple(a * dn for a in o)

    t_hp = per_iter(body, quad, lo=4, hi=24) / BATCH

    # f32 leg must evolve BOTH planes through the loop or XLA dead-code
    # eliminates half the transform (a prior run published 0.0105
    # us/transform — 3x above the HBM roofline, i.e. impossible)
    def body32(s):
        rr, ii = core.sfft(s[0], s[2], N, False)
        return (rr * dn, s[1], ii * dn, s[3])

    t_f32 = per_iter(body32, quad, lo=4, hi=54) / BATCH

    row = {"metric": "fft_hp_vs_reference_f64", "n": N, "batch": BATCH,
           "tpu_hp_us_per_transform": round(t_hp * 1e6, 4),
           "tpu_f32_us_per_transform": round(t_f32 * 1e6, 4),
           "hp_rel_err_vs_numpy": acc_hp}
    if t_ref is not None:
        row["ref_f64_us_per_transform"] = round(t_ref * 1e6, 3)
        row["speedup_hp_vs_ref_f64"] = round(t_ref / t_hp, 1)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
