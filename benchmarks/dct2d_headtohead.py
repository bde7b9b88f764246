"""Head-to-head: reference 2-D DCT (C, host) vs cfftpack_tpu dctn.

The reference's second timing harness is test1.c:264-309
(time_dcct_2d): 1000 reps of dct_2d_inverse on a 128x128 image,
memcpy included, advertising the library's row-column path as ~25%
faster than hand-looped 1-D (cfftextra.h:133-136).  This script times
exactly that call through ctypes against the committed reference .so,
then the cfftpack_tpu equivalent (idctn type 3 — the documented
dct_2d_inverse analog, see ops/dct.py dctn docstring) on the ambient
device as a batched image stack (the TPU-native shape).

Build the .so once (same recipe as tools/make_golden.py):

    gcc -O2 -fPIC -shared -I/root/reference \
        /root/reference/cfftpack/fftpack.c \
        /root/reference/cfftpack/cfftpack.c \
        /root/reference/cfftpack/cfftextra.c -lm \
        -o /tmp/refbuild/libcfftref.so

Usage: python benchmarks/dct2d_headtohead.py [M N [M N ...]]
"""
from __future__ import annotations

import ctypes
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter  # noqa: E402

LIB = os.environ.get("CFFTREF_SO", "/tmp/refbuild/libcfftref.so")


def ref_time_per_image(M: int, N: int, reps: int = 200) -> float:
    lib = ctypes.CDLL(LIB)
    lib.dct_2d_create.restype = ctypes.c_void_p
    lib.dct_2d_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.dct_2d_inverse.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.fft_free.argtypes = [ctypes.c_void_p]
    f = lib.dct_2d_create(M, N)
    assert f
    src = (np.arange(M)[:, None] + np.arange(N)[None, :] + 1.0
           ).astype(np.float64).ravel(order="F").copy()
    buf = np.empty_like(src)
    fv = ctypes.c_void_p(f)
    bp = buf.ctypes.data_as(ctypes.c_void_p)
    # warm
    np.copyto(buf, src)
    lib.dct_2d_inverse(fv, bp)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            np.copyto(buf, src)       # the harness memcpy
            lib.dct_2d_inverse(fv, bp)
        best = min(best, (time.perf_counter() - t0) / reps)
    lib.fft_free(fv)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from cfftpack_tpu.ops.dct import idctn

    args = [int(a) for a in sys.argv[1:]]
    shapes = (list(zip(args[0::2], args[1::2])) if args else
              [(64, 64), (128, 128), (512, 512)])
    dev = jax.devices()[0]
    print(json.dumps({"metric": "device", "kind": dev.device_kind}),
          flush=True)
    r = np.random.default_rng(0)

    for M, N in shapes:
        t_ref = (ref_time_per_image(M, N) if os.path.exists(LIB)
                 else None)
        B = max(8, (1 << 22) // (M * N))
        x = jnp.asarray(r.standard_normal((B, M, N)).astype(np.float32))
        # 4/(M*N) keeps the chained fori_loop state bounded (the
        # fftpack-norm inverse is unscaled and would overflow f32)
        body = jax.jit(lambda s, c=4.0 / (M * N):
                       idctn(s, 3, axes=(-2, -1)) * c)
        t = per_iter(body, x) / B
        row = {"metric": "dct2d_inverse", "M": M, "N": N, "batch": B,
               "tpu_us_per_image": round(t * 1e6, 3)}
        if t_ref is not None:
            row["ref_us_per_image"] = round(t_ref * 1e6, 2)
            row["speedup"] = round(t_ref / t, 1)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
