"""Benchmark sweeps: per-kernel throughput vs HBM roofline.

Replaces the reference's ad-hoc clock() harnesses (test/test1.c:261-309,
test/vargamma.c:131-158) with a structured sweep over transform
families and sizes.  Timing uses the dependency-chained fori_loop slope
method (see bench.py) — robust to remote-TPU tunnels.

Run:  python benchmarks/sweep.py [--sizes 256,1024,4096] [--batch 4096]
Emits one JSON line per config.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# honor JAX_PLATFORMS even under site configs that pre-pin a backend
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def loop_time(body, state, reps: int) -> float:
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(s):
        out = jax.lax.fori_loop(0, reps, lambda i, v: body(v), s)
        return sum(jnp.sum(o * 1e-6) for o in jax.tree.leaves(out))

    float(prog(state))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(prog(state))
        best = min(best, time.perf_counter() - t0)
    return best


def per_iter(body, state, lo=4, hi=204) -> float:
    return max((loop_time(body, state, hi) - loop_time(body, state, lo))
               / (hi - lo), 1e-9)


def hbm_bandwidth() -> float:
    """Measured streaming bandwidth over a > VMEM working set."""
    import jax.numpy as jnp
    big = jnp.ones((65536, 1024), jnp.float32)
    t = per_iter(lambda s: s + 1e-7, big, lo=4, hi=54)
    return 2 * big.size * 4 / t


def main():
    import jax
    import jax.numpy as jnp
    import cfftpack_tpu as ct

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,1024,4096")
    ap.add_argument("--batch", default="4096",
                    help="fixed batch, or 'auto' = max(64, 2^22 // n) so "
                    "the working set stays HBM-bound at every size")
    ap.add_argument("--families", default="fft,rfft,dct2,dct4")
    ap.add_argument("--scaling", action="store_true",
                    help="run the batch-sharded weak-scaling sweep instead")
    ap.add_argument("--mode2d", action="store_true",
                    help="run the 2-D sweep (BASELINE configs[3] class) "
                    "instead")
    args = ap.parse_args()
    if args.scaling:
        weak_scaling()
        return
    if args.mode2d:
        sweep_2d()
        return
    sizes = [int(s) for s in args.sizes.split(",")]
    fams = args.families.split(",")

    bw = hbm_bandwidth()
    dev = jax.devices()[0]
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1),
                      "device": dev.device_kind, "backend": dev.platform}))

    r = np.random.default_rng(0)
    for n in sizes:
        b = (max(64, (1 << 22) // n) if args.batch == "auto"
             else int(args.batch))
        xr = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        v = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))

        bodies = {
            # ideal bytes = sum over the chained transforms of one
            # read + one write of each transform's operands
            "fft": (lambda s: ct.ifft_split(*ct.fft_split(s[0], s[1])),
                    (xr, xi), 2, 2 * (2 * b * n * 8)),
            "rfft": (lambda s: ct.irfft_split(*ct.rfft_split(s), n),
                     v, 2, 2 * (b * n * 4 + b * (n + 2) * 4)),
            "dct2": (lambda s: ct.idct(ct.dct(s, 2), 2), v, 2,
                     4 * b * n * 4),
            "dct4": (lambda s: ct.idct(ct.dct(s, 4), 4), v, 2,
                     4 * b * n * 4),
        }
        for fam in fams:
            if fam not in bodies:
                continue
            body, state, ntrans, ideal_bytes = bodies[fam]
            t = per_iter(body, state)
            tper = t / ntrans
            print(json.dumps({
                "metric": f"{fam}_transforms_per_s",
                "n": n, "batch": b,
                "value": round(b / tper, 1),
                "t_us": round(tper * 1e6, 2),
                "roofline_frac": round(
                    (ideal_bytes / ntrans / tper) / bw, 4),
            }))




def sweep_2d():
    """2-D on-chip sweep (round-4 verdict item 3; BASELINE configs[3]
    is 4096^2 batch=64 on a pod — per-chip classes here): fft2_split /
    rfft2_split / dctn at 1024^2 and 4096^2.

    Ideal bytes per 2-D transform = 2 passes (one per axis), each a
    full read+write of the operand planes:
      fft2:  2 * 2rw * (2 planes * n^2 * 4B)      = 32 n^2
      rfft2: pass 1 real->half spectrum, pass 2 rw half spectrum
             = (n^2 + 2*n*(n/2+1)) * 4 + 4 * n*(n/2+1) * 4
      dctn:  real in/out both passes               = 16 n^2
    """
    import jax
    import jax.numpy as jnp
    import cfftpack_tpu as ct

    bw = hbm_bandwidth()
    dev = jax.devices()[0]
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1),
                      "device": dev.device_kind, "backend": dev.platform}))
    r = np.random.default_rng(0)
    cfgs = ((1024, 64), (4096, 4))
    if os.environ.get("SWEEP2D_SIZES"):     # e.g. "1024:64,4096:4"
        cfgs = tuple(tuple(int(v) for v in c.split(":"))
                     for c in os.environ["SWEEP2D_SIZES"].split(","))
    for n, b in cfgs:
        xr = jnp.asarray(
            r.standard_normal((b, n, n)).astype(np.float32))
        xi = jnp.asarray(
            r.standard_normal((b, n, n)).astype(np.float32))
        h = n // 2 + 1
        bodies = {
            "fft2": (lambda s: ct.fft2_split(s[0], s[1], norm="ortho"),
                     (xr, xi), 32 * n * n),
            "rfft2": (lambda s: ct.irfft2_split(
                          *ct.rfft2_split(s), (n, n)),
                      xr, ((n * n + 2 * n * h) * 4 + 4 * n * h * 4) * 2),
            "dctn": (lambda s: ct.idctn(
                         ct.dctn(s, type=2, axes=(-2, -1)),
                         type=2, axes=(-2, -1)),
                     xr, 16 * n * n * 2),
        }
        for fam, (body, state, ideal1) in bodies.items():
            ntrans = 2 if fam in ("rfft2", "dctn") else 1
            try:
                t = per_iter(body, state, lo=2, hi=10)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"metric": f"{fam}_2d", "n": n,
                                  "error": str(e)[:120]}))
                continue
            tper = t / ntrans
            print(json.dumps({
                "metric": f"{fam}_2d_transforms_per_s",
                "n": n, "batch": b,
                "value": round(b / tper, 2),
                "t_us": round(tper * 1e6, 1),
                "roofline_frac": round(
                    (b * ideal1 / ntrans / tper) / bw, 4),
            }))


def weak_scaling(batch_per_device: int = 512, n: int = 1024):
    """Batch-sharded weak scaling over 1..D local devices.

    On real multi-chip hardware this measures the BASELINE >=85%
    weak-scaling target; on a virtual CPU mesh the devices share host
    cores, so treat the numbers as a mechanism check only (flagged in
    the output).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    import cfftpack_tpu as ct
    from cfftpack_tpu.parallel import make_mesh

    devs = jax.devices()
    virtual = devs[0].platform == "cpu" and len(devs) > 1
    base_tput = None
    d = 1
    while d <= len(devs):
        mesh = make_mesh((d,), ("data",), devices=devs[:d])
        spec = NamedSharding(mesh, P("data", None))
        b = batch_per_device * d
        r = np.random.default_rng(0)
        xr = jax.device_put(
            jnp.asarray(r.standard_normal((b, n)).astype(np.float32)), spec)
        xi = jax.device_put(
            jnp.asarray(r.standard_normal((b, n)).astype(np.float32)), spec)
        f = jax.jit(lambda a, b: ct.ifft_split(*ct.fft_split(a, b)),
                    in_shardings=(spec, spec), out_shardings=(spec, spec))
        t = per_iter(lambda s: f(s[0], s[1]), (xr, xi), lo=4, hi=104) / 2.0
        tput = b / t
        if base_tput is None:
            base_tput = tput
        print(json.dumps({
            "metric": "weak_scaling_transforms_per_s",
            "devices": d, "batch": b, "n": n,
            "value": round(tput, 1),
            "efficiency": round(tput / (base_tput * d), 4),
            "virtual_devices": virtual,
        }))
        d *= 2

if __name__ == "__main__":
    main()
