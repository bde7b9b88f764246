"""Weak-scaling efficiency harness (round-4 verdict item 7 / BASELINE
">=85% weak-scaling efficiency" clause).

Sweeps device counts d = 1, 2, 4, ..., D on the ambient platform and
measures per-device throughput with the PROBLEM SCALED TO THE MESH
(batch = rows_per_device * d) for the three weak-scaling workloads:

* batch-sharded complex FFT (parallel.batch semantics: zero
  collectives, the cfftmf_ analog — fftpack.c:2554),
* batch-sharded real FFT,
* the sample-sharded QMC asian pricer (models.asian_option_qmc_device
  mesh= path: one pmean, samples partitioned across the mesh).

Weak-scaling efficiency at d devices = t(1) / t(d) for d-fold work
(ideal: 1.0).  On this 1-chip bench the sweep runs on the virtual CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=D); the SAME
command runs unchanged on a real multi-chip slice the day one exists —
that is the point of committing the harness (the verdict's "ready-to-
run efficiency artifact").

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/weakscale.py --cpu

(--cpu pins the CPU platform via jax.config — the JAX_PLATFORMS env
var does NOT survive this image's sitecustomize; on a real multi-chip
slice drop the flag and the ambient platform is used.)

Emits one JSON line per (workload, d) plus a summary line with the
efficiency vector, appended to benchmarks/results/WEAKSCALE_r05.jsonl.

CPU-mesh caveat (recorded in the artifact): virtual devices SHARE the
host's cores, so per-device compute slows as d grows and the measured
"efficiency" is a LOWER bound that mostly reflects host contention,
not interconnect cost — the number that matters on a real slice is
produced by this same script there.  The suite's smoke test asserts
shapes/placement only.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROWS_PER_DEV = 256
N = 4096
QMC_PER_DEV = 1 << 15


def _loop_time(body, state, reps):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def prog(s):
        out = jax.lax.fori_loop(0, reps, lambda i, v: body(v), s)
        return sum(jnp.sum(o * 1e-6) for o in jax.tree.leaves(out))

    float(prog(state))
    t = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(prog(state))
        t = min(t, time.perf_counter() - t0)
    return t


def _per_iter(body, state, lo=2, hi=12):
    return max((_loop_time(body, state, hi) - _loop_time(body, state, lo))
               / (hi - lo), 1e-9)


def measure(d: int, devs):
    """One weak-scaling point: d devices, d-fold problem."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cfftpack_tpu.parallel import make_mesh
    from cfftpack_tpu.ops import core
    from cfftpack_tpu.models import asian_option_qmc_device

    mesh = make_mesh((d,), ("data",), devices=devs[:d])
    r = np.random.default_rng(0)
    b = ROWS_PER_DEV * d
    sh = NamedSharding(mesh, P("data", None))
    ar = jax.device_put(
        r.standard_normal((b, N)).astype(np.float32), sh)
    ai = jax.device_put(
        r.standard_normal((b, N)).astype(np.float32), sh)
    s = np.float32(1.0 / np.sqrt(N))

    def fft_body(v):
        yr, yi = core.sfft(v[0], v[1], N, inverse=False)
        return yr * s, yi * s

    def rfft_body(v):
        yr, yi = core.srfft(v, N)
        return core.sirfft(yr, yi, N) * np.float32(1.0 / N)

    t_fft = _per_iter(fft_body, (ar, ai))
    t_rfft = _per_iter(rfft_body, ar) / 2

    t0 = time.perf_counter()
    asian_option_qmc_device(samples=QMC_PER_DEV * d, mesh=mesh)
    t_qmc_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        asian_option_qmc_device(samples=QMC_PER_DEV * d, mesh=mesh)
    t_qmc = (time.perf_counter() - t0) / 3

    return {"d": d, "batch": b, "n": N,
            "t_fft_us": round(t_fft * 1e6, 2),
            "t_rfft_us": round(t_rfft * 1e6, 2),
            "t_qmc_ms": round(t_qmc * 1e3, 2),
            "t_qmc_cold_ms": round(t_qmc_cold * 1e3, 1)}


def main():
    import jax
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")

    devs = jax.devices()
    D = len(devs)
    ds = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= D]
    rows = [measure(d, devs) for d in ds]
    for row in rows:
        print(json.dumps(row), flush=True)

    base = rows[0]
    eff = {}
    for key in ("t_fft_us", "t_rfft_us", "t_qmc_ms"):
        eff[key.split("_")[1]] = {
            str(r["d"]): round(base[key] / r[key], 3) for r in rows}
    summary = {
        "leg": "weakscale_summary",
        "platform": devs[0].platform,
        "device_kind": devs[0].device_kind,
        "n_devices": D,
        "rows_per_dev": ROWS_PER_DEV,
        "qmc_per_dev": QMC_PER_DEV,
        "efficiency": eff,
        "note": ("efficiency = t(1)/t(d) at d-fold problem size; on a "
                 "virtual CPU mesh the devices share host cores, so "
                 "these are lower bounds dominated by host contention "
                 "— run this same script on a real slice for the "
                 "BASELINE >=85% clause"),
    }
    print(json.dumps(summary), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results", "WEAKSCALE_r05.jsonl")
    with open(out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
