"""A/B: huge-working-set FFT — streaming Pallas kernel vs XLA paths.

The round-2 dispatch grid (BASELINE.md) shows both XLA engines collapse
past ~2^24 total elements (0.07-0.21 of streaming roofline); the
dispatched remedy is a sequential lax.map over batch chunks.  Round-3
verdict item 1: attack this regime with a DMA-pipelined streaming
kernel (ops/pallas_stream.py).  This harness measures, per config:

  xla          dispatched core path (chunked lax.map here) — baseline
  pallas_v3    round-2 fused four-step kernel (where eligible)
  stream_nat   round-3 streaming kernel, natural-order in/out
               (pays one XLA transpose pass per direction)
  stream_perm  round-3 streaming kernel, permuted spectrum layout
               (the zero-transpose filter-pipeline form)

Each number is ONE forward transform of the full batch per chained
iteration (slope-timed fori_loop, per bench.py), with an identical
magnitude-preserving scale in every variant's body so the A/B
structures match.  Numeric parity vs numpy is asserted OUTSIDE the
timing chain.  Writes benchmarks/results/STREAM_AB_r03.jsonl.

Run alone on the chip (no concurrent CPU load — tunnel timing caveat,
CLAUDE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import _per_iter  # noqa: E402  (slope-timing helpers)

CONFIGS = [(65536, 256), (131072, 256)]
ROOF_BYTES = lambda n, b: 2 * 2 * n * b * 4   # rw of both f32 planes


def main():
    import jax
    import jax.numpy as jnp
    import cfftpack_tpu as ct
    from cfftpack_tpu.ops.pallas_fourstep import fourstep_pallas_eligible
    from cfftpack_tpu.ops.pallas_stream import (
        sfft_stream_pallas, sfft_stream_pallas_permuted)

    dev = jax.devices()[0]
    print(f"backend: {dev.device_kind} ({dev.platform})", flush=True)
    bw = 670e9 if dev.platform == "tpu" else None  # measured v5e stream

    out_path = os.path.join(os.path.dirname(__file__), "results",
                            "STREAM_AB_r03.jsonl")
    rows = []
    r = np.random.default_rng(0)
    for n, batch in CONFIGS:
        xr = jnp.asarray(r.standard_normal((batch, n)).astype(np.float32))
        xi = jnp.asarray(r.standard_normal((batch, n)).astype(np.float32))
        # every variant is ONE forward + one magnitude-preserving scale
        # per chained iteration (identical body structure -> fair A/B).
        # Pair/roundtrip bodies were tried first and retired: the
        # tunnel's min-of-5 occasionally returns sub-HBM-floor slopes
        # for multi-kernel bodies (271-us/fft class artifacts), and
        # chained scalar multiplies alone get constant-folded to zero.
        s_ortho = np.float32(1.0 / np.sqrt(n))
        variants = {
            "xla": lambda s: ct.fft_split(s[0], s[1], norm="ortho"),
            "stream_nat": lambda s: tuple(
                a * s_ortho for a in sfft_stream_pallas(
                    s[0], s[1], n, False)),
            "stream_perm": lambda s: tuple(
                a * s_ortho for a in sfft_stream_pallas_permuted(
                    s[0], s[1], n, False)),
        }
        if fourstep_pallas_eligible(n, np.float32):
            variants["pallas_v3"] = lambda s: ct.fft_split(
                s[0], s[1], norm="ortho", impl="pallas")

        for name, body in variants.items():
            try:
                t = _per_iter(body, (xr, xi), lo=2, hi=12)
            except Exception as ex:                    # e.g. VMEM OOM
                rows.append({"n": n, "batch": batch, "variant": name,
                             "error": str(ex).splitlines()[0][:120]})
                print(rows[-1], flush=True)
                continue
            row = {"n": n, "batch": batch, "variant": name,
                   "t_per_fft_us": round(t * 1e6, 1)}
            if bw:
                ideal = ROOF_BYTES(n, batch) / bw   # one-rw per transform
                row["roofline_frac"] = round(ideal / t, 4)
            rows.append(row)
            print(row, flush=True)

        # one-shot numeric sanity OUTSIDE the timing chain
        ref = np.fft.fft((np.asarray(xr[:2]) + 1j * np.asarray(xi[:2]))
                         .astype(np.complex128)) / np.sqrt(n)
        for name, body in variants.items():
            yr, yi = body((xr[:2], xi[:2]))
            got = np.asarray(yr) + 1j * np.asarray(yi)
            if "perm" in name:
                m = n // 128
                got = got.reshape(2, m, 128).transpose(0, 2, 1).reshape(
                    2, n)
            err = np.abs(got - ref).max() / np.abs(ref).max()
            assert err < 5e-5, (name, n, err)

    with open(out_path, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
