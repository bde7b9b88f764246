"""2^23-element working-set dispatch A/B (round 4).

The round-2 engine grid (BASELINE.md "Engine dispatch") established
that fused stage chains collapse once the working set passes ~2^23
elements, but set the chunking threshold at 2^24 — it never measured
batch >= 256 configs AT 2^23 (e.g. (32768, 256), (16384, 512)), where
a sequential lax.map over TWO+ lane-tile flat chunks (each 2^22,
VMEM-fusible) should win ~2x.  The round-4 mid-range A/B
(STREAM_MID_AB_r04) showed every engine stuck at ~0.21 roofline at
(32768, 256) — this script measures whether chunked-flat/128 fixes it.

Also directly targets verdict item 2: bare rfft/dct2 at (65536, 256)
run their half-length sub-FFT at exactly (256, 32768).

Variants (one run, fwd-only ortho-scaled chains):
  flat           core._stockham
  dispatched     core._fft_any (status quo routing)
  chunkflat128   core._map_chunks(_stockham, bc=128)
  chunkfour32    core._map_chunks(_fourstep_local, bc=32) [n >= 2^16]
  stream         pallas stream kernel [eligible sizes]

Usage: python benchmarks/chunk23_ab.py > benchmarks/results/CHUNK23_AB_r04.jsonl
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks.sweep import per_iter, hbm_bandwidth  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from cfftpack_tpu.ops import core  # noqa: E402
from cfftpack_tpu.ops import pallas_stream as ps  # noqa: E402


def main():
    bw = hbm_bandwidth()
    print(json.dumps({"metric": "hbm_stream_GBps",
                      "value": round(bw / 1e9, 1)}))
    r = np.random.default_rng(0)
    configs = [(8192, 1024), (16384, 512), (32768, 256), (65536, 128),
               (65536, 256)]
    for n, b in configs:
        s = 1.0 / np.sqrt(n)
        xr = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        xi = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
        ideal = 2 * b * n * 8

        variants = {
            "flat": lambda a, c: core._stockham(a, c, n, False),
            "dispatched": lambda a, c: core._fft_any(a, c, n, False),
        }
        if b >= 256:
            variants["chunkflat128"] = lambda a, c: core._map_chunks(
                lambda u, v: core._stockham(u, v, n, False), a, c, 128)
        if n >= (1 << 16) and core._fourstep_split_n(n) is not None:
            variants["chunkfour32"] = lambda a, c: core._map_chunks(
                lambda u, v: core._fourstep_local(u, v, n, False),
                a, c, 32)
        if ps.stream_pallas_eligible(n, np.float32):
            variants["stream"] = lambda a, c: ps.sfft_stream_pallas(
                a, c, n, False)

        for name, fn in variants.items():
            try:
                t = per_iter(lambda st: tuple(
                    v * s for v in fn(st[0], st[1])), (xr, xi),
                    lo=2, hi=12)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"variant": name, "n": n,
                                  "error": str(e)[:120]}))
                continue
            print(json.dumps({"variant": name, "n": n, "batch": b,
                              "t_us": round(t * 1e6, 2),
                              "roofline": round(ideal / t / bw, 3)}))


if __name__ == "__main__":
    main()
