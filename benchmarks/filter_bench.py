"""One-run comparison: fused rfilter_split vs rfft->mul->irfft composition,
plus post-fusion rfft/dct re-measurement.  Variants compared WITHIN this
single run (cross-run tunnel variance is ~2x; see CLAUDE.md).

Emits one JSON line per variant.  Times are per CALL of the body (for
round-trip bodies that is fwd+inv; the filter bodies are one full
filter pipeline per call — directly comparable to each other).
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from sweep import per_iter, hbm_bandwidth  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import cfftpack_tpu as ct

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    bw = hbm_bandwidth()
    dev = jax.devices()[0]
    print(json.dumps({"metric": "hbm_stream_GBps", "value": round(bw / 1e9, 1),
                      "device": dev.device_kind}))

    r = np.random.default_rng(0)
    v = jnp.asarray(r.standard_normal((b, n)).astype(np.float32))
    f = r.standard_normal(n)
    fr_, fi_ = ct.rfft_split(jnp.asarray(f.astype(np.float32)))
    fr = jnp.asarray(np.asarray(fr_))
    fi = jnp.asarray(np.asarray(fi_))

    def filt_composed(s):
        sr, si = ct.rfft_split(s)
        tr = sr * fr - si * fi
        ti = sr * fi + si * fr
        return ct.irfft_split(tr, ti, n)

    def filt_fused(s):
        return ct.rfilter_split(s, fr, fi)

    # filter ideal traffic: read x + write out (the spectrum stays fused)
    ideal_filter = 2 * b * n * 4

    bodies = {
        # (body, state, transforms per call, ideal bytes per call)
        "rfft_roundtrip": (lambda s: ct.irfft_split(*ct.rfft_split(s), n),
                           v, 2, 2 * (b * n * 4 + b * (n + 2) * 4)),
        "filter_composed": (filt_composed, v, 1, ideal_filter),
        "filter_fused": (filt_fused, v, 1, ideal_filter),
        "dct2_roundtrip": (lambda s: ct.idct(ct.dct(s, 2), 2), v, 2,
                           4 * b * n * 4),
        "dct4_roundtrip": (lambda s: ct.idct(ct.dct(s, 4), 4), v, 2,
                           4 * b * n * 4),
        "fft_roundtrip": (lambda s: ct.ifft_split(*ct.fft_split(s[0], s[1])),
                          (v, v + 1.0), 2, 2 * (2 * b * n * 8)),
    }
    for name, (body, state, ntrans, ideal) in bodies.items():
        t = per_iter(body, state)
        tper = t / ntrans
        print(json.dumps({
            "metric": name, "n": n, "batch": b,
            "t_us_per_transform": round(tper * 1e6, 2),
            "roofline_frac": round((ideal / ntrans / tper) / bw, 4),
        }))


if __name__ == "__main__":
    main()
