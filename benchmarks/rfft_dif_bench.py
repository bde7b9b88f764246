"""A/B: absorb rfft's even/odd deinterleave into the half-FFT's first
stage (round-3 verdict item 5).

The residual rfft gap vs a complex FFT (~0.96x at (1024, 4096), target
<= 0.75x) is the stride-2 gather + mirror read materializing as full
passes (BASELINE.md real-engine section).  The stride-2 gather IS a
decimation reorder, so this variant feeds the half-length FFT's FIRST
Stockham stage directly from x with composed strided reads — if XLA
fuses each strided load into the butterfly FMA instead of
materializing the deinterleave, one full memory pass disappears.

Measures (same-protocol roundtrip chains, one run):
  fft      complex roundtrip (the reference point)
  rfft     current engine (srfft/sirfft with materialized deinterleave)
  rfft_dif stage-1-absorbed forward + current inverse

Writes benchmarks/results/RFFT_DIF_AB_r03.jsonl.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import _per_iter  # noqa: E402


def make_srfft_dif():
    import jax.numpy as jnp
    from cfftpack_tpu import plan
    from cfftpack_tpu.ops import core

    def srfft_dif(x, n: int):
        """core.srfft (even n) with the deinterleave composed into the
        first half-FFT stage's operand reads."""
        h = n // 2
        facs = plan.factor(h)
        tws = plan.stage_twiddles(h)
        p0 = facs[0]
        mn0 = h // p0
        lead = x.shape[:-1]
        x2 = x.reshape(-1, n)
        B = x2.shape[0]
        # stage-1 operands straight from x: z[j*mn0 + k] = x[2t] + i x[2t+1]
        assert p0 == 4, "experiment expects a radix-4 first stage"
        R = [x2[:, 2 * j * mn0: 2 * (j + 1) * mn0: 2] for j in range(p0)]
        I = [x2[:, 2 * j * mn0 + 1: 2 * (j + 1) * mn0: 2]
             for j in range(p0)]
        # radix-4 butterfly DIRECTLY on the strided slices — no input
        # stack, so XLA is free to fuse each strided load into the adds
        ar, ai = R[0] + R[2], I[0] + I[2]
        br, bi = R[0] - R[2], I[0] - I[2]
        cr, ci = R[1] + R[3], I[1] + I[3]
        dr, di = I[1] - I[3], -(R[1] - R[3])        # sgn = -1 (forward)
        outs = [(ar + cr, ai + ci), (br + dr, bi + di),
                (ar - cr, ai - ci), (br - dr, bi - di)]
        tw = tws[0]
        tws_q = [(jnp.asarray(tw.real[q], dtype=x.dtype),
                  jnp.asarray(tw.imag[q], dtype=x.dtype))
                 for q in range(p0)]
        Vr, Vi = [], []
        for q, (ur, ui) in enumerate(outs):
            twr, twi = tws_q[q]
            Vr.append(ur * twr - ui * twi)
            Vi.append(ur * twi + ui * twr)
        # Stockham stage-1 store (L=1): rows q*mn0 + k
        Sr = jnp.stack(Vr, axis=1)
        Si = jnp.stack(Vi, axis=1)
        # remaining stages: the standard Stockham loop
        L, m = p0, mn0
        Sr = Sr.reshape(B, L, m)
        Si = Si.reshape(B, L, m)
        for p, tw in zip(facs[1:], tws[1:]):
            mn = m // p
            Ur, Ui = core._butterfly(Sr.reshape(B, L, p, mn),
                                     Si.reshape(B, L, p, mn), p, False)
            if mn > 1:
                twr = jnp.asarray(tw.real, dtype=x.dtype)[None, None]
                twi = jnp.asarray(tw.imag, dtype=x.dtype)[None, None]
                Ur, Ui = Ur * twr - Ui * twi, Ur * twi + Ui * twr
            Sr = jnp.swapaxes(Ur, 1, 2).reshape(B, L * p, mn)
            Si = jnp.swapaxes(Ui, 1, 2).reshape(B, L * p, mn)
            L *= p
            m = mn
        Zr = Sr.reshape(lead + (h,))
        Zi = Si.reshape(lead + (h,))
        # merge FMA (identical to core.srfft's slice+flip form)
        a1, a2, a3, a4, b1, b2, b3, b4 = (
            jnp.asarray(t[1:], dtype=x.dtype)
            for t in core._rfft_merge_tables(n))
        Zrc = Zr[..., 1:]
        Zic = Zi[..., 1:]
        Zrf = Zrc[..., ::-1]
        Zif = Zic[..., ::-1]
        yr_c = Zrc * a1 + Zic * a2 + Zrf * a3 + Zif * a4
        yi_c = Zrc * b1 + Zic * b2 + Zrf * b3 + Zif * b4
        dc = Zr[..., :1] + Zi[..., :1]
        nyq = Zr[..., :1] - Zi[..., :1]
        z1 = jnp.zeros_like(dc)
        yr = jnp.concatenate([dc, yr_c, nyq], axis=-1)
        yi = jnp.concatenate([z1, yi_c, z1], axis=-1)
        return yr, yi

    return srfft_dif


def main():
    import jax
    import jax.numpy as jnp
    import cfftpack_tpu as ct
    from cfftpack_tpu.ops import core

    n, batch = 1024, 4096
    r = np.random.default_rng(0)
    v = jnp.asarray(r.standard_normal((batch, n)).astype(np.float32))
    xr = v
    xi = jnp.asarray(r.standard_normal((batch, n)).astype(np.float32))
    srfft_dif = make_srfft_dif()

    # correctness first
    yr, yi = jax.jit(srfft_dif, static_argnums=1)(v[:4], n)
    want = np.fft.rfft(np.asarray(v[:4]), axis=-1)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 5e-6, err
    print(f"srfft_dif correct: rel err {err:.2e}", flush=True)

    inv_n = np.float32(1.0 / n)

    def rt_fft(s):
        a, b = ct.fft_split(s[0], s[1])
        return ct.ifft_split(a, b)

    def rt_rfft(s):
        a, b = core.srfft(s, n)
        return core.sirfft(a, b, n) * inv_n

    def rt_rfft_dif(s):
        a, b = srfft_dif(s, n)
        return core.sirfft(a, b, n) * inv_n

    rows = []
    for name, body, state, per in [
            ("fft", rt_fft, (xr, xi), 2),
            ("rfft", jax.jit(rt_rfft), v, 2),
            ("rfft_dif", jax.jit(rt_rfft_dif), v, 2)]:
        t = _per_iter(body, state, lo=4, hi=204) / per
        rows.append({"n": n, "batch": batch, "variant": name,
                     "t_us": round(t * 1e6, 2)})
        print(rows[-1], flush=True)

    out = os.path.join(os.path.dirname(__file__), "results",
                       "RFFT_DIF_AB_r03.jsonl")
    with open(out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
