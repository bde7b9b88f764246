"""On-chip validation: every transform family vs the reference-C golden
vectors, executed on the REAL TPU in float32.

Run with the ambient axon environment: python scripts/tpu_validate.py
Prints a per-family max relative error table (f32 target: <= ~1e-5).
DCT/DST run through the public real API; complex transforms through the
split API (the TPU backend rejects complex dtypes).
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def relerr(got, want):
    scale = max(1e-30, np.abs(want).max())
    return np.abs(got - want).max() / scale


def main():
    import jax
    import jax.numpy as jnp
    import cfftpack_tpu as ct

    print(f"backend: {jax.devices()[0].device_kind} "
          f"({jax.default_backend()})")
    g = np.load(os.path.join(os.path.dirname(__file__), "..", "tests",
                             "golden", "golden.npz"))
    rows = []

    def check(name, err, tol=5e-5):
        rows.append((name, err, "OK" if err < tol else "FAIL"))

    # complex fft via split API
    for n in (60, 101, 960, 1024, 1250):
        x = g[f"fft_in_{n}"]
        yr, yi = ct.fft_split(jnp.asarray(x.real.astype(np.float32)),
                              jnp.asarray(x.imag.astype(np.float32)))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        check(f"fft n={n}", relerr(got, g[f"fft_fwd_{n}"]))

    # rfft via split API (reference packing relation)
    for n in (60, 960, 1024):
        x = g[f"rfft_in_{n}"].astype(np.float32)
        yr, yi = ct.rfft_split(jnp.asarray(x))
        got = np.asarray(yr) + 1j * np.asarray(yi)
        ref = g[f"rfft_fwd_{n}"]
        hi = n // 2
        err = max(relerr(got[0], ref[0]),
                  relerr(2 * np.conj(got[1:hi]), ref[1:hi]))
        check(f"rfft n={n}", err)

    # real families through the public API
    fams = [("dct", 3, ct.dct), ("dct1", 1, ct.dct), ("dct4", 4, ct.dct),
            ("dst", 3, ct.dst), ("dst1", 1, ct.dst), ("dst4", 4, ct.dst),
            ("dct5", 5, ct.dct), ("dct8", 8, ct.dct),
            ("dst5", 5, ct.dst), ("dst8", 8, ct.dst)]
    for fam, t, fn in fams:
        n = 60 if f"{fam}_in_60" in g else 13
        x = g[f"{fam}_in_{n}"].astype(np.float32)
        got = np.asarray(fn(jnp.asarray(x), t))
        check(f"{fam} n={n}", relerr(got, g[f"{fam}_fwd_{n}"]))

    # compiled Pallas kernel (opt-in impl) on eligible lengths
    for n in (960, 1024):
        x = g[f"fft_in_{n}"]
        yr, yi = ct.fft_split(jnp.asarray(x.real.astype(np.float32)),
                              jnp.asarray(x.imag.astype(np.float32)),
                              impl="pallas")
        got = np.asarray(yr) + 1j * np.asarray(yi)
        check(f"fft[pallas] n={n}", relerr(got, g[f"fft_fwd_{n}"]))

    # gdft via split API
    x = g["gdft_in_60_0.5_0.0"]
    zr, zi = ct.gdft_split(jnp.asarray(x.real.astype(np.float32)),
                           jnp.asarray(x.imag.astype(np.float32)),
                           a=0.0, b=0.5)
    got = np.asarray(zr) + 1j * np.asarray(zi)
    check("gdft a_ref=.5", relerr(got, g["gdft_fwd_60_0.5_0.0"]))

    # 2-D DCT
    x = g["dct2d_in_8x6"].astype(np.float32)
    got = np.asarray(ct.dctn(jnp.asarray(x), 3))
    check("dct_2d 8x6", relerr(got, g["dct2d_fwd_8x6"]))

    # round-4 legs ------------------------------------------------
    # 2-D split API (the on-TPU 2-D path) vs numpy
    r4 = np.random.default_rng(4)
    a = r4.standard_normal((2, 24, 36)).astype(np.float32)
    b = r4.standard_normal((2, 24, 36)).astype(np.float32)
    yr, yi = ct.fft2_split(jnp.asarray(a), jnp.asarray(b), norm="ortho")
    want2 = np.fft.fft2(a.astype(np.float64)
                        + 1j * b.astype(np.float64), norm="ortho")
    check("fft2_split 24x36",
          relerr(np.asarray(yr) + 1j * np.asarray(yi), want2))
    sr, si = ct.rfft2_split(jnp.asarray(a))
    wantr = np.fft.rfft2(a.astype(np.float64)) / (24 * 36)
    check("rfft2_split 24x36",
          relerr(np.asarray(sr) + 1j * np.asarray(si), wantr))
    back = np.asarray(ct.irfft2_split(sr, si, (24, 36)))
    check("irfft2_split roundtrip", relerr(back, a))

    # Bluestein with the stream-eligible pad (explicit, small n so it
    # compiles fast; the auto gate only fires at huge n)
    from cfftpack_tpu.ops import core as _core
    from cfftpack_tpu import plan as _plan
    n = 101
    x = g[f"fft_in_{n}"]
    _orig = _core._stream_pad_for_bluestein
    _fired = []
    _core._stream_pad_for_bluestein = (
        lambda n_, bp, dt: (_fired.append(n_),
                            _plan.next_stream_size(2 * n_ - 1))[1])
    try:
        # BATCHED shape (2, n): the unbatched (n,) signature was already
        # compiled by the earlier complex-fft leg, so it hits the jit
        # cache and the patched pad hook never runs at trace time
        # (advisor finding, round 4) — a fresh signature forces a trace
        xb = np.stack([x, 2.0 * x])
        yr, yi = ct.fft_split(jnp.asarray(xb.real.astype(np.float32)),
                              jnp.asarray(xb.imag.astype(np.float32)))
    finally:
        _core._stream_pad_for_bluestein = _orig
    assert _fired, "stream-pad hook did not execute (jit cache hit?)"
    got = np.asarray(yr) + 1j * np.asarray(yi)
    check("fft bluestein stream-pad n=101",
          max(relerr(got[0], g[f"fft_fwd_{n}"]),
              relerr(got[1], 2.0 * g[f"fft_fwd_{n}"])))

    # hp large-n engines on-chip (value-level vs the flat hp engine)
    from cfftpack_tpu.ops import hp as _hp
    xq = r4.standard_normal((64, 2048)).astype(np.float32)
    yq = r4.standard_normal((64, 2048)).astype(np.float32)
    quad = (jnp.asarray(xq), jnp.zeros((64, 2048), jnp.float32),
            jnp.asarray(yq), jnp.zeros((64, 2048), jnp.float32))

    def _val(out):
        v = [np.asarray(t) for t in out]
        return ((v[0].astype(np.float64) + v[1])
                + 1j * (v[2].astype(np.float64) + v[3]))

    flat = _val(_hp._sfft_hp_jit(*quad, 2048, False, False))
    four = _val(_hp._fourstep_hp_jit(*quad, 2048, False, False))
    check("hp fourstep vs flat (value)", relerr(four, flat), tol=1e-13)

    # f64 first-class routing: double input to the MAIN dtype API on
    # this TPU backend must auto-route to the hp engine and come back
    # at the reference's C-double tolerance (testall.c 1e-13 bar), not
    # warn-and-hang in the f64-hostile backend
    if jax.default_backend() != "cpu":
        n = 60
        x = g[f"fft_in_{n}"]                      # complex128
        got = ct.fft(x)
        assert isinstance(got, np.ndarray) and got.dtype == np.complex128
        check(f"fft f64-route n={n}", relerr(got, g[f"fft_fwd_{n}"]),
              tol=1e-13)
        xr = g[f"dct_in_{n}"]                     # float64
        check(f"dct f64-route n={n}", relerr(ct.dct(xr, 3),
                                             g[f"dct_fwd_{n}"]), tol=1e-13)

    # round-5 legs ------------------------------------------------
    # compiled column kernel (auto-dispatched at >= 2^21 elems; forced
    # here at a fast-compiling size via the direct entry)
    from cfftpack_tpu.ops import pallas_colfft as _pc
    ac = r4.standard_normal((2, 64, 256)).astype(np.float32)
    bc = r4.standard_normal((2, 64, 256)).astype(np.float32)
    cr, ci = _pc.scolfft_pallas(jnp.asarray(ac), jnp.asarray(bc),
                                scale=0.5)
    wantc = np.fft.fft(ac.astype(np.float64)
                       + 1j * bc.astype(np.float64), axis=-2) * 0.5
    check("colfft 64x256 (scaled)",
          relerr(np.asarray(cr) + 1j * np.asarray(ci), wantc))

    # compiled real-stream kernels (opt-in surface)
    from cfftpack_tpu.ops import pallas_rstream as _rs
    xs = r4.standard_normal((4, 2048)).astype(np.float32)
    yr5, yi5 = _rs.srfft_stream_pallas(jnp.asarray(xs), 2048)
    wr5 = np.fft.rfft(xs.astype(np.float64))
    check("rstream rfft n=2048",
          relerr(np.asarray(yr5) + 1j * np.asarray(yi5), wr5))
    back5 = np.asarray(_rs.sirfft_stream_pallas(yr5, yi5, 2048)) / 2048
    check("rstream irfft roundtrip", relerr(back5, xs))

    # dct4 permuted-stream tail (auto gate fires only at huge n; force
    # the tail at a fast size via the direct entry)
    import importlib as _il
    _dct = _il.import_module("cfftpack_tpu.ops.dct")
    n5, h5 = 4096, 2048
    xd = r4.standard_normal((4, n5)).astype(np.float32)
    p5 = np.arange(h5)
    pre5 = np.exp(-1j * np.pi * p5 / n5)
    post5 = np.exp(-1j * np.pi * (2 * p5 + 0.5) / (2 * n5))
    crr = xd[:, 0::2]
    cii = xd[:, ::-1][:, 0::2]
    wr_ = jnp.asarray(crr * pre5.real.astype(np.float32)
                      - cii * pre5.imag.astype(np.float32))
    wi_ = jnp.asarray(crr * pre5.imag.astype(np.float32)
                      + cii * pre5.real.astype(np.float32))
    got_t = np.asarray(_dct._dct4_stream_tail(wr_, wi_, n5, post5))
    want_t = np.asarray(_dct._dct4_core(jnp.asarray(xd), n5))
    check("dct4 stream tail n=4096", relerr(got_t, want_t))

    # split-stream complex FFT (auto-dispatched at n >= 2^20; compiled
    # here at the dispatch size with a tiny batch for compile speed)
    from cfftpack_tpu.ops import pallas_stream as _ps
    n6 = 1 << 20
    xr6 = r4.standard_normal((2, n6)).astype(np.float32)
    xi6 = r4.standard_normal((2, n6)).astype(np.float32)
    sr6, si6 = _ps.sfft_stream_split(jnp.asarray(xr6), jnp.asarray(xi6),
                                     n6, False)
    fr6, fi6 = _core._fourstep_local(jnp.asarray(xr6), jnp.asarray(xi6),
                                     n6, False)
    check("split-stream n=2^20 vs fourstep",
          relerr(np.asarray(sr6) + 1j * np.asarray(si6),
                 np.asarray(fr6) + 1j * np.asarray(fi6)))

    # column DCT (pair + colfft) vs the moveaxis path
    xcd = r4.standard_normal((2, 64, 256)).astype(np.float32)
    got_cd = np.asarray(_dct._coldct2_core(jnp.asarray(xcd), 64))
    want_cd = np.asarray(jnp.moveaxis(
        _dct._dct2_core(jnp.moveaxis(jnp.asarray(xcd), -2, -1), 64),
        -1, -2))
    check("coldct2 64x256", relerr(got_cd, want_cd))

    width = max(len(r[0]) for r in rows) + 2
    bad = 0
    for name, err, status in rows:
        print(f"  {name:<{width}} rel err {err:.2e}  {status}")
        bad += status != "OK"
    print(f"{len(rows) - bad}/{len(rows)} families within f32 tolerance"
          + ("" if not bad else f"  ({bad} FAILED)"))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
