"""Pallas fused-FFT kernel: interpret-mode parity on CPU (the compiled
path is exercised on real TPU by bench.py / TPU smoke runs)."""
import numpy as np
import pytest
import jax.numpy as jnp

from cfftpack_tpu.ops.pallas_fft import sfft_pallas, pallas_eligible

SIZES = [4, 8, 60, 64, 243, 960, 1024]


def rng_pair(shape, seed=0):
    r = np.random.default_rng(seed)
    return (r.standard_normal(shape).astype(np.float32),
            r.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("n", SIZES)
def test_forward_matches_numpy(n):
    xr, xi = rng_pair((5, n), seed=n)
    yr, yi = sfft_pallas(jnp.asarray(xr), jnp.asarray(xi), n, False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(xr + 1j * xi)
    scale = max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() / scale < 5e-6


@pytest.mark.parametrize("n", [64, 960])
def test_roundtrip(n):
    xr, xi = rng_pair((3, n), seed=n + 1)
    yr, yi = sfft_pallas(jnp.asarray(xr), jnp.asarray(xi), n, False)
    zr, zi = sfft_pallas(yr, yi, n, True)
    got = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    np.testing.assert_allclose(got, xr + 1j * xi, atol=5e-5)


def test_batch_padding():
    """Batch not a multiple of the tile size pads then slices."""
    n = 64
    xr, xi = rng_pair((7, n), seed=2)
    yr, yi = sfft_pallas(jnp.asarray(xr), jnp.asarray(xi), n, False)
    assert yr.shape == (7, n)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(xr + 1j * xi)
    assert np.abs(got - want).max() < 5e-4


def test_eligibility():
    assert pallas_eligible(1024, jnp.float32)
    assert pallas_eligible(960, jnp.float32)
    assert not pallas_eligible(101, jnp.float32)     # Bluestein length
    assert not pallas_eligible(1, jnp.float32)
    assert not pallas_eligible(1024, jnp.float64)    # f32-only kernel


# ---------------------------------------------- four-step kernel

def test_fourstep_kernel_matches_numpy():
    from cfftpack_tpu.ops.pallas_fourstep import (
        fourstep_pallas_eligible, sfft_fourstep_pallas)
    assert fourstep_pallas_eligible(4096, jnp.float32)
    assert fourstep_pallas_eligible(65536, jnp.float32)
    assert not fourstep_pallas_eligible(4096, jnp.float64)
    assert not fourstep_pallas_eligible(131072, jnp.float32)  # n2=2048
    r = np.random.default_rng(3)
    n, b = 4096, 3            # odd batch exercises pair padding
    x = (r.standard_normal((b, n))
         + 1j * r.standard_normal((b, n))).astype(np.complex64)
    yr, yi = sfft_fourstep_pallas(x.real, x.imag, n, False)
    want = np.fft.fft(x.astype(np.complex128))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-6
    zr, zi = sfft_fourstep_pallas(np.asarray(yr), np.asarray(yi), n, True)
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    assert np.abs(back - x).max() < 1e-5


def test_fft_split_pallas_routes_large_n():
    import cfftpack_tpu as ct
    r = np.random.default_rng(4)
    n = 4096
    xr = r.standard_normal((2, n)).astype(np.float32)
    xi = r.standard_normal((2, n)).astype(np.float32)
    pr, pi = ct.fft_split(xr, xi, impl="pallas")
    er, ei = ct.fft_split(xr, xi)
    assert np.abs(np.asarray(pr) - np.asarray(er)).max() < 1e-5
    assert np.abs(np.asarray(pi) - np.asarray(ei)).max() < 1e-5


def test_stream_kernel_matches_numpy():
    """Round-3 streaming four-step kernel (ops/pallas_stream.py):
    natural + permuted layouts, forward/inverse/roundtrip, batch
    padding — interpret mode (compiled path measured on the real chip,
    benchmarks/stream_bench.py)."""
    from cfftpack_tpu.ops.pallas_stream import (
        stream_pallas_eligible, sfft_stream_pallas,
        sfft_stream_pallas_permuted)
    assert stream_pallas_eligible(65536, np.float32)
    assert stream_pallas_eligible(131072, np.float32)
    assert not stream_pallas_eligible(960, np.float32)   # not 128*2^k
    assert not stream_pallas_eligible(2048, np.float64)
    n = 2048                        # m=16: the tail-only schedule
    xr, xi = rng_pair((3, n), seed=11)
    yr, yi = sfft_stream_pallas(jnp.asarray(xr), jnp.asarray(xi), n,
                                False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(xr + 1j * xi)
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6
    # permuted layout relation: perm[.., k2, k1] == X[k2 + m*k1]
    m = n // 128
    pr, pi_ = sfft_stream_pallas_permuted(jnp.asarray(xr),
                                          jnp.asarray(xi), n, False)
    perm = (np.asarray(pr) + 1j * np.asarray(pi_)).reshape(3, m, 128)
    nat = want.reshape(3, 128, m)
    assert (np.abs(perm - nat.transpose(0, 2, 1)).max()
            / np.abs(want).max()) < 5e-6
    # zero-transpose roundtrip through the permuted inverse
    qr, qi = sfft_stream_pallas_permuted(pr, pi_, n, True)
    rt = (np.asarray(qr) + 1j * np.asarray(qi)) / n
    np.testing.assert_allclose(rt, xr + 1j * xi, atol=5e-5)


def test_stream_kernel_lead_radix2():
    """m = 32 = 2*16 exercises the lead radix-2 stage (n=4096)."""
    from cfftpack_tpu.ops.pallas_stream import sfft_stream_pallas
    n = 4096
    xr, xi = rng_pair((5, n), seed=13)      # batch > tile to hit grid
    yr, yi = sfft_stream_pallas(jnp.asarray(xr), jnp.asarray(xi), n,
                                False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(xr + 1j * xi)
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6
    zr, zi = sfft_stream_pallas(yr, yi, n, True)
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    np.testing.assert_allclose(back, xr + 1j * xi, atol=5e-5)


def test_stream_kernel_mixed_radix():
    """5-smooth m: radix-3/5 row stages ([3,16] at n=6144 etc.) —
    interpret mode; on-chip A/B in BASELINE.md (1.45-2.4x over the
    XLA engines at 98304/163840)."""
    from cfftpack_tpu.ops.pallas_stream import (stream_pallas_eligible,
                                                sfft_stream_pallas,
                                                _stage_plan)
    assert _stage_plan(768) == [3, 16]
    assert _stage_plan(240) == [3, 5]
    assert stream_pallas_eligible(98304, np.float32)
    assert not stream_pallas_eligible(128 * 7 * 16, np.float32)  # 7-smooth
    for n in (6144, 10240):            # m = 48 [3], m = 80 [5]
        xr, xi = rng_pair((2, n), seed=n)
        yr, yi = sfft_stream_pallas(jnp.asarray(xr), jnp.asarray(xi), n,
                                    False)
        got = np.asarray(yr) + 1j * np.asarray(yi)
        want = np.fft.fft(xr + 1j * xi)
        assert np.abs(got - want).max() / np.abs(want).max() < 5e-6
        zr, zi = sfft_stream_pallas(yr, yi, n, True)
        back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
        np.testing.assert_allclose(back, xr + 1j * xi, atol=5e-5)


def test_stream_filter_pipeline():
    """Fused streaming filter (sfilter_stream_pallas): batch-pair pack
    + permuted fwd + in-kernel F-multiply + permuted inverse must equal
    the sirfft(srfft(x) * F) composition exactly (the unscaled
    rfilter contract) — interpret mode; on-chip A/B in
    benchmarks/stream_filter_bench.py."""
    from cfftpack_tpu.ops import core
    from cfftpack_tpu.ops.pallas_stream import sfilter_stream_pallas
    n = 2048
    h = n // 2
    r = np.random.default_rng(21)
    x = r.standard_normal((4, n)).astype(np.float32)
    F = (r.standard_normal(h + 1) + 1j * r.standard_normal(h + 1))
    F[0] = F[0].real        # real DC/Nyquist: a real-filter spectrum
    F[-1] = F[-1].real
    fr = F.real.astype(np.float32)
    fi = F.imag.astype(np.float32)
    # reference: composition through the split engine
    yr, yi = core.srfft(jnp.asarray(x), n)
    tr = yr * fr - yi * fi
    ti = yr * fi + yi * fr
    want = np.asarray(core.sirfft(tr, ti, n))
    # fused: full conjugate-symmetric extension, paired stream kernels
    ffr = np.concatenate([fr, fr[1:h][::-1]])
    ffi = np.concatenate([fi, -fi[1:h][::-1]])
    got = np.asarray(sfilter_stream_pallas(
        jnp.asarray(x), jnp.asarray(ffr), jnp.asarray(ffi), n))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-6


def test_stream_filter_odd_batch_rejected():
    from cfftpack_tpu.ops.pallas_stream import sfilter_stream_pallas
    x = jnp.zeros((3, 2048), jnp.float32)
    f = jnp.zeros((2048,), jnp.float32)
    with pytest.raises(ValueError, match="even"):
        sfilter_stream_pallas(x, f, f, 2048)


def test_stream_filter_split_pipeline(monkeypatch):
    """Split variant (m > _MAX_M): s-point outer butterfly + split
    twiddle + per-k1 filter slices must still equal the composition.
    _MAX_M is patched down so the split engages at a test-sized n."""
    import cfftpack_tpu.ops.pallas_stream as ps
    from cfftpack_tpu.ops import core
    monkeypatch.setattr(ps, "_MAX_M", 16)
    n = 4096                            # m=32 > 16 -> s=2, m_in=16
    assert ps._filter_split_factor(n) == 2
    h = n // 2
    r = np.random.default_rng(31)
    x = r.standard_normal((4, n)).astype(np.float32)
    F = (r.standard_normal(h + 1) + 1j * r.standard_normal(h + 1))
    F[0] = F[0].real
    F[-1] = F[-1].real
    fr = F.real.astype(np.float32)
    fi = F.imag.astype(np.float32)
    yr, yi = core.srfft(jnp.asarray(x), n)
    tr = yr * fr - yi * fi
    ti = yr * fi + yi * fr
    want = np.asarray(core.sirfft(tr, ti, n))
    ffr = np.concatenate([fr, fr[1:h][::-1]])
    ffi = np.concatenate([fi, -fi[1:h][::-1]])
    got = np.asarray(ps.sfilter_stream_pallas(
        jnp.asarray(x), jnp.asarray(ffr), jnp.asarray(ffi), n))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-6


def test_stream_filter_split_factor_table():
    from cfftpack_tpu.ops.pallas_stream import (_filter_split_factor,
                                                _MAX_M)
    assert _filter_split_factor(65536) == 1
    assert _filter_split_factor(524288) == 1          # m = 4096
    assert _filter_split_factor(1048576) == 2         # m = 8192
    assert _filter_split_factor(2097152) == 4
    assert _filter_split_factor(4194304) is None      # beyond s=4
    assert _filter_split_factor(1000) is None


def test_stream_split_complex_fft(monkeypatch):
    """Natural-order split-stream FFT (sfft_stream_split): s-point
    outer butterfly around inner stream kernels must match numpy for
    forward, inverse, and roundtrip."""
    import cfftpack_tpu.ops.pallas_stream as ps
    monkeypatch.setattr(ps, "_MAX_M", 16)
    n = 4096                                # m=32 -> s=2
    xr, xi = rng_pair((3, n), seed=41)
    yr, yi = ps.sfft_stream_split(jnp.asarray(xr), jnp.asarray(xi), n,
                                  False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(xr + 1j * xi)
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6
    zr, zi = ps.sfft_stream_split(yr, yi, n, True)
    back = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    np.testing.assert_allclose(back, xr + 1j * xi, atol=5e-5)
    # s=4 leg (m=64 > 16, m/2=32 > 16, m/4=16 ok)
    monkeypatch.setattr(ps, "_MAX_M", 16)
    n4 = 8192
    assert ps._filter_split_factor(n4) == 4
    xr4, xi4 = rng_pair((2, n4), seed=43)
    yr4, yi4 = ps.sfft_stream_split(jnp.asarray(xr4), jnp.asarray(xi4),
                                    n4, False)
    got4 = np.asarray(yr4) + 1j * np.asarray(yi4)
    want4 = np.fft.fft(xr4 + 1j * xi4)
    assert np.abs(got4 - want4).max() / np.abs(want4).max() < 5e-6


def test_mm2_kernel_matches_numpy():
    """Round-4 two-matmul mid-range kernel (ops/pallas_stream.py):
    natural + permuted layouts, forward/inverse — interpret mode
    (on-chip A/B in benchmarks/stream_mid_ab.py: measured to LOSE to
    XLA flat at every mid-range size, kept opt-in for v5p/v6 —
    BASELINE.md "Mid-range Pallas attack")."""
    from cfftpack_tpu.ops.pallas_stream import (
        mm2_eligible, sfft_mm2_pallas, sfft_mm2_pallas_permuted)
    assert mm2_eligible(2048, np.float32)
    assert mm2_eligible(32768, np.float32)
    assert not mm2_eligible(128, np.float32)       # m=1
    assert not mm2_eligible(65536, np.float32)     # m > _MM2_MAX_M
    assert not mm2_eligible(2048, np.float64)
    n = 2048
    m = n // 128
    xr, xi = rng_pair((3, n), seed=17)
    yr, yi = sfft_mm2_pallas(jnp.asarray(xr), jnp.asarray(xi), n, False)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = np.fft.fft(xr + 1j * xi)
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6
    # permuted layout: perm[.., k2, k1] == X[k2 + m*k1]
    pr, pi_ = sfft_mm2_pallas_permuted(jnp.asarray(xr), jnp.asarray(xi),
                                       n, False)
    perm = (np.asarray(pr) + 1j * np.asarray(pi_)).reshape(3, m, 128)
    nat = want.reshape(3, 128, m)
    assert (np.abs(perm - nat.transpose(0, 2, 1)).max()
            / np.abs(want).max()) < 5e-6
    # natural inverse roundtrip + permuted zero-transpose roundtrip
    zr, zi = sfft_mm2_pallas(yr, yi, n, True)
    rt = (np.asarray(zr) + 1j * np.asarray(zi)) / n
    np.testing.assert_allclose(rt, xr + 1j * xi, atol=5e-5)
    qr, qi = sfft_mm2_pallas_permuted(pr, pi_, n, True)
    rt2 = (np.asarray(qr) + 1j * np.asarray(qi)) / n
    np.testing.assert_allclose(rt2, xr + 1j * xi, atol=5e-5)


# ---------------------------------------------- column kernel (round 5)

def test_colfft_kernel_matches_numpy():
    """Column-FFT kernel (ops/pallas_colfft.py): length-n0 DFT over
    axis -2 with zero transpose passes — interpret mode (on-chip A/B
    in benchmarks/colfft_ab.py)."""
    from cfftpack_tpu.ops.pallas_colfft import (colfft_eligible,
                                                scolfft_pallas)
    assert colfft_eligible(1024, 1024, np.float32)
    assert colfft_eligible(48, 128, np.float32)     # radix-3 stage
    assert not colfft_eligible(1024, 100, np.float32)   # n1 % 128
    assert not colfft_eligible(24, 128, np.float32)     # no stage plan
    assert not colfft_eligible(1024, 1024, np.float64)
    r = np.random.default_rng(51)
    for n0, n1, b in ((64, 256, 3), (48, 128, 2)):
        x = r.standard_normal((b, n0, n1)).astype(np.float32)
        y = r.standard_normal((b, n0, n1)).astype(np.float32)
        zr, zi = scolfft_pallas(jnp.asarray(x), jnp.asarray(y))
        got = np.asarray(zr) + 1j * np.asarray(zi)
        want = np.fft.fft(x + 1j * y, axis=-2)
        assert np.abs(got - want).max() / np.abs(want).max() < 5e-6
        br, bi = scolfft_pallas(zr, zi, inverse=True)
        back = (np.asarray(br) + 1j * np.asarray(bi)) / n0
        np.testing.assert_allclose(back, x + 1j * y, atol=5e-5)


# ---------------------------------------------- real stream (round 5)

def test_rstream_kernels_match_core():
    """Streaming real transforms (ops/pallas_rstream.py): batch-pair
    r2c/c2r and DCT-II/III over the permuted stream kernel must match
    the shipped core/dct engines — interpret mode (on-chip A/B in
    benchmarks/rstream_ab.py)."""
    import importlib
    from cfftpack_tpu.ops import core
    from cfftpack_tpu.ops import pallas_rstream as rs
    dctmod = importlib.import_module("cfftpack_tpu.ops.dct")
    assert rs.rstream_eligible(2048, np.float32, 4)
    assert not rs.rstream_eligible(2048, np.float32, 3)   # odd batch
    assert not rs.rstream_eligible(2048, np.float64, 4)
    assert not rs.rstream_eligible(1000, np.float32, 4)
    r = np.random.default_rng(61)
    n = 2048
    x = r.standard_normal((4, n)).astype(np.float32)
    yr, yi = rs.srfft_stream_pallas(jnp.asarray(x), n)
    want = np.fft.rfft(x.astype(np.float64))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6
    # packed contract: imag(DC) and imag(Nyquist) are exact zeros
    assert np.asarray(yi)[:, 0].max() == 0.0
    assert np.asarray(yi)[:, -1].max() == 0.0
    back = np.asarray(rs.sirfft_stream_pallas(yr, yi, n)) / n
    assert np.abs(back - x).max() < 5e-5
    d_s = np.asarray(rs.sdct2_stream_pallas(jnp.asarray(x), n))
    d_x = np.asarray(dctmod._dct2_core(jnp.asarray(x), n))
    assert np.abs(d_s - d_x).max() / np.abs(d_x).max() < 5e-6
    t_s = np.asarray(rs.sdct3_stream_pallas(jnp.asarray(x), n))
    t_x = np.asarray(dctmod._dct3_core(jnp.asarray(x), n))
    assert np.abs(t_s - t_x).max() / np.abs(t_x).max() < 5e-6


def test_colfft_lane_widths_and_scale():
    """Wider lane blocks and the in-kernel norm scale must be exact
    (on-chip lane-width A/B: COL_LANES_AB_r05)."""
    from cfftpack_tpu.ops.pallas_colfft import _colfft_pallas_3d
    r = np.random.default_rng(53)
    n0, n1 = 64, 512
    x = r.standard_normal((2, n0, n1)).astype(np.float32)
    y = r.standard_normal((2, n0, n1)).astype(np.float32)
    want = np.fft.fft(x + 1j * y, axis=-2) * 0.25
    for lanes in (128, 256, 512):
        zr, zi = _colfft_pallas_3d(jnp.asarray(x), jnp.asarray(y),
                                   n0, False, 0.25, lanes)
        got = np.asarray(zr) + 1j * np.asarray(zi)
        assert np.abs(got - want).max() / np.abs(want).max() < 5e-6


def test_dct4_stream_tail_matches_core():
    """Permuted-stream DCT-IV tail (dct._dct4_stream_tail): fused
    post-phase + un-permute + riffle must equal the shipped natural
    path (on-chip A/B: DCT4_STREAM_r05)."""
    import importlib
    dctmod = importlib.import_module("cfftpack_tpu.ops.dct")
    r = np.random.default_rng(57)
    n = 4096                      # h = 2048: stream-eligible shape
    h = n // 2
    x = r.standard_normal((4, n)).astype(np.float32)
    want = np.asarray(dctmod._dct4_core(jnp.asarray(x), n))
    p = np.arange(h)
    pre = np.exp(-1j * np.pi * p / n)
    post = np.exp(-1j * np.pi * (2 * p + 0.5) / (2 * n))
    cr = x[:, 0::2]
    ci = x[:, ::-1][:, 0::2]
    prer = pre.real.astype(np.float32)
    prei = pre.imag.astype(np.float32)
    wr = jnp.asarray(cr * prer - ci * prei)
    wi = jnp.asarray(cr * prei + ci * prer)
    got = np.asarray(dctmod._dct4_stream_tail(wr, wi, n, post))
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-6
