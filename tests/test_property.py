"""Property sweeps: every length 1..96 plus awkward composites, and
bitwise determinism (BASELINE 'round-trip bit-stable')."""
import numpy as np
import pytest

import cfftpack_tpu as ct

AWKWARD = [97, 121, 127, 128, 169, 210, 255, 256, 343, 510, 512, 625,
           675, 899, 961]


@pytest.mark.parametrize("n", list(range(1, 97)) + AWKWARD)
def test_fft_roundtrip_every_length(n):
    r = np.random.default_rng(n)
    x = r.standard_normal(n) + 1j * r.standard_normal(n)
    back = np.asarray(ct.ifft(ct.fft(x)))
    np.testing.assert_allclose(back, x, atol=1e-11 * max(1, n))


@pytest.mark.parametrize("n", [1, 2, 7, 36, 97, 210])
def test_rfft_roundtrip_every_length(n):
    r = np.random.default_rng(n + 1)
    x = r.standard_normal(n)
    back = np.asarray(ct.irfft(ct.rfft(x), n))
    np.testing.assert_allclose(back, x, atol=1e-11 * max(1, n))


def test_parseval_energy():
    """ortho transforms preserve energy (Parseval) for fft and dct2."""
    r = np.random.default_rng(5)
    x = r.standard_normal(210) + 1j * r.standard_normal(210)
    y = np.asarray(ct.fft(x, norm="ortho"))
    np.testing.assert_allclose(np.sum(np.abs(y) ** 2),
                               np.sum(np.abs(x) ** 2), rtol=1e-12)
    v = r.standard_normal(128)
    c = np.asarray(ct.dct(v, 2, norm="ortho"))
    np.testing.assert_allclose(np.sum(c ** 2), np.sum(v ** 2), rtol=1e-12)


def test_linearity_and_shift_theorem():
    r = np.random.default_rng(7)
    n = 60
    x = r.standard_normal(n) + 1j * r.standard_normal(n)
    y = r.standard_normal(n) + 1j * r.standard_normal(n)
    lhs = np.asarray(ct.fft(2.0 * x + 3.0 * y))
    rhs = 2.0 * np.asarray(ct.fft(x)) + 3.0 * np.asarray(ct.fft(y))
    np.testing.assert_allclose(lhs, rhs, atol=1e-13)
    # circular shift <-> phase ramp
    s = 7
    shifted = np.asarray(ct.fft(np.roll(x, s)))
    ramp = np.exp(-2j * np.pi * s * np.arange(n) / n)
    np.testing.assert_allclose(shifted, np.asarray(ct.fft(x)) * ramp,
                               atol=1e-13)


def test_bitwise_determinism():
    """Identical inputs produce identical bits across calls (required
    for reproducible pipelines; races are designed out)."""
    r = np.random.default_rng(9)
    x = r.standard_normal((4, 960)) + 1j * r.standard_normal((4, 960))
    a = np.asarray(ct.fft(x))
    b = np.asarray(ct.fft(x.copy()))
    assert a.tobytes() == b.tobytes()
    v = r.standard_normal((4, 128))
    c1 = np.asarray(ct.dct(v, 2))
    c2 = np.asarray(ct.dct(v.copy(), 2))
    assert c1.tobytes() == c2.tobytes()


def test_impulse_and_constant_signals():
    n = 30
    # impulse -> flat spectrum (1/n with fftpack norm)
    imp = np.zeros(n)
    imp[0] = 1.0
    np.testing.assert_allclose(np.asarray(ct.fft(imp)),
                               np.full(n, 1.0 / n, dtype=complex),
                               atol=1e-14)
    # constant -> delta at DC
    c = np.ones(n)
    spec = np.asarray(ct.fft(c))
    np.testing.assert_allclose(spec[0], 1.0, atol=1e-14)
    np.testing.assert_allclose(spec[1:], 0.0, atol=1e-13)


def test_fuzz_fft_random_shapes_axes():
    """Randomized (seeded) shape/axis/dtype fuzz vs numpy."""
    r = np.random.default_rng(1234)
    for _ in range(25):
        rank = int(r.integers(1, 4))
        shape = tuple(int(r.integers(1, 13)) for _ in range(rank))
        axis = int(r.integers(-rank, rank))
        x = r.standard_normal(shape) + 1j * r.standard_normal(shape)
        got = np.asarray(ct.fft(x, axis=axis))
        want = np.fft.fft(x, axis=axis) / x.shape[axis]
        np.testing.assert_allclose(got, want, atol=1e-12,
                                   err_msg=f"{shape} axis={axis}")


def test_fuzz_rfft_random_shapes():
    r = np.random.default_rng(4321)
    for _ in range(15):
        rank = int(r.integers(1, 3))
        shape = tuple(int(r.integers(1, 40)) for _ in range(rank))
        x = r.standard_normal(shape)
        got = np.asarray(ct.rfft(x))
        want = np.fft.rfft(x) / shape[-1]
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=str(shape))


def test_huge_prime_bluestein():
    """A large prime length routes through Bluestein with a ~2^18-smooth
    convolution; parity vs numpy at full length."""
    n = 104729  # the 10000th prime
    r = np.random.default_rng(0)
    x = r.standard_normal(n) + 1j * r.standard_normal(n)
    got = np.asarray(ct.fft(x))
    want = np.fft.fft(x) / n
    assert np.abs(got - want).max() < 1e-10


def test_dispatch_gate_boundaries():
    """Pure-shape unit checks of every round-5 dispatch gate (no
    compiles): band edges must sit exactly where the A/B artifacts put
    them (docs/DISPATCH.md)."""
    import numpy as np
    import jax
    from cfftpack_tpu.ops import core
    from cfftpack_tpu.ops.pallas_stream import (_filter_split_factor,
                                                _tile_batch,
                                                stream_pallas_eligible)
    from cfftpack_tpu.ops.pallas_colfft import colfft_eligible

    on_tpu = jax.default_backend() == "tpu"
    # body chunk: 2^24 elems, 128-divisible batch, >= 2048 rows
    assert core._use_bodychunk(1024, 65536)
    assert not core._use_bodychunk(1024, 65536 - 64)     # % 128
    assert not core._use_bodychunk(65536, 256)           # < 2048 rows
    assert not core._use_bodychunk(1024, 8192)           # < 2^24 elems
    # pair band: even n needs n >= 65536 and 2^24 elems (TPU only)
    assert core._use_pair(65537, 4, np.float32)          # odd n anywhere
    assert core._use_pair(65536, 256, np.float32) == on_tpu
    assert not core._use_pair(65536, 32, np.float32)     # 2^21 elems
    assert not core._use_pair(32768, 512, np.float32)    # n < 65536
    # rstream band: [2^22, 2^24) at n >= 65536 (TPU only)
    assert core._use_rstream(65536, 64, np.float32) == on_tpu
    assert not core._use_rstream(65536, 256, np.float32)  # pair's band
    assert not core._use_rstream(65536, 32, np.float32)   # < 2^22
    assert not core._use_rstream(32768, 256, np.float32)  # n < 65536
    # split-stream factors bracket the kernel's VMEM cap
    assert _filter_split_factor(1 << 19) == 1
    assert _filter_split_factor(1 << 20) == 2
    assert _filter_split_factor(1 << 21) == 4
    assert _filter_split_factor(1 << 22) is None
    # tile floor: >= 16 grid steps at small batch; plain budget above
    assert _tile_batch(512, 0, 64) == 4        # 16 steps, was bt8
    assert _tile_batch(512, 0, 256) == 8       # 32 steps: untouched
    assert _tile_batch(1024, 0, 64) == 2       # big-m budget
    assert _tile_batch(512, 2048, 256) == 4    # explicit rows honored
    # stream eligibility brackets
    assert stream_pallas_eligible(2048, np.float32)
    assert not stream_pallas_eligible(1024, np.float32)   # m = 8
    assert not stream_pallas_eligible(1 << 20, np.float32)  # m > cap
    # column kernel brackets
    assert colfft_eligible(1024, 1024, np.float32)
    assert not colfft_eligible(8192, 1024, np.float32)    # > _MAX_M
    assert not colfft_eligible(1024, 192, np.float32)     # n1 % 128
