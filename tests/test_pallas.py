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
