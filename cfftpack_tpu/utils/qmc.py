"""Quasi-Monte-Carlo utilities: inverse normal CDF, Halton, BS formula.

Vectorized TPU-friendly re-designs of the reference's scalar helpers
(test/util.c): Acklam's inverse-normal approximation with one Halley
refinement (util.c:55-105), the Halton sequence over the first 512
primes (util.c:108-168), and the Black-Scholes closed form
(util.c:171-180).  The reference's xorshift PRNG is replaced by
jax.random (counter-based, reproducible, splittable) — the idiomatic
accelerator RNG.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["normal_cdf", "normal_icdf", "halton", "primes",
           "black_scholes_option"]


def normal_cdf(x):
    x = jnp.asarray(x)
    return 0.5 * (1.0 + jax_erf(x / np.sqrt(2.0)))


def jax_erf(x):
    import jax
    return jax.scipy.special.erf(x)


# Acklam's rational approximations (coefficients are published constants)
_A = (-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
_B = (-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01,
      -1.328068155288572e+01)
_C = (-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
_D = (7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)


def _poly(coefs, t):
    acc = coefs[0]
    for c in coefs[1:]:
        acc = acc * t + c
    return acc


def normal_icdf(p):
    """Inverse standard normal CDF: Acklam + one Halley step.

    Vectorized (branch-free via where) version of util.c:55-105;
    |abs error| < ~1e-15 after refinement.
    """
    p = jnp.asarray(p)
    q = jnp.minimum(p, 1.0 - p)
    qc = jnp.clip(q, 1e-300, 0.5)
    # central region
    u_ = qc - 0.5
    t_ = u_ * u_
    central = u_ * _poly(_A, t_) / (_poly(_B, t_) * t_ + 1.0)
    # tail region
    t2 = jnp.sqrt(-2.0 * jnp.log(qc))
    tail = _poly(_C, t2) / (_poly(_D, t2) * t2 + 1.0)
    u = jnp.where(qc > 0.02425, central, tail)
    # one Halley refinement to machine precision
    err = normal_cdf(u) - qc
    f_over_df = err * float(np.sqrt(2.0 * np.pi)) * jnp.exp(u * u / 2.0)
    u = u - f_over_df / (1.0 + u * f_over_df / 2.0)
    u = jnp.where(p > 0.5, -u, u)
    u = jnp.where(p <= 0.0, -jnp.inf, u)
    u = jnp.where(p >= 1.0, jnp.inf, u)
    return u


def primes(k: int) -> np.ndarray:
    """First k primes (sieve; the reference hardcodes 512,
    util.c:110-137)."""
    if k <= 0:
        return np.empty(0, dtype=np.int64)
    # upper bound via p_k < k (ln k + ln ln k) for k >= 6
    n = 15 if k < 6 else int(k * (np.log(k) + np.log(np.log(k))) + 3)
    sieve = np.ones(n + 1, dtype=bool)
    sieve[:2] = False
    for p in range(2, int(n ** 0.5) + 1):
        if sieve[p]:
            sieve[p * p:: p] = False
    return np.flatnonzero(sieve)[:k].astype(np.int64)


def halton(index, dimensions: int) -> np.ndarray:
    """Halton points for the given index/indices (radical inverse per
    prime base).  ``index`` scalar -> (dimensions,); array (B,) ->
    (B, dimensions).  Host-side numpy (sequence generation is setup
    work, the transform of the points is the device part) — matches
    util.c:147-168 semantics with any dimension count."""
    idx = np.atleast_1d(np.asarray(index, dtype=np.int64))
    ps = primes(dimensions)
    out = np.zeros((idx.size, dimensions))
    for d in range(dimensions):
        b = int(ps[d])
        k = idx.copy()
        f = 1.0
        h = np.zeros(idx.size)
        while np.any(k > 0):
            f /= b
            h += (k % b) * f
            k //= b
        out[:, d] = h
    if np.isscalar(index) or np.ndim(index) == 0:
        return out[0]
    return out


def black_scholes_option(S, K, sigma, t, r, is_call=True):
    """Black-Scholes closed form (util.c:171-180), vectorized."""
    S = jnp.asarray(S, dtype=jnp.float64)
    K = jnp.asarray(K, dtype=jnp.float64)
    t = jnp.asarray(t, dtype=jnp.float64)   # vectorized over t and r too
    r = jnp.asarray(r, dtype=jnp.float64)
    sqt = jnp.sqrt(t)
    df = jnp.exp(-r * t)
    d1 = (jnp.log(S / K) + t * (r + sigma * sigma * 0.5)) / (sigma * sqt)
    d2 = d1 - sigma * sqt
    C = S * normal_cdf(d1) - K * normal_cdf(d2) * df
    if is_call:
        return C
    return C - S + K * df
