"""FFT short-rate lattice (Zywina's mesh model) — callable bonds.

Re-design of test/shortrate.cpp's Mesh without the QuantLib dependency:
own time grid and linearly-interpolated zero curve; the model set
(Black-Karasinski, Hull-White, shifted BK, NIG, Pelsser, alpha-stable)
comes from chfun.py + short-rate conversion functions.

Per time step the lattice does rfft -> pointwise characteristic-
function multiply -> irfft (shortrate.cpp:174-192 fit and 228-239
stepBack).  In the STANDARD packed spectrum this is a multiply by
phi(u) when diffusing state prices forward (the reference's conj(phi)
into its 2*conj packing) and by conj(phi) when rolling values backward.
The spectral convolutions are jitted all-real device code; the Brent
gamma-fit per step is host control flow driving a jitted objective.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.rfft import rfft_split, irfft_split
from ..plan import fft_next_fast_even_size
from ..utils.roots import brent

__all__ = ["ShortRateMesh", "callable_bond_demo",
           "exponential_levy", "linear_levy", "shifted_exponential_levy",
           "square_levy"]


# short-rate conversion functions (shortrate.cpp:313-327)
def exponential_levy(x, gamma):
    return jnp.exp(x + gamma)


def linear_levy(x, gamma):
    return x + gamma


def shifted_exponential_levy(shift):
    def conv(x, gamma):
        return jnp.exp(x + gamma) - shift
    return conv


def square_levy(x, gamma):
    return (x + gamma) ** 2


@partial(jax.jit, static_argnums=(3,))
def _convolve(tmp, phr, phi_, n: int):
    """rfft -> multiply -> irfft with a split-complex factor (fwd dir)."""
    sr, si = rfft_split(tmp)
    tr = sr * phr - si * phi_
    ti = sr * phi_ + si * phr
    return irfft_split(tr, ti, n)


@jax.jit
def _fit_objective(ad, x, dt, gamma, conv_id, shift):
    r = _conv_dispatch(x, gamma, conv_id, shift)
    return jnp.sum(ad * jnp.exp(-dt * r))


def _conv_dispatch(x, gamma, conv_id, shift):
    return jax.lax.switch(conv_id, [
        lambda: jnp.exp(x + gamma),
        lambda: x + gamma,
        lambda: jnp.exp(x + gamma) - shift,
        lambda: (x + gamma) ** 2,
    ])


_CONV_IDS = {"exponential": 0, "linear": 1, "shifted_exponential": 2,
             "square": 3}


class ShortRateMesh:
    """The lattice: N-point Levy state space per time step."""

    def __init__(self, n_fft: int, times, phi, mean_reversion: float = 0.0,
                 conv: str = "linear", shift: float = 0.0):
        self.N = fft_next_fast_even_size(n_fft)
        self.NC = self.N // 2 + 1
        self.times = np.asarray(times, dtype=np.float64)
        self.nstep = len(self.times)
        self.phi = phi
        self.mean_rev = float(mean_reversion)
        if conv not in _CONV_IDS:
            raise ValueError(f"conv must be one of {list(_CONV_IDS)}")
        self.conv_id = _CONV_IDS[conv]
        self.shift = float(shift)
        self.root_guess = 0.0
        self.root_step = 0.5
        self.root_lo = -1e6
        self.root_hi = 1e6

        # grid setup (shortrate.cpp:131-164): mean reversion shrinks the
        # process space with term
        from .chfun import cf_moment_sigma
        sigma = cf_moment_sigma(phi, float(self.times[-1]))
        L = 2 * 10 * sigma * np.exp(self.mean_rev * self.times[-1])
        dxm = L / self.N
        dum = 2 * np.pi / (dxm * self.N)
        n2 = self.N // 2
        self.dt = np.empty(self.nstep)
        self.dt[:-1] = np.diff(self.times)
        self.dt[-1] = self.dt[-2] if self.nstep > 1 else 1.0
        self.x = np.empty((self.nstep, self.N))
        self.u = np.empty((self.nstep, self.NC))
        for i, term in enumerate(self.times):
            dxi = dxm * np.exp(-self.mean_rev * term)
            dui = dum * np.exp(self.mean_rev * term)
            self.x[i] = (np.arange(self.N) - n2) * dxi
            self.u[i] = np.arange(self.NC) * dui
        # per-step filled by fit():
        self.gamma = np.zeros(self.nstep)
        self.fdf = np.ones((self.nstep, self.N))
        self.ad = np.zeros((self.nstep, self.N))
        self.bond = np.ones(self.nstep)
        self.cash_flow = np.zeros(self.nstep)
        self.accrued = np.zeros(self.nstep)
        self.can_exercise = np.zeros(self.nstep, dtype=bool)

    def _phi_split(self, i):
        ph = np.asarray(self.phi(self.u[i], self.dt[i]),
                        dtype=np.complex128)
        return jnp.asarray(ph.real), jnp.asarray(ph.imag)

    def fit(self, discounts):
        """Calibrate gamma per step so Arrow-Debreu prices reprice the
        zero curve (shortrate.cpp:167-216)."""
        self.bond = np.asarray(discounts, dtype=np.float64)
        self.ad[0] = 0.0
        self.ad[0, self.N // 2] = 1.0
        for i in range(self.nstep - 1):
            ad = jnp.asarray(self.ad[i])
            x = jnp.asarray(self.x[i])
            dt = self.dt[i]
            target = self.bond[i + 1]

            def f(g):
                v = _fit_objective(ad, x, dt, g, self.conv_id, self.shift)
                return float(v) - target

            guess = self.gamma[i - 1] if i > 0 else self.root_guess
            self.gamma[i] = brent(f, guess=guess, step=self.root_step,
                                  lo=self.root_lo, hi=self.root_hi)
            r = np.asarray(_conv_dispatch(x, self.gamma[i], self.conv_id,
                                          self.shift))
            self.fdf[i] = np.exp(-dt * r)
            tmp = jnp.asarray(self.ad[i] * self.fdf[i])
            phr, phi_ = self._phi_split(i)
            self.ad[i + 1] = np.asarray(_convolve(tmp, phr, phi_, self.N))

    def price_callable_bond(self, exercise_price: float) -> float:
        """Backward induction with early exercise
        (shortrate.cpp:243-263)."""
        value = jnp.zeros(self.N)
        for i in range(self.nstep - 1, 0, -1):
            price = exercise_price + self.accrued[i]
            if self.can_exercise[i]:
                value = jnp.minimum(value, price)
            value = value + self.cash_flow[i]
            # roll back: conj(phi) in standard packing + fwd discount
            phr, phi_ = self._phi_split(i - 1)
            value = _convolve(value, phr, -phi_, self.N)
            value = value * jnp.asarray(self.fdf[i - 1])
        return float(np.asarray(value)[self.N // 2])


def linear_zero_curve(terms, rates):
    """Linearly-interpolated continuous zero curve -> discount fn."""
    terms = np.asarray(terms, dtype=np.float64)
    rates = np.asarray(rates, dtype=np.float64)

    def discount(t):
        t = np.asarray(t, dtype=np.float64)
        z = np.interp(t, terms, rates)
        return np.exp(-z * t)
    return discount


def callable_bond_demo(model: int = 1, nstep: int = 200, n_fft: int = 1024,
                       notional: float = 10000.0, coupon_pct: float = 3.0,
                       maturity: float = 13.85, pay_freq: int = 2,
                       call_penalty: float = 1.02,
                       mean_reversion: float = 0.01):
    """Self-contained analog of testCallableBond (shortrate.cpp:332-500)
    with simple year-fraction scheduling (no calendar library).

    Returns (straight_bond_pv, pv_check, callable_pv)."""
    from .chfun import normal_cf, nig_cf, alpha_stable_cf

    if model == 0:    # Black-Karasinski
        phi, conv, shift = normal_cf(0.275), "exponential", 0.0
    elif model == 1:  # Hull-White
        phi, conv, shift = normal_cf(0.01), "linear", 0.0
    elif model == 2:  # shifted Black-Karasinski
        phi, conv, shift = normal_cf(0.10), "shifted_exponential", 0.04
    elif model == 3:  # NIG (Hainaut & MacGilchrist)
        phi, conv, shift = nig_cf(100.14, 5.52, 6.361e-5), "linear", 0.0
    elif model == 4:  # Pelsser squared-Gaussian
        phi, conv, shift = normal_cf(0.02), "square", 0.0
    elif model == 5:  # alpha-stable, shifted exponential
        phi, conv, shift = alpha_stable_cf(1.8, 0.0, 0.08), \
            "shifted_exponential", 0.02
    else:
        raise ValueError("model must be 0..5")

    # coupon schedule in year fractions
    cf_times = np.arange(maturity % (1.0 / pay_freq) or 1.0 / pay_freq,
                         maturity + 1e-9, 1.0 / pay_freq)
    req = np.concatenate([[0.0], cf_times])
    # refine to ~nstep points while keeping required times on-grid
    grid = np.unique(np.concatenate(
        [req, np.linspace(0.0, maturity, nstep)]))

    mesh = ShortRateMesh(n_fft, grid, phi, mean_reversion, conv, shift)
    if model == 4:
        mesh.root_guess, mesh.root_step, mesh.root_lo = 0.1, 0.01, 1e-8

    curve = linear_zero_curve([0, 1, 2, 5, 10, 20, 30],
                              [0.018, 0.02, 0.0225, 0.025, 0.03, 0.032,
                               0.034])
    mesh.fit(curve(mesh.times))

    cpn = coupon_pct / 100.0 / pay_freq * notional
    prev_t = 0.0
    for t_cf in cf_times:
        j = int(np.argmin(np.abs(mesh.times - t_cf)))
        mesh.cash_flow[j] += cpn
        mesh.can_exercise[j] = True
        between = (mesh.times > prev_t + 1e-12) & (mesh.times
                                                   < t_cf - 1e-12)
        mesh.accrued[between] = (mesh.times[between] - prev_t) \
            / (t_cf - prev_t) * cpn
        prev_t = t_cf
    mesh.cash_flow[int(np.argmin(np.abs(mesh.times - cf_times[-1])))] \
        += notional
    mesh.can_exercise[:] = True  # american exercise

    straight_pv = float(np.sum(mesh.bond * mesh.cash_flow))
    pv_check = mesh.price_callable_bond(notional * 1e5)
    callable_pv = mesh.price_callable_bond(notional * call_penalty)
    return straight_pv, pv_check, callable_pv
