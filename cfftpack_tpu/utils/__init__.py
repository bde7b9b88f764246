"""Numerics utilities for the spectral finance apps (reference:
test/util.{h,c} — xorshift PRNG, Acklam inverse normal CDF, Halton
sequence, Black-Scholes closed form — re-designed vectorized/jittable).
"""
from .qmc import (normal_cdf, normal_icdf, halton, halton_batch,  # noqa: F401
                  primes, black_scholes_option)
from .roots import brent  # noqa: F401
from .cache import enable_compilation_cache, warm_plans  # noqa: F401
from .debug import enable_nan_checks, check_finite  # noqa: F401
from .profiling import trace, Timer  # noqa: F401
from .aot import precompile  # noqa: F401
