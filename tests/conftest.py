"""Test harness config: CPU backend with a virtual 8-device mesh + x64.

Must run before jax is imported anywhere (pytest imports conftest first).
Mirrors the multi-chip test strategy in SURVEY.md §4: sharded paths are
validated on a host-platform device mesh, numerics in float64 against
naive O(n^2) oracles (reference tolerances: 1e-13 f64 / 1e-4 f32,
/root/reference/test/testall.c:44-49).
"""
import os

# 4 virtual devices: matches this host's core count so sharded-program
# compiles (the suite's dominant cost — tracing/lowering is not served
# by the persistent cache) stay ~2x cheaper than an 8-way partition.
# The 8-device shape is still exercised every round by the driver's
# dryrun_multichip(8) artifact.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force CPU via jax.config as well: the ambient axon sitecustomize
# registers the real-TPU tunnel backend at interpreter boot and sets
# jax_platforms="axon,cpu", which would shadow the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound, and xdist
# workers + repeat runs re-compile identical programs otherwise.
# Namespaced by user + jax version so a shared /tmp can't serve stale
# or unwritable entries across users/upgrades.
import getpass  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/cfftpack_tpu_test_xla_cache_{getpass.getuser()}_{jax.__version__}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
