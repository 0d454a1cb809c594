"""Test session config: force an 8-device virtual CPU mesh before JAX init.

All tests run on CPU (fast, deterministic); multi-chip sharding is validated on
the virtual device mesh. x64 is enabled so float64 parity oracles (traffic ARZ,
Navier-Stokes) are exact — the package itself uses explicit dtypes throughout.
"""

import os

# Force CPU: the ambient sitecustomize registers the axon TPU tunnel and calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# overrides the env var — so the config must be re-updated after importing jax
# (backends are not initialized yet at conftest time). The tunnel is slow for
# test-sized work and does not support the float64 parity oracles.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
