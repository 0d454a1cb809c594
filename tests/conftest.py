"""Test session config: force an 8-device virtual CPU mesh before JAX init.

All tests run on CPU (fast, deterministic); multi-chip sharding is validated on
the virtual device mesh. x64 is enabled so float64 parity oracles (traffic ARZ,
Navier-Stokes) are exact — the package itself uses explicit dtypes throughout.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
