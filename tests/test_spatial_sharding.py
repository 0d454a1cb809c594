"""Halo-exchange spatially-sharded transport vs the single-device env."""

import numpy as np

import jax
import jax.numpy as jnp

from pdecontrolgym_tpu.envs.common import Boundary1DConfig
from pdecontrolgym_tpu.envs.transport import TransportEnv
from pdecontrolgym_tpu.parallel.spatial import make_spatial_transport_interval, spatial_mesh
from pdecontrolgym_tpu.rewards.tuned import TunedReward1D


def test_spatially_sharded_interval_matches_single_device():
    assert jax.device_count() >= 8
    mesh = spatial_mesh(jax.devices()[:8])
    nx, dt, dx, S = 256, 1e-4, 1.0 / 256, 100

    cfg = Boundary1DConfig(T=1.0, dt=dt, X=1.0, dx=dx, control_sample_rate=S * dt)
    env = TransportEnv(cfg, TunedReward1D(10000, lookback=50))

    rng = np.random.default_rng(0)
    u0 = rng.uniform(0.5, 2.0, nx).astype(np.float32)
    beta = rng.uniform(-1.0, 1.0, nx).astype(np.float32)
    control = np.float32(0.37)

    # single-device reference
    state, _ = env.init_from(u0, beta)
    state, _ = jax.jit(env.step)(state, jnp.float32(control))
    expected = np.asarray(state.u)

    # spatially sharded (8 slabs of 32 points, ppermute halos)
    fn = make_spatial_transport_interval(mesh, dt, dx, S)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("x"))
    u_sharded = jax.device_put(jnp.asarray(u0), sh)
    beta_sharded = jax.device_put(jnp.asarray(beta), sh)
    result = np.asarray(fn(u_sharded, beta_sharded, jnp.float32(control)))

    np.testing.assert_allclose(result, expected, rtol=1e-6, atol=1e-6)
