"""The committed policy checkpoints (examples/checkpoints/*.msgpack) restore
and still control their envs.

These are the artifacts the walkthrough notebooks load (examples/
make_notebooks.py) and the quality tables cite (docs/STATUS.md). Each test
restores the msgpack into a freshly-initialized param template and evaluates a
few episodes on CPU, asserting a loose-but-meaningful return floor (well above
the zero/untrained policy, well below the TPU 50-episode table numbers, so
episode-count noise cannot flake it).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

CKPT = os.path.join(os.path.dirname(__file__), "..", "examples", "checkpoints")


def _load(name, template):
    from pdecontrolgym_tpu.utils import load_params

    path = os.path.join(CKPT, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not committed yet")
    return load_params(path, template)


def _rd_env(normalize=True):
    import dataclasses

    from pdecontrolgym_tpu.envs.reaction_diffusion import (
        ReactionDiffusionConfig,
        ReactionDiffusionEnv,
    )
    from pdecontrolgym_tpu.rewards.tuned import TunedReward1D

    cfg = ReactionDiffusionConfig(
        T=1.0, dt=1e-5, X=1.0, dx=5e-3, control_sample_rate=1e-3,
        normalize=normalize, limit_pde_state_size=True, max_state_value=1e10,
        max_control_value=20.0,
    )
    return ReactionDiffusionEnv(cfg, TunedReward1D(100000, -1e3, 3e2))


def test_rd_ppo_checkpoint_controls():
    from pdecontrolgym_tpu.agents.ppo import PPOConfig, PPOTrainer
    from pdecontrolgym_tpu.eval import compare_controllers

    env = _rd_env()
    trainer = PPOTrainer(env, PPOConfig())
    template = trainer.net.init(jax.random.key(0), jnp.zeros((1, env.obs_dim)))
    params = _load("rd_ppo.msgpack", template)
    r = compare_controllers(env, {"ppo": trainer.policy(params)},
                            num_episodes=4, max_steps=1000)
    # TPU 50-episode mean: 291.79; zero policy: -62.9
    assert r["ppo"]["mean_return"] > 250.0


def test_rd_sac_checkpoint_controls():
    from pdecontrolgym_tpu.agents.sac import SACConfig, SACTrainer
    from pdecontrolgym_tpu.eval import compare_controllers

    env = _rd_env()
    trainer = SACTrainer(env, SACConfig())
    template = trainer.actor.init(jax.random.key(0), jnp.zeros((1, env.obs_dim)))
    params = _load("rd_sac.msgpack", template)
    r = compare_controllers(env, {"sac": trainer.policy(params)},
                            num_episodes=4, max_steps=1000)
    # TPU 50-episode mean: 276.00
    assert r["sac"]["mean_return"] > 230.0


def _transport_env(normalize=True):
    import dataclasses

    from pdecontrolgym_tpu.envs.common import Boundary1DConfig
    from pdecontrolgym_tpu.envs.transport import TransportEnv
    from pdecontrolgym_tpu.rewards.tuned import TunedReward1D

    cfg = Boundary1DConfig(
        T=5.0, dt=1e-4, X=1.0, dx=1e-2, control_sample_rate=0.1,
        normalize=normalize, limit_pde_state_size=True, max_state_value=1e10,
        max_control_value=20.0,
    )
    return TransportEnv(cfg, TunedReward1D(int(round(cfg.T / cfg.dt)),
                                           -1e3, 3e2))


def test_transport_ppo_checkpoint_beats_backstepping_floor():
    from pdecontrolgym_tpu.agents.ppo import PPOConfig, PPOTrainer
    from pdecontrolgym_tpu.eval import compare_controllers

    env = _transport_env()
    trainer = PPOTrainer(env, PPOConfig())
    template = trainer.net.init(jax.random.key(0), jnp.zeros((1, env.obs_dim)))
    params = _load("transport_ppo.msgpack", template)
    r = compare_controllers(env, {"ppo": trainer.policy(params)},
                            num_episodes=4, max_steps=50)
    # TPU 50-episode mean: 249.89 (backstepping: 243.40; the pre-recipe
    # plateau without the terminal bonus: ~15)
    assert r["ppo"]["mean_return"] > 200.0


def test_traffic_ppo_checkpoint_beats_uncontrolled():
    from pdecontrolgym_tpu.agents.ppo import PPOConfig, PPOTrainer
    from pdecontrolgym_tpu.envs import TanhBoxActionEnv, TransformObsEnv
    from pdecontrolgym_tpu.envs.traffic_arz import TrafficARZConfig, TrafficARZEnv
    from pdecontrolgym_tpu.rewards import TrafficARZReward

    cfg = TrafficARZConfig(simulation_type="outlet")
    env = TrafficARZEnv(cfg, TrafficARZReward())
    M, rs, vs = cfg.M, cfg.ro_steady, cfg.v_steady
    env_pol = TransformObsEnv(
        TanhBoxActionEnv(env),
        lambda obs: jnp.concatenate([(obs[:M] - rs) / rs, (obs[M:] - vs) / vs]),
    )
    trainer = PPOTrainer(TanhBoxActionEnv(env), PPOConfig())
    template = trainer.net.init(jax.random.key(0), jnp.zeros((1, 2 * M)))
    params = _load("traffic_ppo.msgpack", template)
    pol = trainer.policy(params)

    @jax.jit
    def total_reward():
        state, obs = env_pol.init(None)

        def body(carry, _):
            state, obs = carry
            state, out = env_pol.step(state, pol(obs[None])[0])
            return (state, out.obs), out.reward

        (_, _), rewards = jax.lax.scan(body, (state, obs), None, length=960)
        return rewards.sum()

    total = float(total_reward())
    # TPU run: -204.57 (backstepping: -263.17); an untrained/zero outlet
    # policy diverges far below -1000
    assert total > -350.0
