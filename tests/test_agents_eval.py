"""SAC trainer, eval harness, checkpointing."""

import numpy as np

import jax
import jax.numpy as jnp

from pdecontrolgym_tpu.agents.sac import SACConfig, SACTrainer
from pdecontrolgym_tpu.envs.common import Boundary1DConfig
from pdecontrolgym_tpu.envs.transport import TransportEnv
from pdecontrolgym_tpu.eval import compare_controllers, episode_returns
from pdecontrolgym_tpu.rewards.tuned import TunedReward1D


def _env():
    cfg = Boundary1DConfig(
        T=0.5, dt=1e-3, X=1.0, dx=1e-2, control_sample_rate=0.05,
        limit_pde_state_size=True, max_state_value=1e6,
    )
    return TransportEnv(cfg, TunedReward1D(int(round(cfg.T / cfg.dt)), -1e3, 3e2, lookback=50))


def test_sac_trains_and_is_finite():
    env = _env()
    cfg = SACConfig(num_envs=8, buffer_size=2048, batch_size=64,
                    steps_per_iter=4, updates_per_iter=2, hidden=(32, 32))
    trainer = SACTrainer(env, cfg)
    runner = trainer.init(jax.random.key(0))
    step = trainer.make_train_step()
    for _ in range(4):
        runner, metrics = step(runner)
    assert np.isfinite(float(metrics["mean_reward"]))
    assert np.isfinite(float(metrics["critic_loss"]))
    assert int(runner.buffer.size) == 4 * 4 * 8
    # deterministic policy produces bounded actions
    act = trainer.policy(runner.actor_params)(runner.obs)
    assert np.abs(np.asarray(act)).max() <= 1.0


def test_eval_harness_episode_returns():
    env = _env()
    from pdecontrolgym_tpu.agents.backstepping import transport_control, transport_kernel

    nx = 100
    sp = jnp.linspace(env.config.dx, 1.0, nx)
    kern = transport_kernel(
        (5 * jnp.cos(7.35 * jnp.arccos(jnp.clip(sp, -1, 1)))).astype(jnp.float32),
        env.config.dx,
    )
    controllers = {
        "backstepping": lambda o, k: jax.vmap(
            lambda ob: transport_control(kern, ob, env.config.dx)
        )(o),
        "zero": lambda o, k: jnp.zeros(o.shape[0]),
    }
    res = compare_controllers(env, controllers, num_episodes=16, max_steps=12)
    assert set(res) == {"backstepping", "zero"}
    assert np.isfinite(res["backstepping"]["mean_return"])
    assert np.isfinite(res["zero"]["mean_return"])
    assert res["backstepping"]["mean_length"] == 10.0  # 0.5s / 0.05s intervals


def test_checkpoint_roundtrip(tmp_path):
    from pdecontrolgym_tpu.agents.ppo import PPOConfig, PPOTrainer
    from pdecontrolgym_tpu.utils import restore, save

    env = _env()
    trainer = PPOTrainer(env, PPOConfig(num_envs=8, num_steps=4, hidden=(16, 16),
                                        num_minibatches=2, num_epochs=1))
    runner = trainer.init(jax.random.key(0))
    step = trainer.make_train_step()
    runner, _ = step(runner)
    path = str(tmp_path / "ckpt")
    save(path, runner)
    template = trainer.init(jax.random.key(1))
    template, _ = step(template)  # match opt_state structure
    restored = restore(path, template)
    a = jax.tree_util.tree_leaves(runner.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_metrics_logger(tmp_path):
    import json
    from pdecontrolgym_tpu.utils import MetricsLogger

    logger = MetricsLogger(str(tmp_path), tensorboard=False)
    logger.log(0, {"mean_reward": jnp.float32(1.5)})
    logger.log(10, {"mean_reward": 2.0, "loss": 0.3})
    logger.close()
    rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert rows[0]["mean_reward"] == 1.5 and rows[1]["step"] == 10


def test_sac_sharded_eight_devices():
    from pdecontrolgym_tpu.parallel.mesh import env_mesh

    assert jax.device_count() >= 8
    env = _env()
    mesh = env_mesh(jax.devices()[:8])
    cfg = SACConfig(num_envs=32, buffer_size=1024, batch_size=32,
                    steps_per_iter=2, updates_per_iter=2, hidden=(16, 16))
    trainer = SACTrainer(env, cfg, mesh=mesh)
    runner = trainer.init(jax.random.key(0))
    step = trainer.make_train_step()
    for _ in range(2):
        runner, m = step(runner)
    assert np.isfinite(float(m["mean_reward"]))
    # params replicated; buffer stays sharded over the env axis
    p = jax.tree_util.tree_leaves(runner.actor_params)[0]
    assert p.sharding.is_fully_replicated
    assert not runner.buffer.obs.sharding.is_fully_replicated
    assert int(runner.buffer.size) == 2 * 2 * (32 // 8)  # per-shard count
