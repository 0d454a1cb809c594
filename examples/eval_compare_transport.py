"""Compare controllers on 1D transport: backstepping vs PPO vs random.

TPU-native ``examples/transportPDE/transport1DtestAlgorithm.py``: N evaluation
episodes run as one vmapped batch per controller. Trains a quick PPO policy
in-process (pass --ppo-iters 0 to skip).
"""

import argparse

import jax
import jax.numpy as jnp

from pdecontrolgym_tpu.agents.backstepping import transport_control, transport_kernel
from pdecontrolgym_tpu.agents.ppo import PPOConfig, PPOTrainer
from pdecontrolgym_tpu.eval import compare_controllers
from pdecontrolgym_tpu.envs.common import Boundary1DConfig
from pdecontrolgym_tpu.envs.transport import TransportEnv
from pdecontrolgym_tpu.rewards.tuned import TunedReward1D


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=50)
    ap.add_argument("--ppo-iters", type=int, default=150)
    ap.add_argument("--sac-iters", type=int, default=0)
    args = ap.parse_args()

    import dataclasses

    # Like the reference testAlgorithm (transport1DtestAlgorithm.py:78-152):
    # backstepping runs on a normalize=False env, RL policies on
    # normalize=True envs ([-1,1] actions mapped onto [-20,20]).
    cfg = Boundary1DConfig(
        T=5.0, dt=1e-4, X=1.0, dx=1e-2, control_sample_rate=0.1,
        limit_pde_state_size=True, max_state_value=1e10,
        max_control_value=20.0,
    )
    nx = cfg.nx
    reward = TunedReward1D(int(round(cfg.T / cfg.dt)), -1e3, 3e2)
    env = TransportEnv(cfg, reward)
    env_rl = TransportEnv(dataclasses.replace(cfg, normalize=True), reward)

    spatial = jnp.linspace(cfg.dx, cfg.X, nx)
    kern = transport_kernel(
        (5 * jnp.cos(7.35 * jnp.arccos(jnp.clip(spatial, -1, 1)))).astype(jnp.float32),
        cfg.dx,
    )
    controllers = {
        "backstepping": lambda o, k: jax.vmap(
            lambda ob: transport_control(kern, ob, cfg.dx)
        )(o),
        "zero": lambda o, k: jnp.zeros(o.shape[0]),
    }

    results = compare_controllers(env, controllers, num_episodes=args.episodes,
                                  max_steps=50)

    if args.ppo_iters > 0:
        trainer = PPOTrainer(env_rl, PPOConfig(num_envs=512, num_steps=50, gamma=0.999,
                                               num_minibatches=8, ent_coef=1e-3,
                                               reward_scale=0.02, obs_clip=50.0))
        runner = trainer.train(jax.random.key(0), args.ppo_iters, log_every=50,
                               callback=lambda it, m: print(
                                   f"  ppo iter {it}: {m['mean_reward']:+.3f}",
                                   flush=True))
        results.update(compare_controllers(
            env_rl, {"ppo": trainer.policy(runner.params)},
            num_episodes=args.episodes, max_steps=50,
        ))

    if args.sac_iters > 0:
        from pdecontrolgym_tpu.agents.sac import SACConfig, SACTrainer

        # off-policy: the update count matters more than env steps
        # (2500 iters x 32 updates ~ 80K updates -> mean return ~230)
        sac = SACTrainer(env_rl, SACConfig(num_envs=64, buffer_size=400_000,
                                           batch_size=512, steps_per_iter=2,
                                           updates_per_iter=32, gamma=0.999,
                                           init_alpha=0.05))
        srunner = sac.init(jax.random.key(1))
        sstep = sac.make_train_step()
        for it in range(args.sac_iters):
            srunner, m = sstep(srunner)
            if it % 100 == 0:
                print(f"  sac iter {it}: {float(m['mean_reward']):+.3f}", flush=True)
        results.update(compare_controllers(
            env_rl, {"sac": sac.policy(srunner.actor_params)},
            num_episodes=args.episodes, max_steps=50,
        ))
    print(f"\n{'controller':>14} | {'mean return':>12} | {'std':>8}")
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["mean_return"]):
        print(f"{name:>14} | {r['mean_return']:12.2f} | {r['std_return']:8.2f}")


if __name__ == "__main__":
    main()
