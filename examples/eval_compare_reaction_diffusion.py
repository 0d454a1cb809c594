"""Compare controllers on 1D reaction-diffusion: backstepping vs PPO.

TPU-native ``examples/reactionDiffusionPDE/reactionDiffusion1DtestAlgorithm.py``.
Published reference numbers (ParabolicPDEExample.ipynb cells 14-16):
backstepping 298.98, PPO 293.19, SAC 233.11 (avg reward).
"""

import argparse
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from pdecontrolgym_tpu.agents.backstepping import parabolic_control, parabolic_kernel
from pdecontrolgym_tpu.agents.ppo import PPOConfig, PPOTrainer
from pdecontrolgym_tpu.envs.reaction_diffusion import (
    ReactionDiffusionConfig,
    ReactionDiffusionEnv,
)
from pdecontrolgym_tpu.eval import compare_controllers
from pdecontrolgym_tpu.rewards.tuned import TunedReward1D

T, DT, DX, X = 1.0, 1e-5, 5e-3, 1.0
NX = int(round(X / DX))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=50)
    ap.add_argument("--ppo-iters", type=int, default=350)  # over-trains beyond ~350
    args = ap.parse_args()

    cfg = ReactionDiffusionConfig(
        T=T, dt=DT, X=X, dx=DX, control_sample_rate=1e-3,
        limit_pde_state_size=True, max_state_value=1e10, max_control_value=20.0,
    )
    reward = TunedReward1D(int(round(T / DT)), -1e3, 3e2)
    env = ReactionDiffusionEnv(cfg, reward)
    env_rl = ReactionDiffusionEnv(dataclasses.replace(cfg, normalize=True), reward)

    spatial = np.linspace(DX, X, NX + 1)
    krow = parabolic_kernel(
        jnp.asarray(50 * np.cos(8 * np.arccos(spatial)), jnp.float32), DX
    )
    controllers = {
        "backstepping": lambda o, k: jax.vmap(
            lambda ob: parabolic_control(krow, ob, DX)
        )(o),
        "zero": lambda o, k: jnp.zeros(o.shape[0]),
    }
    results = compare_controllers(env, controllers, num_episodes=args.episodes,
                                  max_steps=1000)

    if args.ppo_iters > 0:
        trainer = PPOTrainer(
            env_rl,
            PPOConfig(num_envs=256, num_steps=250, gamma=0.9995,
                      num_minibatches=16, ent_coef=1e-3,
                      reward_scale=0.02, obs_clip=50.0),
        )
        runner = trainer.train(jax.random.key(0), args.ppo_iters, log_every=25,
                               callback=lambda it, m: print(
                                   f"  ppo iter {it}: {m['mean_reward']:+.3f}",
                                   flush=True))
        results.update(compare_controllers(
            env_rl, {"ppo": trainer.policy(runner.params)},
            num_episodes=args.episodes, max_steps=1000,
        ))

    print(f"\n{'controller':>14} | {'mean return':>12} | {'std':>8}")
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["mean_return"]):
        print(f"{name:>14} | {r['mean_return']:12.2f} | {r['std_return']:8.2f}")


if __name__ == "__main__":
    main()
