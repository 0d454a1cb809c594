"""Train PPO on the 1D transport boundary-control problem.

TPU-native replacement for ``examples/transportPDE/transport1Dppo.py``: the
reference trains SB3 PPO against one Python env for 1e6 steps; here 1024 envs
step in lockstep inside the jitted train loop. Checkpoints go through orbax
(``utils/checkpointing``) instead of SB3's CheckpointCallback.
"""

import argparse

import jax

from pdecontrolgym_tpu.agents.ppo import PPOConfig, PPOTrainer
from pdecontrolgym_tpu.envs.common import Boundary1DConfig
from pdecontrolgym_tpu.envs.transport import TransportEnv
from pdecontrolgym_tpu.rewards.tuned import TunedReward1D
from pdecontrolgym_tpu.utils import save


def build_env():
    cfg = Boundary1DConfig(
        T=5.0, dt=1e-4, X=1.0, dx=1e-2, control_sample_rate=0.1,
        limit_pde_state_size=True, max_state_value=1e10,
        max_control_value=20.0, normalize=True,
    )
    return TransportEnv(cfg, TunedReward1D(int(round(cfg.T / cfg.dt)), -1e3, 3e2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=200)
    ap.add_argument("--num-envs", type=int, default=1024)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    env = build_env()
    trainer = PPOTrainer(
        env,
        PPOConfig(num_envs=args.num_envs, num_steps=16, num_epochs=4,
                  num_minibatches=8, ent_coef=1e-3),
    )

    def log(it, m):
        print(f"iter {it:5d}  mean_reward {m['mean_reward']:+.4f}  "
              f"loss {m['loss']:.4f}", flush=True)

    runner = trainer.train(jax.random.key(0), args.iterations, log_every=10,
                           callback=log)
    if args.checkpoint:
        save(args.checkpoint, runner)
        print(f"saved checkpoint to {args.checkpoint}")


if __name__ == "__main__":
    main()
