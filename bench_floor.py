"""Trivial-body floor analysis for the XLA-path env families.

``docs/PERFORMANCE.md`` records transport's trivial-body floor (the same
interval kernel with a 1-mul body): the physics runs at 63% of it, proving
the family is compute-bound, not machinery-bound. This harness measures the
same ratio for the three XLA-path families — traffic ARZ, neuron, brain
tumor — by running the IDENTICAL rollout harness (same policies, lockstep
autoreset, rewards, obs, termination/truncation logic) with the PDE body
replaced by one multiply:

- traffic: ``_substep`` → ``(0.9995·ρ, 0.9995·y)`` (the Richtmyer two-step
  midpoint scheme is the body; boundary writes, velocity reconstruction,
  reward and early-stop logic all stay);
- neuron: the in-``step`` moving-boundary DPR solve + embedded backstepping
  law → one multiply on (u, Z); observation masking, termination and the
  time-accumulator quirk stay;
- brain tumor: ``_fd_update`` + ``_radiation_field`` → one multiply / zeros;
  the simulated-MRI radius reductions and the 3-stage machine STAY — they
  are episode machinery every step must run, not the PDE body.

One JSON line per family:
    {"env": ..., "real": R, "floor": F, "ratio": R/F, ...}

A ratio near 1 means the family is machinery-bound (the PDE body is ~free —
optimizing it further is pointless); a low ratio means the body dominates
and a fused kernel could pay.

Measured (one v5e chip, 4096 envs — BENCH_SNAPSHOT_r04.md / PERFORMANCE.md):
- traffic  real 263M / floor 129M (ratio 2.04!): the trivial-body program is
  SLOWER than the real one. At a 51-point grid the per-step cost is XLA
  kernel scheduling + machinery (reward norms, velocity recon, obs concat,
  autoreset selects); the Richtmyer body fuses into kernels the machinery
  launches anyway, so its marginal cost is ~zero — and removing it reshapes
  fusion for the worse. Conclusion: machinery/launch-bound; only a fused
  multi-step episode kernel (everything in VMEM) moves this family.
- neuron   real 165M / floor 420M (ratio 0.39): the moving-boundary DPR body
  + embedded control law is ~60% of step cost — compute-bound; a fused body
  could buy up to 2.5x.
- brain_tumor real 98M / floor 168M (ratio 0.58): PDE+BED ~40%; the MRI
  radius reductions + stage machine + reward are the rest. A fused PDE body
  alone caps out at ~1.7x.
"""

import argparse
import json

import jax
import jax.numpy as jnp

from bench_families import _measure
from pdecontrolgym_tpu.core.base import StepOut


def _traffic(num_envs, repeats, steps):
    from pdecontrolgym_tpu.envs.traffic_arz import TrafficARZConfig, TrafficARZEnv
    from pdecontrolgym_tpu.rewards.traffic import TrafficARZReward

    class FloorEnv(TrafficARZEnv):
        def _substep(self, r, y, q_inlet, q_outlet):
            c = self.config
            return r * c.dtype(0.9995), y * c.dtype(0.9995)

    cfg = TrafficARZConfig(simulation_type="outlet")
    pair = []
    for cls in (TrafficARZEnv, FloorEnv):
        env = cls(cfg, TrafficARZReward())
        mid = jnp.asarray(0.5 * (env.action_low + env.action_high))
        policy = lambda obs, _key, mid=mid: jnp.full(obs.shape[:-1], mid)
        pair.append(_measure(env, policy, num_envs, steps or 960, repeats)[0])
    return pair


def _neuron(num_envs, repeats, steps):
    from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv

    class FloorEnv(NeuronEnv):
        def step(self, state, action=None, key=None):
            c = self.config
            t = state.time_index + c.dtype(c.dt)
            u_new = state.u * c.dtype(0.9995)
            Z_new = state.Z * c.dtype(1.0001)
            terminated = t >= c.nt
            truncated = jnp.logical_and(
                bool(c.limit_pde_state_size),
                jnp.linalg.norm(u_new) >= c.max_state_value,
            )
            new_state = state.replace(
                u=u_new, Z=Z_new,
                time_index=jnp.where(terminated, 0.0, t).astype(c.dtype),
            )
            return new_state, StepOut(
                obs=self._observe(u_new, state.L, key),
                reward=jnp.zeros((), c.dtype),
                terminated=terminated, truncated=truncated, info={},
            )

    cfg = NeuronConfig(dtype=jnp.float32)
    policy = lambda obs, _key: jnp.zeros(obs.shape[:-1])
    return [
        _measure(cls(cfg), policy, num_envs, steps or 1000, repeats)[0]
        for cls in (NeuronEnv, FloorEnv)
    ]


def _brain_tumor(num_envs, repeats, steps):
    from pdecontrolgym_tpu.envs.brain_tumor import BrainTumorConfig, BrainTumorEnv
    from pdecontrolgym_tpu.rewards.brain_tumor import BrainTumorReward

    class FloorEnv(BrainTumorEnv):
        def _fd_update(self, u, R):
            return u * self.config.dtype(0.9995)

        def _radiation_field(self, u_prev, applied_dosage):
            return jnp.zeros_like(u_prev), jnp.zeros((), self.config.dtype)

    cfg = BrainTumorConfig()
    policy = lambda obs, _key: jnp.full(obs.shape[:-1], 0.5)
    return [
        _measure(cls(cfg, BrainTumorReward()), policy, num_envs,
                 steps or 365, repeats)[0]
        for cls in (BrainTumorEnv, FloorEnv)
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--families", default="traffic,neuron,brain_tumor")
    args = ap.parse_args()

    fns = {"traffic": _traffic, "neuron": _neuron, "brain_tumor": _brain_tumor}
    for name in filter(None, args.families.split(",")):
        real, floor = fns[name](args.envs, args.repeats, args.steps)
        print(json.dumps({
            "env": name, "envs": args.envs,
            "real": round(real), "floor": round(floor),
            "ratio": round(real / floor, 3), "unit": "env-steps/s",
        }), flush=True)


if __name__ == "__main__":
    main()
