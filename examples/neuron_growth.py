"""Neuron (axon) growth under the embedded backstepping controller.

TPU-native counterpart of the reference's neuron tutorial
(``docs/source/tutorials/neuron1d_tutorial.rst``): the tubulin concentration
error and axon length evolve under the env's built-in backstepping law
(``step()`` takes no action). The whole horizon runs as one jitted scan.
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200_000)
    args = ap.parse_args()
    cfg = NeuronConfig()  # T=180, dt=5e-6, X=12um, dx=0.01 (tutorial values)
    env = NeuronEnv(cfg)
    state, _ = env.init(None)
    l0 = float(state.Z[1] + cfg.LSubS)

    steps = args.steps

    @jax.jit
    def run(state):
        def body(s, _):
            s, out = env.step(s)
            return s, (s.Z[1] + cfg.LSubS, s.L)

        return jax.lax.scan(body, state, None, length=steps)

    state, (lengths, Ls) = run(state)
    lengths = np.asarray(lengths)
    print(f"axon length: {l0 * 1e6:.3f} um -> {lengths[-1] * 1e6:.3f} um "
          f"(target LSubS = {cfg.LSubS * 1e6:.1f} um)")
    print(f"boundary grid index L: {int(Ls[0])} -> {int(Ls[-1])} of {env.M - 1}")
    print(f"tubulin error |u|_max: {float(jnp.abs(state.u).max()):.3e}")
    assert np.isfinite(lengths).all()


if __name__ == "__main__":
    main()
