"""Generate a Navier-Stokes tracking target compatible with the reference's
``examples/NavierStokes/target.npz`` (keys ``u``, ``v``, each (nt, nx, ny)).

The reference ships a precomputed lid-driven trajectory; this regenerates an
equivalent one with the engine itself (lid velocity 2.0), so reference scripts
that do ``np.load('target.npz')`` run against our data unmodified.
"""

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from pdecontrolgym_tpu.envs.navier_stokes import (
    NavierStokesConfig,
    NavierStokesEnv,
    freeze_boundary_condition,
)
from pdecontrolgym_tpu.rewards.ns import NSReward


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="target.npz")
    ap.add_argument("--lid", type=float, default=2.0)
    args = ap.parse_args()

    T, dt, n = 0.2, 1e-3, 21
    bc = freeze_boundary_condition({
        "upper": ["Controllable", "Dirchilet"],
        "lower": ["Dirchilet", "Dirchilet"],
        "left": ["Dirchilet", "Dirchilet"],
        "right": ["Dirchilet", "Dirchilet"],
    })
    cfg = NavierStokesConfig(T=T, dt=dt, X=1.0, dx=0.05, Y=1.0, dy=0.05,
                             boundary_condition=bc, dtype=jnp.float64)
    nt = cfg.nt
    env = NavierStokesEnv(cfg, NSReward(0.1),
                          np.zeros((nt, n, n, 2)), np.zeros(nt))
    zeros = jnp.zeros((n, n), jnp.float64)
    state, obs0 = env.init_from(zeros, zeros, zeros)

    def body(state, _):
        state, out = env.step(state, jnp.asarray([args.lid]))
        return state, out.obs

    _, frames = jax.lax.scan(body, state, None, length=nt - 1)
    U = np.concatenate([np.asarray(obs0)[None], np.asarray(frames)])
    np.savez(args.out, u=U[..., 0], v=U[..., 1])
    print(f"wrote {args.out}: u/v shape {U[..., 0].shape}, "
          f"final max|u| = {np.abs(U[-1, ..., 0]).max():.3f}")


if __name__ == "__main__":
    main()
