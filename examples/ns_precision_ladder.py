"""The NS fused kernel's spectral_precision ladder: throughput vs drift.

The fused projection kernel (ops/ns_fused) runs its four spectral matmuls
at full-f32 MXU precision by default ("highest" — bit-comparable to the
XLA path). Two opt-in modes trade documented accuracy for throughput:
"high" (manual bf16_3x hi/lo split) and "default" (single bf16 pass +
bf16 layout shuffles). This example rolls the SAME episode under each mode
and prints the measured step rate and the relative field drift vs
"highest" — the numbers behind docs/PERFORMANCE.md item 15's ladder.

Run on TPU: PYTHONPATH=. python examples/ns_precision_ladder.py
(CPU falls back to interpret-mode kernels: drift numbers are exact,
rates are meaningless.)
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from pdecontrolgym_tpu.envs.navier_stokes import (
    NavierStokesConfig,
    NavierStokesEnv,
    freeze_boundary_condition,
)
from pdecontrolgym_tpu.rewards.ns import NSReward

BC = freeze_boundary_condition({
    "upper": ["Controllable", "Dirchilet"],
    "lower": ["Dirchilet", "Dirchilet"],
    "left": ["Dirchilet", "Dirchilet"],
    "right": ["Dirchilet", "Dirchilet"],
})


def build(precision: str, n: int, steps: int):
    d = 1.0 / (n - 1)
    cfg = NavierStokesConfig(
        T=(steps + 1) * 2e-4, dt=2e-4, X=1.0, dx=d, Y=1.0, dy=d,
        viscosity=0.05, dtype=jnp.float32, boundary_condition=BC,
        pressure_solver="direct",
        step_backend="auto" if jax.default_backend() != "cpu" else "fused",
        spectral_precision=precision,
    )
    nt = cfg.nt
    env = NavierStokesEnv(
        cfg, NSReward(0.1),
        jnp.zeros((nt, cfg.ny, cfg.nx, 2), cfg.dtype),
        2.0 * jnp.ones(nt, cfg.dtype),
    )
    return env


def episode(env, batch, steps, key):
    state, _ = jax.vmap(env.init)(jax.random.split(key, batch))
    acts = jnp.full((batch, 1), 2.0, jnp.float32)

    def body(s, _):
        s, out = env.step_batch(s, acts)
        return s, out.reward.sum()

    state, rs = jax.lax.scan(body, state, None, length=steps)
    return env._unpack(state.u), env._unpack(state.v), rs.sum()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=256)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()
    key = jax.random.key(0)

    results = {}
    for mode in ("highest", "high", "default"):
        env = build(mode, args.n, args.steps)
        run = jax.jit(lambda k: episode(env, args.envs, args.steps, k))
        u, v, _ = run(key)  # compile + warm
        float(np.asarray(u[0, 0, 0]))
        t0 = time.perf_counter()
        u, v, _ = run(key)
        float(np.asarray(u[0, 0, 0]))
        dt_s = time.perf_counter() - t0
        results[mode] = (np.asarray(u), np.asarray(v),
                         args.envs * args.steps / dt_s)

    u_ref = results["highest"][0]
    scale = np.abs(u_ref).max() + 1e-12
    print(f"{args.envs} envs x {args.n}x{args.n}, {args.steps} steps:")
    for mode, (u, v, rate) in results.items():
        drift = np.abs(u - u_ref).max() / scale
        print(f"  spectral_precision={mode:8s}  {rate/1e6:6.2f}M env-steps/s"
              f"  max relative drift vs highest: {drift:.2e}")


if __name__ == "__main__":
    main()
