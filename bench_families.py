"""Throughput for the remaining env families: traffic ARZ, neuron, brain tumor.

``bench.py`` covers the BASELINE configs (transport + Burgers); this harness
measures the other three families so every environment has a perf row
(docs/PERFORMANCE.md). Each rollout is one jitted program (policy + step,
vmapped over the env batch, in-kernel autoreset); timing is min-of-``repeats``
with a device-scalar host readback (tunnel-safe, see utils/profiling).

One JSON line per family:
    {"env": ..., "envs": B, "value": N, "unit": "env-steps/s"}

Step semantics differ per family (matching the reference):
- traffic: one RL step = one Richtmyer PDE step (``traffic_arz_env.py``
  steps the PDE once per action).
- neuron: one step = one dt of the moving-boundary DPR solve; the control is
  the embedded backstepping law (action ignored), float32 on TPU.
- brain_tumor: one step = one day (DPR PDE + BED dose); constant mid-range
  dose fraction.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def _measure(env, policy, num_envs, num_steps, repeats, inner=8):
    from pdecontrolgym_tpu.parallel.rollout import rollout

    # scan ``inner`` full episodes per dispatch (fresh keys — no CSE) so the
    # tunnel's ~30 ms fixed dispatch round-trip is amortized instead of being
    # billed to the env: single-episode timing understated the short families
    # (brain tumor's 365-day episode is ~10 ms of device work) by up to 4x.
    def episode(key):
        (_, obs), outs = rollout(env, policy, num_envs, num_steps, key)
        # fold the final observation into the timed scalar too: a reward-free
        # env (neuron embeds its controller and needs no reward here) would
        # otherwise time a constant-zero program after XLA dead-code
        # eliminates the entire rollout
        return outs.reward.sum().astype(jnp.float32) + obs.sum().astype(jnp.float32)

    def run_fn(key):
        acc, _ = jax.lax.scan(
            lambda a, k: (a + episode(k).astype(jnp.float32), ()),
            jnp.zeros((), jnp.float32),
            jax.random.split(key, inner),
        )
        return acc

    run = jax.jit(run_fn)
    t0 = time.time()
    float(np.asarray(run(jax.random.key(0))))
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        float(np.asarray(run(jax.random.key(i + 1))))
        best = min(best, time.perf_counter() - t0)
    return num_envs * num_steps * inner / best, compile_s


def bench_traffic(num_envs, repeats, steps=None):
    from pdecontrolgym_tpu.envs.traffic_arz import TrafficARZConfig, TrafficARZEnv
    from pdecontrolgym_tpu.rewards.traffic import TrafficARZReward

    cfg = TrafficARZConfig(simulation_type="outlet")
    env = TrafficARZEnv(cfg, TrafficARZReward())
    mid = jnp.asarray(0.5 * (env.action_low + env.action_high))

    def policy(obs, _key):
        return jnp.full(obs.shape[:-1], mid)

    return _measure(env, policy, num_envs, steps or 960, repeats)


def bench_neuron(num_envs, repeats, steps=None):
    from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv

    cfg = NeuronConfig(dtype=jnp.float32, backend="xla")  # f64 unavailable on TPU
    env = NeuronEnv(cfg)
    policy = lambda obs, _key: jnp.zeros(obs.shape[:-1])  # action ignored
    return _measure(env, policy, num_envs, steps or 1000, repeats)


def bench_neuron_fused(num_envs, repeats, steps=None):
    """The fused K-step kernel path (steps_per_call=100): same 1000 dt-steps
    per episode as the `neuron` row, counted in dt-steps/s — the controller
    is embedded, so K>1 breaks no policy contract (ops/neuron_interval)."""
    from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv

    K = 100
    cfg = NeuronConfig(dtype=jnp.float32, steps_per_call=K)
    env = NeuronEnv(cfg)
    policy = lambda obs, _key: jnp.zeros(obs.shape[:-1])
    calls = max((steps or 1000) // K, 1)  # smoke --steps < K still measures
    rate, compile_s = _measure(env, policy, num_envs, calls, repeats)
    return rate * K, compile_s


def bench_neuron_fused_reward(num_envs, repeats, steps=None):
    """The fused K-step kernel WITH the stock NormReward (round 5 lifts the
    reward-free restriction: the per-dt L2 norm ring is computed in-kernel)
    — the qualified counterpart of the reward-free `neuron_fused` row."""
    from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv
    from pdecontrolgym_tpu.rewards.norm import NormReward

    K = 100
    cfg = NeuronConfig(dtype=jnp.float32, steps_per_call=K)
    env = NeuronEnv(cfg, reward=NormReward(nt=cfg.nt, norm_coeff=10.0))
    policy = lambda obs, _key: jnp.zeros(obs.shape[:-1])
    calls = max((steps or 1000) // K, 1)
    rate, compile_s = _measure(env, policy, num_envs, calls, repeats)
    return rate * K, compile_s


def bench_brain_tumor(num_envs, repeats, steps=None):
    from pdecontrolgym_tpu.envs.brain_tumor import BrainTumorConfig, BrainTumorEnv
    from pdecontrolgym_tpu.rewards.brain_tumor import BrainTumorReward

    cfg = BrainTumorConfig()
    env = BrainTumorEnv(cfg, BrainTumorReward())
    policy = lambda obs, _key: jnp.full(obs.shape[:-1], 0.5)
    return _measure(env, policy, num_envs, steps or 365, repeats)


def bench_brain_tumor_xla(num_envs, repeats, steps=None):
    """backend='xla' pin of the brain_tumor row. Since round 5 'auto' also
    resolves to vmap for this family (every kernel variant measured slower
    — ops/brain_tumor_interval), so this row should EQUAL brain_tumor; it
    stays as the drift guard for that decision."""
    from pdecontrolgym_tpu.envs.brain_tumor import BrainTumorConfig, BrainTumorEnv
    from pdecontrolgym_tpu.rewards.brain_tumor import BrainTumorReward

    cfg = BrainTumorConfig(backend="xla")
    env = BrainTumorEnv(cfg, BrainTumorReward())
    policy = lambda obs, _key: jnp.full(obs.shape[:-1], 0.5)
    return _measure(env, policy, num_envs, steps or 365, repeats)


def bench_therapy(num_envs, repeats, steps=None):
    """TherapyEnv whole-episode throughput: batched init (in-kernel Growth
    fast-forward) + therapy days at a 1.8 Gy/day-equivalent dose fraction +
    the Post-Therapy sweep, loop until every env ends. The unit is simulated
    DAYS/s (sum of per-env simulation_days over wall time) — comparable to
    the brain_tumor env-steps/s row — with episodes/s derivable from the
    per-episode day count."""
    from pdecontrolgym_tpu.envs.brain_tumor import (
        BrainTumorConfig, BrainTumorEnv, TherapyEnv)
    from pdecontrolgym_tpu.rewards.brain_tumor import BrainTumorReward

    env = BrainTumorEnv(BrainTumorConfig(), BrainTumorReward())
    tenv = TherapyEnv(env, t_benchmark=300)
    dose = jnp.full((num_envs, 1), 0.03, jnp.float32)

    @jax.jit
    def episode(key):
        keys = jax.random.split(key, num_envs)
        state, _ = tenv.init_batch(keys)

        def cond(c):
            _, done = c
            return ~done.all()

        def body(c):
            s, done = c
            s, out = tenv.step_batch(s, dose)
            return s, done | out.terminated | out.truncated

        state, _ = jax.lax.while_loop(
            cond, body, (state, jnp.zeros((num_envs,), bool))
        )
        return state.simulation_days.sum()

    t0 = time.time()
    days = int(np.asarray(episode(jax.random.key(0))))
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        days = int(np.asarray(episode(jax.random.key(i + 1))))
        best = min(best, time.perf_counter() - t0)
    return days / best, compile_s


def _bench_ns(solver, n=None, step_backend="auto"):
    """NS benches. solver='matpow'/'jacobi' run the reference's 21x21 grid at
    2000-iteration pressure-parity semantics (matpow collapses the sweeps
    into two precomputed 441x441 matmuls with identical truncation error).
    solver='direct' is the fast mode: 64x64 f32 spectral solve; its
    step_backend arg picks the fused Pallas projection kernel ('auto' on
    TPU) vs the XLA path ('xla')."""

    def run(num_envs, repeats, steps=None):
        from pdecontrolgym_tpu.envs.navier_stokes import (
            NavierStokesConfig, NavierStokesEnv, freeze_boundary_condition)
        from pdecontrolgym_tpu.rewards.ns import NSReward

        bc = freeze_boundary_condition({
            "upper": ["Controllable", "Dirchilet"],
            "lower": ["Dirchilet", "Dirchilet"],
            "left": ["Dirchilet", "Dirchilet"],
            "right": ["Dirchilet", "Dirchilet"],
        })
        if n is None:
            cfg = NavierStokesConfig(
                dtype=jnp.float32, boundary_condition=bc,
                pressure_solver=solver, step_backend=step_backend)
        else:
            cfg = NavierStokesConfig(
                T=0.05, dt=2e-4, X=1.0, dx=1.0 / (n - 1),
                Y=1.0, dy=1.0 / (n - 1), viscosity=0.05,
                dtype=jnp.float32, boundary_condition=bc,
                pressure_solver=solver, step_backend=step_backend)
        nt = cfg.nt
        env = NavierStokesEnv(
            cfg, NSReward(0.1),
            jnp.zeros((nt, cfg.ny, cfg.nx, 2), cfg.dtype),
            2.0 * jnp.ones(nt, cfg.dtype))
        policy = lambda obs, _key: jnp.full(obs.shape[:1] + (1,), 2.0)
        return _measure(env, policy, num_envs, steps or nt - 1, repeats)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=4096)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--steps", type=int, default=None,
                    help="override steps per rollout (smoke tests)")
    ap.add_argument("--families", default="traffic,neuron,brain_tumor,ns_matpow")
    args = ap.parse_args()

    fns = {"traffic": bench_traffic, "neuron": bench_neuron,
           "neuron_fused": bench_neuron_fused,
           "neuron_fused_reward": bench_neuron_fused_reward,
           "brain_tumor": bench_brain_tumor,
           "brain_tumor_xla": bench_brain_tumor_xla,
           "therapy": bench_therapy,
           "ns_matpow": _bench_ns("matpow"), "ns_jacobi": _bench_ns("jacobi"),
           "ns_fast": _bench_ns("direct", n=64),
           "ns_fast_xla": _bench_ns("direct", n=64, step_backend="xla"),
           # grid-scaling rows: 128x128 is lane-dense already (pack_r=1,
           # the kernel runs its transpose-pipelined branch)
           "ns_fast_128": _bench_ns("direct", n=128),
           "ns_fast_128_xla": _bench_ns("direct", n=128,
                                        step_backend="xla")}
    for name in filter(None, args.families.split(",")):
        rate, compile_s = fns[name](args.envs, args.repeats, args.steps)
        print(json.dumps({
            "env": name, "envs": args.envs, "value": round(rate),
            "unit": "env-steps/s", "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
