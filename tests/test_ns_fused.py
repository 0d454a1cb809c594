"""Fused Pallas NS projection step (ops/ns_fused) vs the XLA batched path.

Runs in Pallas interpret mode on CPU (the env builds the kernel with
``interpret=True`` off-TPU when ``step_backend="fused"`` is forced). The
oracle is the env's own XLA ``_advance`` — itself parity-tested against the
reference (``src/environments2d/navier_stokes2D.py:118-157``) in
``test_navier_stokes.py`` — so this suite pins kernel==XLA semantics:
predictor, per-edge boundary write order (corner overwrite chains), the
padded-basis spectral pressure solve, mirror ring copies, and corrector.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdecontrolgym_tpu.envs.navier_stokes import (
    NavierStokesConfig,
    NavierStokesEnv,
    NavierStokesState,
    freeze_boundary_condition,
)
from pdecontrolgym_tpu.rewards.ns import NSReward

LID_BC = freeze_boundary_condition({
    "upper": ["Controllable", "Dirchilet"],
    "lower": ["Dirchilet", "Dirchilet"],
    "left": ["Dirchilet", "Dirchilet"],
    "right": ["Dirchilet", "Dirchilet"],
})
# exercises Neumann inner-neighbor reads and a Controllable v-component,
# so corner overwrite chains differ from the lid default
MIXED_BC = freeze_boundary_condition({
    "upper": ["Controllable", "Neumann"],
    "lower": ["Neumann", "Dirchilet"],
    "left": ["Dirchilet", "Controllable"],
    "right": ["Neumann", "Neumann"],
})


def _cfg(bc, n=16, **kw):
    d = 1.0 / (n - 1)
    kw.setdefault("pressure_solver", "direct")
    return NavierStokesConfig(
        T=0.02, dt=1e-3, X=1.0, dx=d, Y=1.0, dy=d,
        viscosity=0.05, dtype=jnp.float32,
        boundary_condition=bc, **kw,
    )


def _env(cfg):
    nt = cfg.nt
    return NavierStokesEnv(
        cfg, NSReward(0.1),
        jnp.zeros((nt, cfg.ny, cfg.nx, 2), cfg.dtype),
        2.0 * jnp.ones(nt, cfg.dtype),
    )


def _batch_state(env, batch, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    state, _ = jax.vmap(env.init)(keys)
    # bounded, non-constant fields so the nonlinear terms are exercised;
    # fields go through env._pack so packed-layout envs get carried-layout
    # state (a no-op for unpacked envs)
    ku, kv = jax.random.split(jax.random.PRNGKey(seed + 1))
    shape = (batch, env.config.ny, env.config.nx)
    return state.replace(
        u=env._pack(0.2 * jax.random.normal(ku, shape, jnp.float32)),
        v=env._pack(0.2 * jax.random.normal(kv, shape, jnp.float32)),
    )


@pytest.mark.parametrize("bc,batch", [(LID_BC, 4), (MIXED_BC, 3)])
@pytest.mark.parametrize("packed", ["auto", "off"])
def test_fused_matches_xla_path(bc, batch, packed):
    fused_env = _env(_cfg(bc, step_backend="fused", packed_layout=packed))
    xla_env = _env(_cfg(bc, step_backend="xla"))
    assert fused_env._fused_step is not None
    assert xla_env._fused_step is None
    if packed == "auto":
        assert fused_env._pack_r > 1  # 16x16 folds to (2, 128)
    else:
        assert fused_env._pack_r == 1

    xs = _batch_state(xla_env, batch)
    fs = _batch_state(fused_env, batch)
    acts = jnp.linspace(-1.5, 2.0, batch, dtype=jnp.float32)[:, None]
    for _ in range(3):
        fs, fout = fused_env.step_batch(fs, acts)
        xs, xout = xla_env.step_batch(xs, acts)
        for a, b in (
            (fused_env._unpack(fs.u), xs.u),
            (fused_env._unpack(fs.v), xs.v),
            (fused_env._unpack(fs.p), xs.p),
        ):
            np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)
        # public obs stays logical regardless of the carried layout
        assert fout.obs.shape == xout.obs.shape
        np.testing.assert_allclose(fout.obs, xout.obs, rtol=0, atol=2e-5)
        np.testing.assert_allclose(fout.reward, xout.reward, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(fout.terminated, xout.terminated)


def test_auto_backend_stays_on_xla_on_cpu():
    env = _env(_cfg(LID_BC))  # step_backend="auto", conftest forces CPU
    assert env._fused_step is None


def test_fused_rejects_ineligible_config():
    import dataclasses

    with pytest.raises(ValueError, match="fused"):
        _env(_cfg(LID_BC, step_backend="fused", pressure_solver="matpow"))
    cfg64 = dataclasses.replace(
        _cfg(LID_BC, step_backend="fused"), dtype=jnp.float64
    )
    with pytest.raises(ValueError, match="fused"):
        _env(cfg64)


@pytest.mark.parametrize("bc", [LID_BC, MIXED_BC])
def test_fused_step_is_differentiable(bc):
    """jax.grad through the fused batched step must work (custom_vjp whose
    backward re-runs the XLA projection) and agree with the pure-XLA path —
    including in packed-carried-layout mode, where pack/unpack transposes
    must land the cotangents back in logical space."""
    fused_env = _env(_cfg(bc, step_backend="fused"))  # packed_layout="auto"
    xla_env = _env(_cfg(bc, step_backend="xla"))
    xstate = _batch_state(xla_env, 3)
    acts = jnp.linspace(-1.0, 1.5, 3, dtype=jnp.float32)[:, None]

    def loss(env):
        # parametrized by the LOGICAL u so the two envs' gradients live in
        # the same space; sums are taken over logical fields
        def f(u, a):
            s = jax.tree_util.tree_map(jnp.copy, xstate)
            s = s.replace(
                u=env._pack(u), v=env._pack(xstate.v), p=env._pack(xstate.p)
            )
            new_state, out = env.step_batch(s, a)
            return (new_state.u.sum() + new_state.v.sum()
                    + env._unpack(new_state.p)[:, 1:-1, 1:-1].sum()
                    + out.reward.sum())
        return f

    gf_u, gf_a = jax.grad(loss(fused_env), argnums=(0, 1))(xstate.u, acts)
    gx_u, gx_a = jax.grad(loss(xla_env), argnums=(0, 1))(xstate.u, acts)
    np.testing.assert_allclose(gf_u, gx_u, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gf_a, gx_a, rtol=1e-5, atol=1e-6)


def test_ppo_train_step_through_fused_packed_kernel():
    """A full PPO train step (rollout + GAE + minibatch updates, policy
    consuming obs) through the PACKED fused kernel: exercises the per-step
    obs unpack, the in-kernel tracking reward, and the custom_vjp backward
    inside the jitted trainer — the end-to-end training contract."""
    from pdecontrolgym_tpu.agents.ppo import PPOConfig, PPOTrainer
    from pdecontrolgym_tpu.envs.navier_stokes import make_lid_target
    from pdecontrolgym_tpu.envs.wrappers import FlatObsEnv
    from pdecontrolgym_tpu.rewards.ns import NSReward

    cfg = _cfg(LID_BC, n=16, step_backend="fused")  # 16 folds to (2, 128)
    U_ref, action_ref = make_lid_target(cfg, lid=1.0)
    env = NavierStokesEnv(cfg, NSReward(0.1), U_ref, action_ref)
    assert env._pack_r > 1 and env._fused_track
    # spy on the env's fused step_batch: FlatObsEnv must DELEGATE to it (the
    # review finding was that the wrapper hid it, silently demoting training
    # to vmap(step) and leaving the fused path unreachable)
    fused_calls = []
    orig_step_batch = env.step_batch

    def spying_step_batch(state, actions):
        fused_calls.append(1)
        return orig_step_batch(state, actions)

    env.step_batch = spying_step_batch
    wrapped = FlatObsEnv(env)
    assert hasattr(wrapped, "step_batch")
    assert wrapped.fixed_episode_length == env.fixed_episode_length
    trainer = PPOTrainer(
        wrapped,
        PPOConfig(num_envs=4, num_steps=3, num_epochs=1, num_minibatches=2,
                  hidden=(8, 8)),
    )
    runner = trainer.init(jax.random.key(0))
    runner, metrics = trainer.make_train_step()(runner)
    assert fused_calls, "train step traced without the fused step_batch"
    assert bool(jnp.isfinite(metrics["loss"]))
    assert bool(jnp.isfinite(metrics["mean_reward"]))


@pytest.mark.parametrize("prec,tol", [("high", 4e-4), ("default", 3e-2)])
def test_spectral_precision_knob(prec, tol):
    """Opt-in reduced-precision spectral modes stay within their documented
    error envelopes vs the full-f32 HIGHEST kernel over a 20-step rollout,
    and "high" (manual bf16_3x) is strictly tighter than "default" (single
    bf16 pass). HIGHEST itself is pinned to the XLA twin elsewhere."""
    envs = {
        p: _env(_cfg(LID_BC, step_backend="fused", spectral_precision=p))
        for p in ("highest", prec)
    }
    states = {p: _batch_state(e, 3) for p, e in envs.items()}
    acts = jnp.linspace(-1.0, 1.5, 3, dtype=jnp.float32)[:, None]
    for _ in range(20):
        for p, e in envs.items():
            states[p], _ = e.step_batch(states[p], acts)
    ref = envs["highest"]
    scale = float(jnp.abs(ref._unpack(states["highest"].u)).max()) + 1e-6
    for field in ("u", "v"):
        a = envs[prec]._unpack(getattr(states[prec], field))
        b = ref._unpack(getattr(states["highest"], field))
        err = float(jnp.abs(a - b).max()) / scale
        assert err < tol, (prec, field, err)
        assert err > 0.0  # the knob actually changes the arithmetic


def test_spectral_precision_rejects_unknown():
    with pytest.raises(ValueError, match="spectral_precision"):
        _env(_cfg(LID_BC, step_backend="fused", spectral_precision="bf8"))


def test_packed_layout_gated_on_stock_reward():
    """packed_layout="auto" must NOT pack under a custom reward_class:
    batched rewards consume carried-layout frames, which is only safe for
    the permutation-invariant stock NSReward (review finding). "force"
    overrides for rewards the caller knows to be permutation-invariant."""
    from pdecontrolgym_tpu.core.base import RewardCtx

    class SpatialReward(NSReward):
        """A reward with spatial structure (boundary column weighting)."""

        def __call__(self, ctx: RewardCtx):
            frame = ctx.extras["frame"]
            return -jnp.abs(frame[..., 0, :, 0]).sum(-1)

    cfg = _cfg(LID_BC, step_backend="fused")
    nt = cfg.nt
    mk = lambda reward, **kw: NavierStokesEnv(
        _cfg(LID_BC, step_backend="fused", **kw), reward,
        jnp.zeros((nt, cfg.ny, cfg.nx, 2), cfg.dtype),
        2.0 * jnp.ones(nt, cfg.dtype),
    )
    assert mk(NSReward(0.1))._pack_r > 1          # stock reward packs
    assert mk(SpatialReward(0.1))._pack_r == 1    # custom reward must not
    assert mk(SpatialReward(0.1), packed_layout="force")._pack_r > 1
