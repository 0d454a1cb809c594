"""Neuron growth env parity vs the (bug-patched) reference.

The reference ``NeuronPDE1D.step()`` crashes on a latent AttributeError
(``neuron_env.py:288`` uses ``self.atilde1``; only ``aTilde1`` is defined at
:78). The oracle patches the attribute to run the evidently intended dynamics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv

from reference_loader import load_reference_module

PARAMS = dict(T=180.0, dt=5e-6, X=12e-6, dx=0.01)


class _ZeroReward:
    def reward(self, uVec, time_index, terminate, truncate, action):
        return 0.0


def _ref_env(**variant):
    neuron = load_reference_module("pde_control_gym.src.environments1d.neuron_env")
    env = neuron.NeuronPDE1D(
        sensing_noise_func=lambda s: s,
        reward_class=_ZeroReward(),
        **{"sensing_loc": "full", **variant},
        **PARAMS,
    )
    env.atilde1 = env.aTilde1  # the documented reference bug
    return env


def _tpu_env(**variant):
    return NeuronEnv(NeuronConfig(**PARAMS, **variant))


def test_construction_tables_match():
    ref = _ref_env()
    env = _tpu_env()
    assert env.M == ref.M
    np.testing.assert_allclose(np.asarray(env.phi), ref.phi, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(env.phi_prime), ref.PhiPrime, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(env.p), ref.p, rtol=1e-7)
    np.testing.assert_allclose(np.asarray(env.c_eq), ref.CSubEq[:, 0], rtol=1e-10)
    state, obs = env.init(None)
    np.testing.assert_allclose(np.asarray(state.u), ref.u[:, 0], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(state.Z), ref.Z[:, 0], rtol=1e-12)
    assert int(state.L) == ref.L


def test_trajectory_parity_200_steps():
    ref = _ref_env()
    env = _tpu_env()
    step = jax.jit(env.step)
    state, _ = env.init(None)
    for i in range(200):
        obs, rew, term, trunc, _ = ref.step()
        state, out = step(state)
        assert int(state.L) == ref.L
        np.testing.assert_allclose(
            np.asarray(state.u), ref.u[:, 0], rtol=1e-8, atol=1e-14
        )
        np.testing.assert_allclose(
            np.asarray(state.Z), ref.Z[:, 0], rtol=1e-10
        )
        np.testing.assert_allclose(
            float(out.info["control"]), float(np.asarray(ref.ControlInput).ravel()[0]),
            rtol=1e-8,
        )
        assert bool(out.terminated) == term


VARIANTS = [
    # sensing_loc x control_type x sensing_type (neuron_env.py:104-162)
    dict(sensing_loc="collocated", control_type="Neumann"),
    dict(sensing_loc="collocated", control_type="Dirchilet"),
    dict(sensing_loc="opposite", sensing_type="Neumann"),
    dict(sensing_loc="opposite", sensing_type="Dirchilet"),
]


def test_sensing_variant_parity():
    """Each sensing/control variant's observation stream matches the
    (patched) reference's ``sensing_update(u[:LNew], dx, noise)``."""
    import pytest

    for variant in VARIANTS:
        ref = _ref_env(**variant)
        env = _tpu_env(**variant)
        assert env.obs_dim == 1
        step = jax.jit(env.step)
        state, _ = env.init(None)
        for _ in range(50):
            ref_obs = ref.step()[0]
            state, out = step(state)
            np.testing.assert_allclose(
                np.asarray(out.obs).ravel(),
                np.asarray(ref_obs).ravel(),
                rtol=1e-7, atol=1e-12,
                err_msg=f"variant {variant}",
            )
    # invalid combos are rejected loudly (the reference raises at init too)
    with pytest.raises(Exception, match="sensing_loc"):
        _tpu_env(sensing_loc="Full")  # the reference's unreachable default
    with pytest.raises(Exception, match="control_type"):
        _tpu_env(control_type="robin")
    with pytest.raises(Exception, match="sensing_type"):
        _tpu_env(sensing_loc="opposite", sensing_type="robin")


def test_sensing_variant_adapter():
    """The Gymnasium adapter exposes scalar observation spaces for the
    collocated/opposite variants and the episode runs."""
    from pdecontrolgym_tpu.compat.adapter import NeuronPDE1D

    env = NeuronPDE1D(sensing_loc="collocated", control_type="Neumann",
                      **PARAMS)
    assert env.observation_space.shape == (1,)
    obs, _ = env.reset()
    assert obs.shape == (1,)
    obs, rew, term, trunc, _ = env.step()
    assert obs.shape == (1,)
    assert np.isfinite(obs).all()


def test_growth_progresses_toward_target_length():
    """Long rollout via lax.scan: the boundary index L should grow as the
    axon approaches LSubS (control objective)."""
    env = _tpu_env()
    state, _ = env.init(None)

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def run(state, n):
        def body(s, _):
            s, out = env.step(s)
            return s, s.L

        return jax.lax.scan(body, state, None, length=n)

    state, Ls = run(state, 20000)
    assert int(Ls[-1]) >= int(Ls[0])  # domain does not collapse
    assert np.isfinite(np.asarray(state.u)).all()


def test_fused_kstep_kernel_matches_xla():
    """The fused K-step Pallas kernel (ops/neuron_interval, interpret mode
    on CPU) matches the XLA step loop: same masked tip reads, trapezoid
    control, interior stencil, and the terminate-resets-time quirk."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv

    for K in (1, 7):
        ep = NeuronEnv(NeuronConfig(dtype=jnp.float32, steps_per_call=K,
                                    backend="pallas"))
        ex = NeuronEnv(NeuronConfig(dtype=jnp.float32, steps_per_call=K,
                                    backend="xla"))
        assert ep._get_interval_fn() is not False
        assert ex._get_interval_fn() is False
        B = 5
        s0, _ = ep.init()
        tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
        state = jax.tree_util.tree_map(tile, s0)
        state = state.replace(u=state.u + 0.001 * jax.random.normal(
            jax.random.PRNGKey(0), state.u.shape, jnp.float32))
        sp = sx = state
        for _ in range(3):
            sp, op = ep.step_batch(sp, None)
            sx, ox = ex.step_batch(sx, None)
        np.testing.assert_allclose(np.asarray(sp.u), np.asarray(sx.u),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sp.Z), np.asarray(sx.Z),
                                   rtol=1e-6, atol=1e-9)
        np.testing.assert_array_equal(np.asarray(sp.L), np.asarray(sx.L))
        np.testing.assert_allclose(np.asarray(sp.time_index),
                                   np.asarray(sx.time_index), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(op.obs), np.asarray(ox.obs),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_array_equal(np.asarray(op.terminated),
                                      np.asarray(ox.terminated))


def test_steps_per_call_gates_truncation_and_window():
    import jax.numpy as jnp
    import pytest

    from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv
    from pdecontrolgym_tpu.rewards.norm import NormReward

    with pytest.raises(ValueError, match="steps_per_call"):
        NeuronEnv(NeuronConfig(dtype=jnp.float32, steps_per_call=4,
                               limit_pde_state_size=True))
    # the reward's trailing window must fit in one K-step call
    with pytest.raises(ValueError, match="ring_requirement"):
        NeuronEnv(
            NeuronConfig(dtype=jnp.float32, steps_per_call=4),
            reward=NormReward(nt=100, horizon="t-horizon",
                              t_horizon_length=8),
        )


@pytest.mark.parametrize("horizon,norm", [
    ("temporal", "2"),
    ("differential", "2"),
    ("t-horizon", "1"),     # exercises the aux (L1) ring
    ("t-horizon", "inf"),
])
def test_fused_kstep_kernel_with_norm_reward(horizon, norm):
    """Round-5 lift of the kernel's reward-free restriction: with the stock
    NormReward at K>1 the kernel computes the per-dt norm ring (in the
    reward's ord) and prev_u in-kernel; rewards must match the XLA K-step
    loop, which shares the same once-per-call RewardCtx contract."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv
    from pdecontrolgym_tpu.rewards.norm import NormReward

    K = 7
    mk = lambda backend: NeuronEnv(
        NeuronConfig(dtype=jnp.float32, steps_per_call=K, backend=backend),
        reward=NormReward(nt=1000, horizon=horizon, norm=norm,
                          t_horizon_length=5, norm_coeff=10.0),
    )
    ep, ex = mk("pallas"), mk("xla")
    assert ep._get_interval_fn() is not False
    B = 4
    s0, _ = ep.init()
    tile = lambda x: jnp.broadcast_to(x, (B,) + x.shape)
    state = jax.tree_util.tree_map(tile, s0)
    state = state.replace(u=state.u + 0.001 * jax.random.normal(
        jax.random.PRNGKey(1), state.u.shape, jnp.float32))
    sp = sx = state
    for _ in range(3):
        sp, op = ep.step_batch(sp, None)
        sx, ox = ex.step_batch(sx, None)
        np.testing.assert_allclose(np.asarray(op.reward),
                                   np.asarray(ox.reward),
                                   rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(sp.u), np.asarray(sx.u),
                               rtol=1e-5, atol=1e-7)


def test_kstep_t_horizon_reward_semantics():
    """The once-per-call t-horizon reward must equal the mean of the last H
    per-dt norms (full window: K >= H means every call fills the ring) —
    not just kernel==XLA parity. Guards the step-count time_index fix: the
    env's seconds accumulator would have made NormReward's window count
    degenerate to 1 for the first ~10^5 calls (review finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdecontrolgym_tpu.envs.neuron import NeuronConfig, NeuronEnv
    from pdecontrolgym_tpu.rewards.norm import NormReward

    K, H, coeff = 7, 5, 10.0
    env = NeuronEnv(
        NeuronConfig(dtype=jnp.float32, steps_per_call=K, backend="xla"),
        reward=NormReward(nt=1000, horizon="t-horizon", norm="2",
                          t_horizon_length=H, norm_coeff=coeff),
    )
    state, _ = env.init()
    new_state, out = env.step(state)

    # recompute the last H per-dt L2 norms with the bare advance loop
    plain = NeuronEnv(NeuronConfig(dtype=jnp.float32, backend="xla"))
    u, Z, L, t = state.u, state.Z, state.L, state.time_index
    norms = []
    for _ in range(K):
        u, Z, L, t = plain._advance_once(u, Z, L, t)[:4]
        norms.append(float(jnp.linalg.norm(u)))
    expected = -np.mean(norms[-H:]) / coeff
    np.testing.assert_allclose(float(out.reward), expected, rtol=1e-5)
