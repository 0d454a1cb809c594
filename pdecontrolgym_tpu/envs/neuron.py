"""Neuron (axon) growth control PDE — moving-boundary PDE-ODE cascade.

Tubulin advection-diffusion ``u_t = D u_xx − a u_x − g u`` on the growing
domain ``[0, l(t)]`` coupled to the 2-state cone ODE ``Ż = A₁Z + B uₓ(l(t))``,
with an *embedded* backstepping controller: ``step()`` ignores any external
action and computes ``U(t)`` internally from precomputed gain kernels
``φ(x) = RowVec · expm(−x·N₁) · [I; 0]`` (reference
``src/environments1d/neuron_env.py:171-232``, computed here with a vmapped
``jax.scipy.linalg.expm``) and a masked trapezoidal integral (:302-307).

The moving boundary is tracked as a grid index ``L`` via the clamped
``Conversion`` map (:367-373); interior updates are masked vectorized stencils
over ``1 ≤ n < L`` instead of the reference's Python loop.

Reference bugs fixed (not replicated): the ``atilde1`` / ``aTilde1``
AttributeError (:288 vs :78) that makes the reference's ``step()`` unrunnable,
and the unreachable ``sensing_loc="Full"`` default (:50 vs the lowercase match
arms :104-131). Oracle tests patch the reference attribute to compare.

Sensing/control variant matrix (reference ``neuron_env.py:104-162``): the
observation is resolved ONCE at construction from
``sensing_loc`` × ``control_type`` × ``sensing_type``. The reference applies
its sensing lambda to ``new_u = u[:LNew]`` (:325-331), so "collocated" reads
the moving tip's neighborhood: with Neumann control it is ``u[L-1]``
(``state[-1]``), with Dirichlet control ``(u[L-1] - u[L-2])/dx``; "opposite"
reads the soma end, ``(u[1]-u[0])/dx`` (Neumann sensing) or ``u[0]``
(Dirichlet sensing). "full" returns the whole fixed-shape state row (the
reference returns the dynamic-length ``u[:LNew]``; the Gymnasium adapter
truncates on the host to match). Note the reference's ``control_update``
result is discarded (:310 — ``normalize(...)`` return value unassigned), so
``control_type`` affects ONLY the collocated sensing stencil, never the
dynamics; this build mirrors that. Invalid combinations raise at construction
with the reference's error messages.

Quirk preserved: ``time_index`` accumulates ``dt`` per step while ``terminate``
compares against ``nt`` (:276, :347) — episodes effectively never
time-terminate, matching the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from pdecontrolgym_tpu.core.base import FunctionalEnv, RewardCtx, StepOut


@dataclasses.dataclass(frozen=True)
class NeuronConfig:
    T: float = 180.0
    dt: float = 5e-6
    X: float = 12e-6
    dx: float = 0.01
    cInfty: float = 0.0119
    LSubS: float = 12e-6
    k1: float = -1e3
    k2: float = 1e13
    LSubZero: float = 1e-6
    LSubC: float = 4e-6
    a: float = 1e-8
    g: float = 5e-7
    D: float = 10e-12
    TildeRSubG: float = 0.053
    RSubG: float = 1.783e-5
    limit_pde_state_size: bool = False
    max_state_value: float = 1e10
    max_control_value: float = 20.0
    control_type: str = "Neumann"
    sensing_type: str = "Neumann"
    sensing_loc: str = "full"  # reference default "Full" is unreachable; fixed
    normalize: bool = False
    dtype: Any = jnp.float64
    # TPU-native extension: dt-steps advanced per step() call. The controller
    # is EMBEDDED (step takes no action), so K>1 is the neuron analog of the
    # 1D families' control interval — and with backend="auto" on TPU the
    # whole K-step block runs as ONE VMEM-resident Pallas kernel
    # (ops/neuron_interval). K>1 requires reward=None and
    # limit_pde_state_size=False (both defaults): those are per-dt-step
    # semantics that a fused block would silently coarsen.
    steps_per_call: int = 1
    # "auto": the fused kernel when eligible (TPU, f32, no reward/noise/
    # truncation); "xla": always the scan; "pallas": force (interpret on CPU)
    backend: str = "auto"

    @property
    def nt(self) -> int:
        return int(round(self.T / self.dt) + 1)

    @property
    def scale_and_length(self):
        # neuron_env.py:164-169: scale X up by 10s until >= 1
        length, scale = self.X, 1.0
        while length < 1:
            length *= 10
            scale /= 10
        return scale, length

    @property
    def M(self) -> int:
        _, length = self.scale_and_length
        return len(jnp.arange(0.0, length + self.dx, self.dx))


@struct.dataclass
class NeuronState:
    u: jnp.ndarray  # (M,) tubulin error state
    Z: jnp.ndarray  # (2,) cone ODE state
    L: jnp.ndarray  # int32 boundary grid index
    time_index: jnp.ndarray  # float accumulator


class NeuronEnv(FunctionalEnv):
    def __init__(self, config: NeuronConfig, reward=None,
                 noise_fn: Optional[Callable] = None):
        c = config
        self.config = c
        self.reward = reward
        self.noise_fn = noise_fn
        if int(getattr(c, "steps_per_call", 1)) > 1 and c.limit_pde_state_size:
            raise ValueError(
                "steps_per_call > 1 requires limit_pde_state_size=False: "
                "blow-up truncation is a per-dt-step semantic that a fused "
                "K-step block would silently coarsen"
            )
        # K>1 + reward (round 5): the reward is evaluated ONCE per call on
        # the post-block state, with a trailing per-dt norm window in the
        # reward's declared ord (ring_requirement/ring_ord, as the 1D
        # families' control intervals do) and prev_u for differential
        # rewards. The window must fit in one call.
        K0 = int(getattr(c, "steps_per_call", 1))
        if K0 > 1 and reward is not None:
            if K0 < int(getattr(reward, "ring_requirement", 1)):
                raise ValueError(
                    "steps_per_call must cover the reward's ring_requirement"
                    f" ({reward.ring_requirement}) so the trailing norm "
                    "window fits in one call"
                )

        scale, length = c.scale_and_length
        self.scale = scale
        x = jnp.arange(0.0, length + c.dx, c.dx)
        self.x = x
        M = x.shape[0]
        self.M = M

        # physical constant block (neuron_env.py:62-100)
        H = jnp.array([1.0, -((c.a - c.g * c.LSubC) * c.cInfty) / c.D])
        aT1 = (c.a - c.RSubG * c.cInfty) / c.LSubC - c.g - c.TildeRSubG
        A1 = jnp.array([[aT1, 0.0], [c.RSubG, 0.0]])
        beta = c.D / c.LSubC
        B = jnp.array([-beta, 0.0])
        disc = jnp.sqrt(c.a**2 + 4.0 * c.D * c.g)
        lam_minus = (c.a - disc) / (2.0 * c.D)
        lam_plus = (c.a + disc) / (2.0 * c.D)
        kshift = (c.a - 2.0 * c.g * c.LSubC) / 2.0 / disc
        K_minus, K_plus = 0.5 - kshift, 0.5 + kshift
        K = jnp.array([c.k1, c.k2])
        gamma = (c.a / c.D) * 10.0

        self.H, self.B, self.K = H, B, K
        self.aTilde1, self.beta_c, self.gamma = aT1, beta, gamma

        # N1 block matrix (neuron_env.py:176-180)
        I2, Z2 = jnp.eye(2), jnp.zeros((2, 2))
        Hr, Br = H[:, None], B[:, None]
        TR = (1.0 / c.D) * (c.g * I2 + A1 + (c.a / c.D) * (Br @ Hr.T))
        BR = (1.0 / c.D) * (Br @ Hr.T + c.a * I2)
        N1 = jnp.block([[Z2, TR], [I2, BR]])

        row_vec = jnp.concatenate([H, K - (H @ Br @ Hr.T).ravel() / c.D])
        Ivec = jnp.vstack([I2, jnp.zeros((2, 2))])
        Ivec_flip = jnp.vstack([jnp.zeros((2, 2)), I2])

        # gain tables φ, φ′, p — vmapped matrix exponentials (:222-232)
        def gains(xi):
            E = jax.scipy.linalg.expm(-scale * xi * N1)
            phi = row_vec @ E @ Ivec
            phip = row_vec @ E @ Ivec_flip
            return phi, phip

        phi, phip = jax.vmap(gains)(x)
        # gain/constant tables are computed at ambient (f64-if-x64) precision
        # but STORED at c.dtype: step() mixes them with the f32 state, and an
        # f64 table would promote u_new to f64 (breaking the scan carry when
        # tests run under jax_enable_x64)
        self.phi = phi.astype(c.dtype)
        self.phi_prime = phip.astype(c.dtype)
        self.p = (phip - gamma * phi).astype(c.dtype)  # (M, 2)
        self.pB = (self.p @ B.astype(c.dtype))  # (M,)
        self.H = H.astype(c.dtype)
        self.B = B.astype(c.dtype)

        # equilibrium profile + IC (neuron_env.py:202-219)
        dist = scale * x - c.LSubS
        self.c_eq = (c.cInfty * (
            K_plus * jnp.exp(lam_plus * dist) + K_minus * jnp.exp(lam_minus * dist)
        )).astype(c.dtype)
        self.coefficient = ((H @ B) / c.D + gamma).astype(c.dtype)

        self._sensing_fn, self._obs_dim = self._make_sensing_fn()
        if noise_fn is None:
            # noise-free observation is a pure function of state: declare
            # observe_batch so batched rollouts carry state only and
            # recompute obs in-body (parallel/rollout)
            self.observe_batch = lambda state: jax.vmap(
                lambda uu, ll: self._observe(uu, ll, None)
            )(state.u, state.L)

    def _make_sensing_fn(self):
        """Resolve the sensing lambda matrix once at construction
        (``neuron_env.py:104-162``). Returns ``(fn(u, L) -> obs, obs_dim)``.
        Tip-relative reads are masked reductions (same reason as in step)."""
        c = self.config
        if c.control_type not in ("Neumann", "Dirchilet"):
            raise Exception(
                "Invalid control_type parameter. Please use 'Neumann' or "
                "'Dirchilet'. See documentation for details."
            )
        if c.sensing_loc == "full":
            return (lambda u, L: u), self.M
        idx = jnp.arange(self.M)

        def pick(vec, k):
            return jnp.where(idx == k, vec, 0.0).sum()

        dx = c.dtype(c.dx)
        if c.sensing_loc == "collocated":
            if c.control_type == "Neumann":
                # new_u[-1] = u[L-1] (neuron_env.py:113 over u[:LNew])
                return (lambda u, L: pick(u, L - 1)[None]), 1
            # Dirichlet control: (new_u[-1] - new_u[-2]) / dx (:140-142)
            return (
                lambda u, L: ((pick(u, L - 1) - pick(u, L - 2)) / dx)[None]
            ), 1
        if c.sensing_loc == "opposite":
            if c.sensing_type == "Neumann":
                return (lambda u, L: ((u[1] - u[0]) / dx)[None]), 1  # :118-120
            if c.sensing_type == "Dirchilet":
                return (lambda u, L: u[0][None]), 1  # :123
            raise Exception(
                "Invalid sensing_type parameter. Please use 'Neumann' or "
                "'Dirchilet'. See documentation for details."
            )
        raise Exception(
            "Invalid sensing_loc parameter. Please use 'full', 'collocated', "
            "or 'opposite'. See documentation for details."
        )

    @property
    def obs_dim(self) -> int:
        return self._obs_dim

    def _conversion(self, z1):
        """Physical length -> clamped grid index (neuron_env.py:367-373)."""
        c = self.config
        lt_code = (z1 + c.LSubS) / self.scale
        raw = jnp.round(lt_code / c.dx).astype(jnp.int32)
        return jnp.clip(raw, 1, self.M - 1)

    def init(self, key=None):
        c = self.config
        u0 = 2.0 * c.cInfty - self.c_eq
        Z0 = jnp.array([c.cInfty, c.LSubZero - c.LSubS], c.dtype)
        state = NeuronState(
            u=u0.astype(c.dtype),
            Z=Z0,
            L=self._conversion(Z0[1]),
            time_index=jnp.zeros((), c.dtype),
        )
        return state, self._observe(state.u, state.L, None)

    def _observe(self, u, L, key):
        obs = self._sensing_fn(u, L)
        # package noise convention (envs/common.py): noise_fn(obs, key),
        # applied only when a PRNG key is threaded through step(); the
        # Gymnasium adapter applies the reference's single-arg
        # sensing_noise_func on the host instead
        if self.noise_fn is not None and key is not None:
            obs = self.noise_fn(obs, key)
        return obs

    def _advance_once(self, u, Z, L, t_prev):
        """One dt of the moving-boundary physics (the former step body);
        returns ``(u', Z', L', t_stored, t_raw, control, tip_val,
        terminated, truncated)`` so ``step`` can loop it ``steps_per_call``
        times and the fused kernel (ops/neuron_interval) has an op-for-op
        XLA twin to be tested against."""
        c = self.config
        dt, dx = c.dtype(c.dt), c.dtype(c.dx)
        t = t_prev + dt

        lt = Z[1] + c.LSubS
        dxreal = dx * lt

        # All reads at the (dynamic) boundary index are masked reductions,
        # not u[L]-style indexing: a vmapped dynamic gather lowers to a TPU
        # gather op, while mask+sum stays a VPU multiply-reduce that fuses
        # with the rest of the step (same trick as brain_tumor.tumor_radius).
        idx = jnp.arange(self.M)
        pick = lambda vec, k: jnp.where(idx == k, vec, 0.0).sum()

        # cone ODE update using the OLD boundary index (neuron_env.py:288-293)
        ux_tip = (
            3.0 * pick(u, L) - 4.0 * pick(u, L - 1) + pick(u, L - 2)
        ) / (2.0 * dxreal)
        Z0_new = (self.aTilde1 * Z[0] - self.beta_c * ux_tip) * dt + Z[0]
        Z1_new = c.RSubG * Z[0] * dt + Z[1]
        Z_new = jnp.stack([Z0_new, Z1_new])
        L_new = self._conversion(Z1_new)

        # backstepping control U(t): masked trapezoid over [0, L_new] (:302-307)
        tip_new = idx == L_new
        inner = jnp.where((idx >= 1) & (idx < L_new), self.pB * u, 0.0).sum() * dxreal
        middle = (
            dxreal * self.pB[0] * u[0] / 2.0
            + inner
            + dxreal / 2.0
            * jnp.where(tip_new, self.pB * u, 0.0).sum()
        ) / c.D
        p_tip = jnp.where(tip_new[:, None], self.p, 0.0).sum(0)  # p[L_new], (2,)
        control = lt * (self.coefficient * u[0] - middle + p_tip @ Z_new)

        # left boundary via fictitious point (:313-314)
        ufic = u[1] - control * dxreal * 2.0
        u0_new = (
            (c.D / dxreal**2) * (u[1] - 2.0 * u[0] + ufic)
            - c.a / (2.0 * dxreal) * (u[1] - ufic)
            - c.g * u[0]
        ) * dt + u[0]

        # interior update, vectorized over 1 <= n < L_new (:317-320)
        up1, um1 = jnp.roll(u, -1), jnp.roll(u, 1)
        uxx = (up1 - 2.0 * u + um1) / dxreal**2
        diff = up1 - um1
        adv = ((idx - 1) / lt) * (c.RSubG * Z[0]) * diff / 2.0
        interior = u + dt * (c.D * uxx + adv - c.a * diff / dxreal / 2.0 - c.g * u)

        tip_val = self.H @ Z_new
        u_new = jnp.where((idx >= 1) & (idx < L_new), interior, u)
        u_new = jnp.where(idx == 0, u0_new, u_new)
        u_new = jnp.where(tip_new, tip_val, u_new)  # tip BC (:322)

        terminated = t >= c.nt  # quirk preserved (:347)
        truncated = jnp.logical_and(
            bool(c.limit_pde_state_size),
            jnp.linalg.norm(u_new) >= c.max_state_value,
        )
        t_stored = jnp.where(terminated, 0.0, t).astype(c.dtype)
        return (u_new, Z_new, L_new, t_stored, t, control, tip_val,
                terminated, truncated)

    def step(self, state: NeuronState, action=None, key=None):
        """Advance ``steps_per_call`` dt-steps (default 1 = reference
        parity). ``action`` is ignored — the backstepping control is
        embedded (reference ``step()`` takes no argument, neuron_env.py:261).
        With K>1 the observation/flags describe the state AFTER the K-step
        block (reward and per-dt truncation are rejected at construction)."""
        c = self.config
        K = int(getattr(c, "steps_per_call", 1))
        u, Z, L, t = state.u, state.Z, state.L, state.time_index
        track = K > 1 and self.reward is not None
        prev_u = ring = None
        if track:
            W = int(getattr(self.reward, "ring_requirement", 1))
            ring_ord = str(getattr(self.reward, "ring_ord", "2"))
            nrm = self._ring_norm_fn(ring_ord)
            ring = jnp.zeros((W,), c.dtype)

            def body(_, carry):
                uu, zz, ll, tt, rg = carry
                uu, zz, ll, tt = self._advance_once(uu, zz, ll, tt)[:4]
                rg = jnp.concatenate([rg[1:], nrm(uu)[None]])
                return uu, zz, ll, tt, rg

            u, Z, L, t, ring = jax.lax.fori_loop(
                0, K - 1, body, (u, Z, L, t, ring)
            )
            prev_u = u  # the row before the final dt-step
        elif K > 1:
            def body(_, carry):
                uu, zz, ll, tt = carry
                uu, zz, ll, tt = self._advance_once(uu, zz, ll, tt)[:4]
                return uu, zz, ll, tt

            u, Z, L, t = jax.lax.fori_loop(0, K - 1, body, (u, Z, L, t))
        (u_new, Z_new, L_new, t_stored, t_raw, control, tip_val,
         terminated, truncated) = self._advance_once(u, Z, L, t)
        new_state = NeuronState(u=u_new, Z=Z_new, L=L_new,
                                time_index=t_stored)

        reward = jnp.zeros((), c.dtype)
        if track:
            ring = jnp.concatenate([ring[1:], nrm(u_new)[None]])
            reward = self.reward(self._interval_ctx(
                u_new, t_raw, terminated, truncated, tip_val, ring,
                ring_ord, prev_u,
                extras={"Z": Z_new, "L": L_new, "control": control},
            ))
        elif self.reward is not None:
            ctx = RewardCtx(
                u=u_new,
                time_index=t_raw,
                executed=jnp.asarray(1, jnp.int32),
                terminated=terminated,
                truncated=truncated,
                action=tip_val,  # == u_new[L_new], just written above
                norms=jnp.linalg.norm(u_new)[None],
                bsum=jnp.zeros((), c.dtype),
                ring=1,
                extras={"Z": Z_new, "L": L_new, "control": control},
            )
            reward = self.reward(ctx)

        return new_state, StepOut(
            obs=self._observe(u_new, L_new, key),
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info={"L": L_new, "Z": Z_new, "control": control},
        )

    # -- fused K-step Pallas path ---------------------------------------------

    def _ring_norm_fn(self, ring_ord: str):
        """Per-row norm in a reward's declared ord for the trailing window."""
        if ring_ord == "1":
            return lambda x: jnp.sum(jnp.abs(x))
        if ring_ord == "inf":
            return lambda x: jnp.max(jnp.abs(x))
        return lambda x: jnp.sqrt(jnp.sum(jnp.square(x)))

    def _interval_ctx(self, u_new, t_raw, terminated, truncated, tip_val,
                      ring, ring_ord, prev_u, extras):
        """RewardCtx for the once-per-K-step-call reward contract: the
        trailing per-dt norm window rides ``norms`` (L2) or ``aux_norms``
        (the reward's declared L1/L∞ ord), prev_u serves differential
        rewards. Shared by the XLA loop and the fused-kernel path so the
        two cannot drift.

        ``time_index`` is the DT-STEP COUNT (t_raw / dt, rounded), not the
        env state's raw seconds accumulator: rewards interpret time_index
        as a step index (NormReward's t-horizon divides its window average
        by ``min(time_index, H)`` and differential compares ``> 0``) — the
        seconds value (5e-6/step) would make the count fractional and
        ignore the ring for the first ~10^5 calls (review finding). The
        env STATE keeps the reference's seconds quirk untouched."""
        c = self.config
        W = ring.shape[-1]
        extras = dict(extras)
        if prev_u is not None:
            extras["prev_u"] = prev_u
        step_index = jnp.round(t_raw / c.dt).astype(jnp.int32)
        return RewardCtx(
            u=u_new,
            time_index=step_index,
            executed=jnp.asarray(c.steps_per_call, jnp.int32),
            terminated=terminated,
            truncated=truncated,
            action=tip_val,
            norms=ring if ring_ord == "2" else jnp.zeros((1,), c.dtype),
            bsum=jnp.zeros((), c.dtype),
            ring=W,
            extras=extras,
            aux_norms=ring if ring_ord != "2" else None,
        )

    def _kernel_eligible(self) -> bool:
        """The fused K-step kernel (ops/neuron_interval) covers: float32
        (Mosaic has no f64), no sensing noise, no per-dt truncation, and a
        TPU-family backend (interpret-mode CPU when forced). Rewards
        (round 5): reward=None at any K, or the stock NormReward at K>1 —
        the kernel evaluates the per-dt norm ring in the reward's ord
        in-kernel; other rewards keep the vmap path (they may read per-dt
        extras like 'control' that the K-step block does not surface)."""
        import jax as _jax

        from pdecontrolgym_tpu.rewards.norm import NormReward

        c = self.config
        backend = getattr(c, "backend", "auto")
        if backend == "xla":
            return False
        K = int(getattr(c, "steps_per_call", 1))
        reward_ok = self.reward is None or (
            K > 1 and type(self.reward) is NormReward
        )
        eligible = (
            jnp.dtype(c.dtype) == jnp.float32
            and reward_ok
            and self.noise_fn is None
            and not c.limit_pde_state_size
        )
        if backend == "pallas":
            if not eligible:
                raise ValueError(
                    "backend='pallas' needs float32, noise_fn=None, "
                    "limit_pde_state_size=False and reward=None (any K) "
                    "or the stock NormReward (K>1)"
                )
            return True
        return eligible and _jax.default_backend() in ("tpu", "axon")

    def _get_interval_fn(self):
        fn = getattr(self, "_interval_fn", None)
        if fn is None:
            import jax as _jax

            if not self._kernel_eligible():
                self._interval_fn = False
                return False
            from pdecontrolgym_tpu.ops.neuron_interval import (
                make_neuron_interval_fn,
            )

            kw = {}
            if self.reward is not None:
                kw = dict(
                    window=int(getattr(self.reward, "ring_requirement", 1)),
                    ring_ord=str(getattr(self.reward, "ring_ord", "2")),
                    need_prev=bool(
                        getattr(self.reward, "needs_prev_row", False)
                    ),
                )
            fn = make_neuron_interval_fn(
                self,
                steps=int(getattr(self.config, "steps_per_call", 1)),
                interpret=_jax.default_backend() == "cpu",
                **kw,
            )
            self._interval_fn = fn
        return fn

    def step_batch(self, state: NeuronState, actions=None):
        """Batched step: the fused VMEM K-step kernel when eligible
        (``_kernel_eligible``), else ``vmap(step)``. The kernel path reports
        the same ``L``/``Z`` diagnostics as the vmap path (both are kernel
        outputs); only ``control`` is omitted — it is a per-dt intermediate
        the K-step block does not surface."""
        fn = self._get_interval_fn()
        if fn is False:
            return jax.vmap(lambda s, a: self.step(s, a))(state, actions)
        outs = fn(state.u, state.Z, state.L, state.time_index)
        u, Z, L, t, done = outs[:5]
        new_state = NeuronState(u=u, Z=Z, L=L, time_index=t)
        obs = jax.vmap(lambda uu, ll: self._observe(uu, ll, None))(u, L)
        reward = jnp.zeros((u.shape[0],), self.config.dtype)
        if self.reward is not None:
            # kernel-computed trailing norm ring (+ prev_u for differential
            # rewards); same ctx builder as the XLA K-step path
            # (_interval_ctx) so the two cannot drift. t is the post-quirk
            # stored time; recover the raw accumulator for the ctx (the
            # reset fires only at t >= nt, unreachable in any real config —
            # module docstring quirk note).
            ring = outs[5]
            prev_u = outs[6] if len(outs) > 6 else None
            ring_ord = str(getattr(self.reward, "ring_ord", "2"))
            t_raw = jnp.where(done, float(self.config.nt), t)
            tip_val = self.H[0] * Z[:, 0] + self.H[1] * Z[:, 1]  # u[L]
            no_trunc = jnp.zeros((), jnp.bool_)

            def one_ctx(uu, tr, dn, tv, rg, zz, ll, pu=None):
                return self._interval_ctx(
                    uu, tr, dn, no_trunc, tv, rg, ring_ord, pu,
                    extras={"Z": zz, "L": ll},
                )

            if prev_u is None:
                ctx = jax.vmap(one_ctx)(u, t_raw, done, tip_val, ring, Z, L)
            else:
                ctx = jax.vmap(one_ctx)(
                    u, t_raw, done, tip_val, ring, Z, L, prev_u
                )
            reward = jax.vmap(self.reward)(ctx)
        return new_state, StepOut(
            obs=obs,
            reward=reward,
            terminated=done,
            truncated=jnp.zeros_like(done),
            info={"L": L, "Z": Z},
        )
