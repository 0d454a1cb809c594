"""Shared machinery for the 1D boundary-controlled envs (transport, reaction-
diffusion, Burgers).

The reference's 1D envs share an identical shape (``hyperbolic.py:126-169``,
``parabolic.py:126-164``): each agent action is zero-order-held for
``control_sample_rate/dt`` PDE sub-steps, the episode terminates at ``nt-1``
rows and truncates when the L2 norm exceeds ``max_state_value``. Here that hot
sub-step loop is a ``lax.scan`` over a pure row update supplied by each env,
with episode ends masked (frozen state) so batches of envs run in lockstep.

Per-sub-step L2 norms and the running boundary |u[t,-1]| sum are accumulated
inside the scan — these are the O(1) statistics that replace the reference's
full-history reward indexing (see ``rewards/tuned.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from pdecontrolgym_tpu.core.base import FunctionalEnv, RewardCtx, StepOut, roll_ring
from pdecontrolgym_tpu.core.sensing import make_control_fn, make_sensing_fn


@dataclasses.dataclass(frozen=True)
class Boundary1DConfig:
    """Static configuration shared by the 1D boundary-control envs.

    Parameter names match the reference kwargs API (``base_env_1d.py:20``,
    ``hyperbolic.py:25-35``) so users can port configs verbatim.
    """

    T: float = 5.0
    dt: float = 1e-4
    X: float = 1.0
    dx: float = 1e-2
    sensing_loc: str = "full"
    control_type: str = "Dirchilet"
    sensing_type: str = "Dirchilet"
    limit_pde_state_size: bool = False
    max_state_value: float = 1e10
    max_control_value: float = 20.0
    control_sample_rate: float = 0.1
    normalize: bool = False
    dtype: Any = jnp.float32
    backend: str = "xla"  # "xla" (lax.scan) or "pallas" (fused VMEM kernel)
    scan_unroll: int = 8

    @property
    def nt(self) -> int:
        # base_env_1d.py:23
        return int(round(self.T / self.dt) + 1)

    @property
    def nx(self) -> int:
        # base_env_1d.py:24
        return int(round(self.X / self.dx))

    @property
    def sample_rate(self) -> int:
        # hyperbolic.py:137
        return int(round(self.control_sample_rate / self.dt))


@struct.dataclass
class Boundary1DState:
    u: jnp.ndarray  # (state_dim,) current PDE row
    beta: jnp.ndarray  # (state_dim,) plant parameter for this episode
    time_index: jnp.ndarray  # int32 scalar, current row index
    norm_ring: jnp.ndarray  # (ring,) trailing per-row L2 norms
    bsum: jnp.ndarray  # running sum of |u[t, -1]|
    prev_u: Optional[jnp.ndarray] = None  # previous row (only if reward needs it)


class Boundary1DEnv(FunctionalEnv):
    """Functional base for the 1D boundary-control family.

    Subclasses define:

    - ``state_dim``: length of the PDE row (nx, or nx+1 with a ghost point).
    - ``_advance(u_prev, boundary_fn, control) -> (u_new, boundary_value)``:
      one explicit sub-step, including the boundary write ordering quirks of
      the scheme being mirrored.
    - ``default_ic(key) -> (u0, beta)``: episode initial condition sampler.
    """

    def __init__(
        self,
        config: Boundary1DConfig,
        reward,
        ic_sampler: Optional[Callable] = None,
        noise_fn: Optional[Callable] = None,
    ):
        self.config = config
        self.reward = reward
        self.ic_sampler = ic_sampler
        self.noise_fn = noise_fn
        self.ring = max(int(getattr(reward, "ring_requirement", 1)), 1)
        self._needs_prev = bool(getattr(reward, "needs_prev_row", False))
        self._control_fn = make_control_fn(
            config.control_type, config.normalize, config.max_control_value, config.dx
        )
        self._sensing_fn, self._obs_dim = make_sensing_fn(
            config.sensing_loc,
            config.control_type,
            config.sensing_type,
            config.dx,
            left_dirichlet_fixed_zero=self.left_dirichlet_fixed_zero,
        )

    # -- subclass surface ----------------------------------------------------

    left_dirichlet_fixed_zero: bool = False

    @property
    def state_dim(self) -> int:
        return self.config.nx

    def _advance(self, u_prev, beta, control):
        raise NotImplementedError

    def default_ic(self, key):
        raise NotImplementedError

    # -- protocol ------------------------------------------------------------

    @property
    def obs_dim(self) -> int:
        return self.state_dim if self._obs_dim == -1 else self._obs_dim

    @property
    def action_dim(self) -> int:
        return 1

    def init(self, key):
        if self.ic_sampler is not None:
            u0, beta = self.ic_sampler(key)
        else:
            u0, beta = self.default_ic(key)
        return self.init_from(u0, beta)

    def init_from(self, u0, beta):
        """Build state from explicit initial condition + plant parameter
        (mirrors ``hyperbolic.py:207-219`` where user callables supply both)."""
        c = self.config
        u0 = jnp.asarray(u0, c.dtype)
        beta = jnp.asarray(beta, c.dtype)
        n0 = jnp.linalg.norm(u0)
        state = Boundary1DState(
            u=u0,
            beta=beta,
            time_index=jnp.asarray(0, jnp.int32),
            norm_ring=jnp.full((self.ring,), n0, c.dtype),
            bsum=jnp.abs(u0[-1]).astype(c.dtype),
            prev_u=u0 if self._needs_prev else None,
        )
        return state, self._observe(state, key=None)

    def _observe(self, state, key):
        obs = self._sensing_fn(state.u)
        if self.noise_fn is not None and key is not None:
            obs = self.noise_fn(obs, key)
        return obs

    def step(self, state, action, key=None):
        c = self.config
        S = c.sample_rate
        nt = c.nt
        control = jnp.asarray(action, c.dtype).reshape(())

        # prev_u must be the row one SUB-step before the final row
        # (NormReward differential indexes uVec[time_index-1], a sub-step row).
        prev0 = state.prev_u if self._needs_prev else state.u[:0]

        def substep(carry, _):
            u, up, t, bsum = carry
            active = t < nt - 1
            u_new, boundary = self._advance(u, state.beta, control)
            u_new = jnp.where(active, u_new, u)
            if self._needs_prev:
                up = jnp.where(active, u, up)
            t = jnp.where(active, t + 1, t)
            bsum = jnp.where(active, bsum + jnp.abs(boundary), bsum)
            return (u_new, up, t, bsum), jnp.linalg.norm(u_new)

        (u, prev_u, t, bsum), norms = jax.lax.scan(
            substep,
            (state.u, prev0, state.time_index, state.bsum),
            None,
            length=S,
            unroll=min(c.scan_unroll, S),
        )
        executed = t - state.time_index
        all_n = jnp.concatenate([state.norm_ring, norms])
        cur_norm = all_n[self.ring + executed - 1]

        terminated = t >= nt - 1  # hyperbolic.py:171-180
        truncated = jnp.logical_and(  # hyperbolic.py:182-194
            bool(c.limit_pde_state_size), cur_norm >= c.max_state_value
        )

        ctx = RewardCtx(
            u=u,
            time_index=t,
            executed=executed,
            terminated=terminated,
            truncated=truncated,
            action=u[-1],
            norms=all_n,
            bsum=bsum,
            ring=self.ring,
            extras={"prev_u": prev_u} if self._needs_prev else None,
        )
        reward = self.reward(ctx)

        new_state = state.replace(
            u=u,
            time_index=t,
            norm_ring=roll_ring(state.norm_ring, norms, executed),
            bsum=bsum,
            prev_u=prev_u if self._needs_prev else None,
        )
        out = StepOut(
            obs=self._observe(new_state, key),
            reward=reward,
            terminated=terminated,
            truncated=truncated,
            info={},
        )
        return new_state, out
