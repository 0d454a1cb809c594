"""2D incompressible Navier-Stokes with per-edge boundary control.

Chorin projection scheme with parity to ``src/environments2d/navier_stokes2D.py``:

1. explicit predictor ``u* = u + dt(−u·∇u + ν∇²u)`` (:137-138),
2. per-edge boundary application in the fixed order lower/upper/left/right ×
   (u, v), each edge Neumann (copy inner neighbor) / Dirichlet (zero) /
   Controllable (the action) (:68-91),
3. pressure-Poisson solve by fixed-iteration Jacobi (:94-116),
4. corrector ``u' = u* − dt/ρ·∇p`` + boundary re-application (:144-146).

Grid conventions copied from ``base_env_2d.py:27-36``: ``nt = round(T/dt)``,
``nx = round(X/dx + 1)``; fields are indexed ``[y, x]`` (the reference's
"x" derivative varies the last axis); the episode runs nt−1 steps.

The construction-time diffusion stability guard (:56-58) is preserved,
including its message. The ``U_ref``/``action_ref`` tracking targets live on
device as env constants.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from pdecontrolgym_tpu.core.base import FunctionalEnv, RewardCtx, StepOut
from pdecontrolgym_tpu.ops.poisson2d import (
    ddx,
    ddy,
    direct_pressure,
    direct_pressure_setup,
    jacobi_pressure,
    jacobi_pressure_flat,
    laplacian,
    matpow_pressure,
    matpow_pressure_setup,
)

_EDGES = ("lower", "upper", "left", "right")
_CONDITIONS = ("Neumann", "Dirchilet", "Dirichlet", "Controllable")


@dataclasses.dataclass(frozen=True)
class NavierStokesConfig:
    T: float = 0.2
    dt: float = 1e-3
    X: float = 1.0
    dx: float = 0.05
    Y: float = 1.0
    dy: float = 0.05
    action_dim: int = 1
    viscosity: float = 0.1
    density: float = 1.0
    maximum_pressure_iteration: int = 2000
    stable_factor: float = 0.5
    normalize: bool = False
    dtype: Any = jnp.float64
    pressure_layout: str = "grid"  # "grid" (parity) | "flat" (lane-flattened)
    # "jacobi": the reference's fixed-iteration sweep (parity at 2000 iters).
    # "matpow": the SAME affine map collapsed to two precomputed dense
    # matmuls (ops/poisson2d.matpow_pressure) — reproduces the reference's
    # finite-iteration truncation error to ~1e-11 at f64, at MXU speed;
    # (ny·nx)² memory, so reference-sized grids only.
    # "direct": exact spectral solve of the same fixed point via DCT-II
    # matmuls (ops/poisson2d.direct_pressure) — the fast mode; it ignores
    # maximum_pressure_iteration and is MORE accurate than any finite sweep.
    pressure_solver: str = "jacobi"
    # step_batch's tracking-target lookup. True (default): ONE shared
    # U_ref[t] slice for the whole batch — NS batches are always
    # time-lockstep through the public APIs (fixed-length episodes that never
    # truncate + batched init/autoreset), and the runtime lockstep-check cond
    # costs 13% end-to-end on the current XLA (841K vs 953K env-steps/s).
    # False: runtime `(t == t[0]).all()` cond falling back to a per-env
    # gather — only needed for hand-built batches with mixed time indices.
    lockstep_targets: bool = True
    # Batched-step backend. "auto": fuse the WHOLE projection step
    # (predictor → boundary → spectral pressure → corrector → boundary) into
    # one Pallas kernel (ops/ns_fused) when eligible — pressure_solver
    # "direct", float32, scalar action, TPU — which removes the ~dozen
    # (B, ny, nx) HBM round trips the XLA path pays per step (measured 1.45x
    # at 2048 envs × 64×64, docs/PERFORMANCE.md). "xla": always the jnp path.
    # "fused": force the kernel (interpret-mode on CPU; raises if the config
    # is ineligible). step() (unbatched) always uses the XLA path.
    step_backend: str = "auto"
    # Carried field layout when the fused kernel is active. "auto": fold
    # r = 128//nx rows into the lane axis ((ny, nx) → (ny//r, nx·r), see
    # ops/ns_fused.pack_field) whenever the grid folds evenly — f32 (8, 128)
    # tiling pads nx<128 lanes, so the logical layout pays ~2x the HBM↔VMEM
    # DMA on a kernel that is ~70% DMA-bound. State fields (u, v, p) are then
    # PACKED between steps; observations, step() and every public surface
    # stay in the logical (ny, nx) layout (unpacked lazily — XLA drops the
    # unpack when nothing consumes it, e.g. open-loop rollouts).
    # "auto" packs ONLY under the stock NSReward: batched rewards consume
    # frames in the carried layout, which is safe exactly because NSReward's
    # tracking term is a permutation-invariant elementwise sum — a custom
    # reward_class with spatial structure (boundary weights, gradients,
    # slicing) would silently compute wrong values on packed frames (review
    # finding). "force": pack regardless — only for custom rewards that are
    # themselves permutation-invariant over grid cells. "off": logical
    # layout everywhere.
    packed_layout: str = "auto"
    # MXU precision for the fused kernel's four spectral matmuls. "highest"
    # (default): full-f32 passes, bit-comparable to the XLA twin. "default":
    # the MXU's native mixed-precision pass — measured ~24% of the 64x64
    # step time back at ~0.1% relative field drift over a 200-step episode
    # (docs/PERFORMANCE.md); opt-in, never auto-picked. XLA path ignores it.
    spectral_precision: str = "highest"
    # per-edge (u_condition, v_condition) ordered (lower, upper, left, right);
    # default mirrors the examples' dict: controllable lid at the upper edge
    # (``NS2Dppo.py:21-26``). Use freeze_boundary_condition() to convert a dict.
    boundary_condition: tuple = (
        ("Dirchilet", "Dirchilet"),
        ("Controllable", "Dirchilet"),
        ("Dirchilet", "Dirchilet"),
        ("Dirchilet", "Dirchilet"),
    )

    @property
    def nt(self) -> int:
        return int(round(self.T / self.dt))  # base_env_2d.py:27 (no +1)

    @property
    def nx(self) -> int:
        return int(round(self.X / self.dx + 1))

    @property
    def ny(self) -> int:
        return int(round(self.Y / self.dy + 1))


def make_lid_target(config: "NavierStokesConfig", lid: float = 2.0,
                    u0=None, v0=None, p0=None):
    """Roll out the env under a constant lid velocity and return the
    ``(nt, ny, nx, 2)`` tracking trajectory plus the matching action sequence
    — the engine-generated equivalent of the reference's ``target.npz``
    (``examples/NavierStokes/NS2Dppo.py:33-35``). Shared by the PPO/target
    examples so the target convention lives in exactly one place."""
    from pdecontrolgym_tpu.rewards.ns import NSReward

    nt, n = config.nt, config.nx
    shape = (config.ny, config.nx)
    zeros = jnp.zeros(shape, config.dtype)
    u0 = zeros if u0 is None else jnp.asarray(u0, config.dtype)
    v0 = zeros if v0 is None else jnp.asarray(v0, config.dtype)
    p0 = zeros if p0 is None else jnp.asarray(p0, config.dtype)
    env = NavierStokesEnv(
        config, NSReward(0.1),
        jnp.zeros((nt, n, n, 2), config.dtype), jnp.zeros(nt, config.dtype),
    )
    state, obs0 = env.init_from(u0, v0, p0)

    def body(state, _):
        state, out = env.step(state, jnp.asarray([lid], config.dtype))
        return state, out.obs

    _, frames = jax.lax.scan(body, state, None, length=nt - 1)
    U_ref = jnp.concatenate([obs0[None], frames])
    return U_ref, lid * jnp.ones(nt, config.dtype)


def freeze_boundary_condition(bc: dict) -> tuple:
    """Normalize the reference's dict format into a hashable config tuple."""
    out = []
    for pos in _EDGES:
        conds = tuple(bc[pos])
        for c in conds:
            if c not in _CONDITIONS:
                raise ValueError(f"Invalid boundary condition {c!r} at {pos!r}")
        out.append(conds)
    return tuple(out)


@struct.dataclass
class NavierStokesState:
    u: jnp.ndarray  # (ny, nx) x-velocity  [row=y, col=x like the reference]
    v: jnp.ndarray
    p: jnp.ndarray
    time_index: jnp.ndarray  # int32


class NavierStokesEnv(FunctionalEnv):
    def __init__(
        self,
        config: NavierStokesConfig,
        reward,
        U_ref,
        action_ref,
        ic_sampler: Optional[Callable] = None,
    ):
        c = config
        max_t = 0.5 * min(c.dx, c.dy) ** 2 / c.viscosity
        if c.dt > c.stable_factor * max_t:
            raise RuntimeError("Stability is not guarenteed")  # sic, :58
        self.config = c
        self.reward = reward
        self.U_ref = jnp.asarray(U_ref, c.dtype)
        self.action_ref = jnp.asarray(action_ref, c.dtype)
        self.ic_sampler = ic_sampler
        solver = getattr(c, "pressure_solver", "jacobi")
        self._poisson_basis = (
            direct_pressure_setup(c.ny, c.nx, c.dtype) if solver == "direct" else None
        )
        self._matpow_mats = (
            matpow_pressure_setup(
                c.ny, c.nx, c.dx, c.dy, c.maximum_pressure_iteration, c.dtype
            )
            if solver == "matpow"
            else None
        )
        self._pack_r = 1
        self._fused_track = False
        self._fused_step = self._build_fused_step()
        self._U_ref_carried = self._pack_ref(self.U_ref)
        if self._pack_r > 1:
            self.observe_batch = self._observe_batch

    def _build_fused_step(self):
        c = self.config
        backend = getattr(c, "step_backend", "auto")
        eligible = (
            getattr(c, "pressure_solver", "jacobi") == "direct"
            and jnp.dtype(c.dtype) == jnp.float32
            and c.action_dim == 1
        )
        if backend == "xla" or (backend == "auto" and not eligible):
            return None
        if backend == "fused" and not eligible:
            raise ValueError(
                "step_backend='fused' needs pressure_solver='direct', "
                "float32 and action_dim=1"
            )
        platform = jax.default_backend()
        on_cpu = platform == "cpu"
        if backend == "auto" and platform not in ("tpu", "axon"):
            # Mosaic kernels only exist for TPU-family backends (and
            # interpret-mode CPU); on GPU or anything else "auto" must fall
            # back to the XLA path instead of failing to compile. Only
            # "fused" forces the kernel.
            return None
        from pdecontrolgym_tpu.ops.ns_fused import make_fused_ns_step, pick_pack_r
        from pdecontrolgym_tpu.rewards.ns import NSReward

        layout = getattr(c, "packed_layout", "auto")
        if layout == "force" or (
            layout == "auto" and type(self.reward) is NSReward
        ):
            # "auto" packs only under the stock NSReward: batched rewards see
            # carried-layout frames, which is only safe for permutation-
            # invariant rewards (see the packed_layout config comment)
            self._pack_r = pick_pack_r(c.ny, c.nx)
        # When the reward is the stock NSReward and batches are lockstep,
        # the kernel also reduces the tracking term Σ(U−U_ref[t])² in VMEM
        # on the just-computed fields (the XLA reduce re-read both (B,·,·)
        # fields from HBM every step); step_batch then assembles the reward
        # from the per-env sums.
        self._fused_track = (
            type(self.reward) is NSReward
            and getattr(c, "lockstep_targets", True)
        )
        fused = make_fused_ns_step(
            ny=c.ny, nx=c.nx, dx=c.dx, dy=c.dy, dt=c.dt,
            viscosity=c.viscosity, density=c.density,
            boundary_condition=c.boundary_condition, dtype=jnp.float32,
            pack_r=self._pack_r,
            track_ref=self._fused_track,
            spectral_precision=getattr(c, "spectral_precision", "highest"),
            interpret=on_cpu,
        )
        # Mosaic kernels have no autodiff rule; without this wrapper
        # jax.grad through a batched direct+f32 step would raise where the
        # XLA path differentiates. Forward = the kernel (parity-tested vs
        # _projection); backward = the VJP of the batched XLA projection
        # lifted to the carried layout (pack/unpack are permutations, so
        # their transposes are exact; direct_pressure ignores its p0
        # argument, so zeros stand in for the previous pressure).
        if self._fused_track:

            def _xla_twin(u, v, a, uref, vref):
                uu, vv = self._unpack(u), self._unpack(v)
                un, vn, pn = self._projection(uu, vv, jnp.zeros_like(uu), a)
                up_, vp_ = self._pack(un), self._pack(vn)
                ts = (jnp.sum(jnp.square(up_ - uref))
                      + jnp.sum(jnp.square(vp_ - vref)))
                return up_, vp_, self._pack(pn), ts[None]

            xla_batched = jax.vmap(_xla_twin, in_axes=(0, 0, 0, None, None))

            @jax.custom_vjp
            def fused_step(u, v, act, uref, vref):
                return fused(u, v, act, uref, vref)

            def _fwd(u, v, act, uref, vref):
                return fused(u, v, act, uref, vref), (u, v, act, uref, vref)

            def _bwd(residuals, cotangents):
                _, vjp_fn = jax.vjp(xla_batched, *residuals)
                return vjp_fn(tuple(cotangents))

            fused_step.defvjp(_fwd, _bwd)
            return fused_step

        def _xla_twin(u, v, a):
            uu, vv = self._unpack(u), self._unpack(v)
            un, vn, pn = self._projection(uu, vv, jnp.zeros_like(uu), a)
            return self._pack(un), self._pack(vn), self._pack(pn)

        xla_batched = jax.vmap(_xla_twin)

        @jax.custom_vjp
        def fused_step(u, v, act):
            return fused(u, v, act)

        def _fwd(u, v, act):
            return fused(u, v, act), (u, v, act)

        def _bwd(residuals, cotangents):
            _, vjp_fn = jax.vjp(xla_batched, *residuals)
            return vjp_fn(cotangents)

        fused_step.defvjp(_fwd, _bwd)
        return fused_step

    # -- carried (packed) layout helpers --------------------------------------

    def _pack(self, f):
        """Logical (…, ny, nx) → carried layout (no-op unless packed)."""
        from pdecontrolgym_tpu.ops.ns_fused import pack_field

        return pack_field(f, self._pack_r)

    def _unpack(self, f):
        """Carried layout → logical (…, ny, nx) (no-op unless packed)."""
        from pdecontrolgym_tpu.ops.ns_fused import unpack_field

        return unpack_field(f, self._pack_r)

    def _pack_ref(self, U_ref):
        """Tracking target in the carried layout ((nt, m, L, 2) when packed):
        NSReward's tracking term is a permutation-invariant elementwise sum,
        so rewards are computed in the carried layout without unpacking."""
        if self._pack_r == 1:
            return U_ref
        return jnp.stack(
            [self._pack(U_ref[..., 0]), self._pack(U_ref[..., 1])], axis=-1
        )

    @property
    def fixed_episode_length(self):
        """Episodes ALWAYS run exactly nt−1 steps (terminate at t ≥ nt−1,
        never truncate — ``navier_stokes2D.py:154-157`` returns
        ``truncated=False`` unconditionally). Lets ``parallel/rollout``
        drop the per-step masked autoreset for lockstep batches."""
        return self.config.nt - 1

    @property
    def obs_shape(self):
        return (self.config.nx, self.config.ny, 2)

    @property
    def action_dim(self):
        return self.config.action_dim

    # -- boundary application -------------------------------------------------

    def _apply_boundary(self, u, v, action):
        """Static unroll of the reference's edge loop (:76-91); write order
        lower, upper, left, right — replicated so corner overwrites match.

        Implemented as masked SELECTS (the fused kernel's form,
        ops/ns_fused._apply_bc) rather than sequential ``.at[edge].set``
        writes: each dynamic-update-slice materialized the full batched
        field — the profiler showed the 8 edge writes per application
        costing a third of the matpow parity step (round 5). The where
        chain applies in the same order, so corner overwrites are
        identical, and Neumann edges read the CURRENT field's inner
        neighbor exactly like the write form did."""
        c = self.config
        ny, nx = u.shape[-2], u.shape[-1]
        act = jnp.asarray(action, c.dtype).reshape(-1)
        if act.shape[0] == 1:
            a_row = a_col = act[0]  # scalar broadcast like ref
        else:
            # vector controls lie along the edge: (nx,) rows for
            # lower/upper, (ny,) columns for left/right
            a_row, a_col = act, act[:, None]
        row = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (ny, nx), 1)
        edges = {
            "lower": row == 0, "upper": row == ny - 1,
            "left": col == 0, "right": col == nx - 1,
        }

        def shift_y(f, k):
            z = jnp.zeros(f.shape[:-2] + (1, f.shape[-1]), f.dtype)
            if k == 1:
                return jnp.concatenate([f[..., 1:, :], z], axis=-2)
            return jnp.concatenate([z, f[..., :-1, :]], axis=-2)

        def shift_x(f, k):
            z = jnp.zeros(f.shape[:-1] + (1,), f.dtype)
            if k == 1:
                return jnp.concatenate([f[..., 1:], z], axis=-1)
            return jnp.concatenate([z, f[..., :-1]], axis=-1)

        neighbor = {
            "lower": lambda f: shift_y(f, 1),
            "upper": lambda f: shift_y(f, -1),
            "left": lambda f: shift_x(f, 1),
            "right": lambda f: shift_x(f, -1),
        }
        avals = {"lower": a_row, "upper": a_row, "left": a_col,
                 "right": a_col}
        out = []
        for i, f in enumerate((u, v)):
            for pos, conds in zip(_EDGES, self.config.boundary_condition):
                cond = conds[i]
                if cond == "Neumann":
                    f = jnp.where(edges[pos], neighbor[pos](f), f)
                elif cond == "Controllable":
                    f = jnp.where(edges[pos], avals[pos], f)
                else:  # Dirichlet / "Dirchilet"
                    f = jnp.where(edges[pos], jnp.zeros_like(f), f)
            out.append(f)
        return out[0], out[1]

    # -- protocol -------------------------------------------------------------

    def default_ic(self, key):
        """u, v, p = independent U(−5,5) constants (``NS2Dppo.py:14-18``)."""
        c = self.config
        vals = jax.random.uniform(key, (3,), c.dtype, -5.0, 5.0)
        shape = (c.ny, c.nx)
        return (
            jnp.full(shape, vals[0], c.dtype),
            jnp.full(shape, vals[1], c.dtype),
            jnp.full(shape, vals[2], c.dtype),
        )

    def init(self, key):
        if self.ic_sampler is not None:
            u0, v0, p0 = self.ic_sampler(key)
        else:
            u0, v0, p0 = self.default_ic(key)
        return self.init_from(u0, v0, p0)

    def init_from(self, u0, v0, p0):
        """Build a fresh state from LOGICAL (ny, nx) fields (stored in the
        carried layout when the fused kernel packs, see ``packed_layout``)."""
        c = self.config
        state = NavierStokesState(
            u=self._pack(jnp.asarray(u0, c.dtype)),
            v=self._pack(jnp.asarray(v0, c.dtype)),
            p=self._pack(jnp.asarray(p0, c.dtype)),
            time_index=jnp.asarray(0, jnp.int32),
        )
        return state, self._observe(state)

    def _observe(self, state):
        # obs frame (nx, ny, 2) like U[time_index] (base_env_2d.py:50);
        # always LOGICAL layout — the unpack is a no-op when not packed, and
        # XLA drops it whenever nothing consumes the observation values
        return jnp.stack(
            [self._unpack(state.u), self._unpack(state.v)], axis=-1
        )

    def _observe_batch(self, state):
        """Batched pure-function-of-state observation (NS adds no sensing
        noise). Exposed as ``observe_batch`` ONLY in packed mode (see
        ``__init__``): ``parallel/rollout`` then carries ONLY the state
        between scan steps and recomputes obs in-body, so the (B, ny, nx, 2)
        unpack is dead code whenever the policy ignores observation values.
        Unpacked envs keep the carried-obs path, whose program graph is
        bit-identical to the generic rollout's."""
        return self._observe(state)

    def solve_pressure(self, u, v, p_prev, iters: Optional[int] = None):
        c = self.config
        if self._poisson_basis is not None:
            return direct_pressure(
                u, v, p_prev, c.dx, c.dy, c.dt, c.density, self._poisson_basis
            )
        if self._matpow_mats is not None and (
            iters is None or iters == c.maximum_pressure_iteration
        ):
            return matpow_pressure(
                u, v, p_prev, c.dx, c.dy, c.dt, c.density, self._matpow_mats
            )
        solver = (
            jacobi_pressure_flat
            if getattr(c, "pressure_layout", "grid") == "flat"
            else jacobi_pressure
        )
        return solver(
            u, v, p_prev, c.dx, c.dy, c.dt, c.density,
            iters if iters is not None else c.maximum_pressure_iteration,
        )

    def _projection(self, u, v, p, action):
        """One projection step of the physics: predictor → boundary →
        pressure → corrector → boundary (``navier_stokes2D.py:118-157``).
        Pure XLA; also serves as the differentiable twin of the fused Pallas
        kernel (its ``custom_vjp`` backward re-runs this)."""
        c = self.config
        nu, dt = c.viscosity, c.dt

        dudx, dudy = ddx(u, c.dx), ddy(u, c.dy)
        dvdx, dvdy = ddx(v, c.dx), ddy(v, c.dy)
        u_pred = u + dt * (-u * dudx - v * dudy + nu * laplacian(u, c.dx, c.dy))
        v_pred = v + dt * (-u * dvdx - v * dvdy + nu * laplacian(v, c.dx, c.dy))
        u_pred, v_pred = self._apply_boundary(u_pred, v_pred, action)

        pressure = self.solve_pressure(u_pred, v_pred, p)
        u_next = u_pred - dt / c.density * ddx(pressure, c.dx)
        v_next = v_pred - dt / c.density * ddy(pressure, c.dy)
        u_next, v_next = self._apply_boundary(u_next, v_next, action)
        return u_next, v_next, pressure

    def _advance(self, state: NavierStokesState, action):
        """Physics + bookkeeping; reward is applied separately so
        ``step_batch`` can share the tracking-target lookup. The XLA
        projection runs on logical fields (unpack/repack are no-ops unless
        the fused kernel packs the carried state)."""
        c = self.config
        u_next, v_next, pressure = self._projection(
            self._unpack(state.u), self._unpack(state.v),
            self._unpack(state.p), action
        )
        t = state.time_index + 1
        new_state = NavierStokesState(
            u=self._pack(u_next), v=self._pack(v_next),
            p=self._pack(pressure), time_index=t,
        )
        frame = jnp.stack([u_next, v_next], axis=-1)
        terminated = t >= c.nt - 1
        return new_state, frame, terminated, t

    def _advance_batch(self, state: NavierStokesState, actions):
        """Batched physics: the fused Pallas step when built (see
        ``step_backend``), else ``vmap`` over the XLA ``_advance``. Returns
        frames in the CARRIED layout (packed when the kernel packs) — the
        reward consumes them directly; ``step_batch`` unpacks for obs. The
        5th element is the kernel-reduced per-env tracking sum
        Σ(U−U_ref[t])² when ``_fused_track`` (else None)."""
        if self._fused_step is None:
            new_state, frames, terminated, ts = jax.vmap(self._advance)(
                state, actions
            )
            return new_state, frames, terminated, ts, None
        c = self.config
        act = jnp.asarray(actions, c.dtype).reshape(state.u.shape[0], -1)
        ts = state.time_index + 1
        if self._fused_track:
            row = jax.lax.dynamic_index_in_dim(
                self._U_ref_carried, ts[0], 0, keepdims=False
            )
            u, v, p, tsum = self._fused_step(
                state.u, state.v, act, row[..., 0], row[..., 1]
            )
            track = tsum[:, 0]
        else:
            u, v, p = self._fused_step(state.u, state.v, act)
            track = None
        new_state = NavierStokesState(u=u, v=v, p=p, time_index=ts)
        frames = jnp.stack([u, v], axis=-1)
        terminated = ts >= c.nt - 1
        return new_state, frames, terminated, ts, track

    def _reward_at(self, frame, t, terminated, action, frame_ref, action_ref):
        c = self.config
        ctx = RewardCtx(
            u=frame,
            time_index=t,
            executed=jnp.asarray(1, jnp.int32),
            terminated=terminated,
            truncated=False,
            action=jnp.asarray(action, c.dtype),
            norms=jnp.zeros((1,), c.dtype),
            bsum=jnp.zeros((), c.dtype),
            ring=1,
            extras={
                "frame": frame,
                "frame_ref": frame_ref,
                "action": action,
                "action_ref": action_ref,
            },
        )
        return self.reward(ctx)

    def step(self, state: NavierStokesState, action, key=None):
        new_state, frame, terminated, t = self._advance(state, action)
        reward = self._reward_at(
            frame, t, terminated, action, self.U_ref[t], self.action_ref[t]
        )
        return new_state, StepOut(
            obs=frame,
            reward=reward,
            terminated=terminated,
            truncated=False,
            info={},
        )

    def step_batch(self, state: NavierStokesState, actions):
        """Batched step with a lockstep-aware tracking-target lookup.

        Under ``vmap(env.step)`` the per-env ``U_ref[t]`` row lookup lowers to
        a TPU gather that costs more than the whole projection step (1305 vs
        116 µs/step at 2048 envs × 64×64). NS episodes never truncate, so a
        rollout batch is ALWAYS time-lockstep through the public APIs (fixed
        nt-1-step episodes, no truncation, batched init/autoreset), so by
        default (``config.lockstep_targets``) the shared slice is used
        unconditionally — the runtime lockstep-check cond cost 13%
        end-to-end on the round-3 XLA. ``lockstep_targets=False`` restores
        the runtime check with the per-env gather fallback for hand-built
        mixed-time batches."""
        new_state, frames, terminated, ts, track = self._advance_batch(
            state, actions
        )
        # frames and _U_ref_carried share the carried layout (packed when the
        # fused kernel packs): the tracking reward is a permutation-invariant
        # elementwise sum, so no per-step unpack is needed for rewards
        U_ref_c = self._U_ref_carried

        def kernel_track_reward():
            # _fused_track: the kernel already reduced Σ(U−U_ref[t])² per
            # env in VMEM; assemble NSReward's formula from the sums
            # (ns_reward.py:15-28 semantics, lockstep row)
            c = self.config
            arow = jax.lax.dynamic_index_in_dim(
                self.action_ref, ts[0], 0, keepdims=False
            )
            acts2 = jnp.asarray(actions, c.dtype).reshape(track.shape[0], -1)
            act_term = jnp.sum(jnp.square(acts2 - arow), axis=-1)
            gamma = self.reward.gamma
            return (-0.5 * track / (c.nx * c.ny)
                    - 0.5 * gamma * act_term)

        def shared_ref(_):
            row = jax.lax.dynamic_index_in_dim(U_ref_c, ts[0], 0, keepdims=False)
            arow = jax.lax.dynamic_index_in_dim(self.action_ref, ts[0], 0, keepdims=False)
            return jax.vmap(
                lambda fr, tt, term, ac: self._reward_at(fr, tt, term, ac, row, arow)
            )(frames, ts, terminated, actions)

        def gathered_ref(_):
            return jax.vmap(self._reward_at)(
                frames, ts, terminated, actions, U_ref_c[ts], self.action_ref[ts]
            )

        if getattr(self.config, "lockstep_targets", True):
            reward = kernel_track_reward() if track is not None else shared_ref(None)
            # fail LOUD on hand-built mixed-time batches instead of silently
            # rewarding every env against env 0's target row (the check is
            # one (B,) compare + select — the round-2 lax.cond this replaces
            # was the expensive part, not the comparison)
            reward = jnp.where((ts == ts[0]).all(), reward, jnp.nan)
        else:
            reward = jax.lax.cond(
                (ts == ts[0]).all(), shared_ref, gathered_ref, None
            )
        if self._pack_r > 1:
            # public obs contract stays logical (B, ny, nx, 2); XLA drops
            # this unpack whenever nothing consumes the observation values
            obs = jnp.stack(
                [self._unpack(frames[..., 0]), self._unpack(frames[..., 1])],
                axis=-1,
            )
        else:
            obs = frames
        return new_state, StepOut(
            obs=obs,
            reward=reward,
            terminated=terminated,
            truncated=jnp.zeros_like(terminated),
            info={},
        )
