"""Pallas TPU kernels: a full control interval of 1D PDE sub-steps in VMEM.

The XLA path runs the sub-step loop as ``lax.scan``, whose carry round-trips
HBM every iteration: at 4096 envs x 128 points that is ~4 MB of HBM traffic
per sub-step — the throughput ceiling. These kernels instead tile the env
batch into VMEM, run ALL ``S`` sub-steps of the control interval on-chip, and
write back once: HBM traffic per agent step drops from ``2·S·B·nx`` floats to
``(2·nx + S)·B`` (state in/out + the per-sub-step L2 norms the reward needs).

The per-PDE row update is injected as a traced function ``update(u, beta,
ctrl, aux) -> (u_new, boundary)`` built from rolls and column masks (no
concat), so transport / reaction-diffusion / Burgers share one kernel
skeleton. ``aux`` carries loop-invariant boolean column masks, built ONCE
before the sub-step loops (hand-LICM — the hot body is vector-issue-bound, so
every hoisted vreg op is ~1/20th of the sub-step cost).

Two loop variants: episodes end at ``nt-1``, so the kernel branches per tile
on ``all(t0 + S <= nt-1)`` — the fast path (every interval except the last
1-2 per episode) runs the raw stencil with no per-sub-step masking; the slow
path applies the same frozen-state masking as the XLA path.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _col_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _roll(x, shift, axis):
    """jnp.roll semantics; pltpu.roll only accepts non-negative shifts."""
    return pltpu.roll(x, shift % x.shape[axis], axis)


def make_interval_fn(
    update_fn: Callable,
    *,
    sample_rate: int,
    nt: int,
    state_dim: int,
    window: int,
    norm_positions: tuple = None,
    tile_b: int = None,
    unroll: int = 1,
    interpret: bool = False,
):
    """Build ``fn(u, beta, ctrl, t0) -> (u_out, norms_win, bsum_add, t_out)``.

    Shapes: u/beta ``(B, state_dim)`` f32, ctrl ``(B, 1)`` f32 (pre-resolved
    control scalar), t0 ``(B, 1)`` i32.

    The per-sub-step L2 norm is a cross-lane reduction — computing it every
    sub-step triples the kernel cost — so the kernel evaluates it only for the
    last ``min(window, S)`` sub-steps and returns them as a cyclic buffer
    ``(B, Wp)`` written at slot ``j % Wp`` (``Wp`` sublane-aligned). The caller
    reconstructs the trailing window (ops order in envs/common.py).
    """
    S = sample_rate
    Wn = min(window, S)
    Wp = -(-Wn // 8) * 8  # sublane-aligned cyclic buffer
    if norm_positions is None:
        norm_positions = tuple(range(S - Wn, S))
    if tile_b is None:
        # keep ~6 live (tile_b, state_dim) f32 buffers within a few MB of
        # VMEM; 256 measured best at nx=256 (and compiles 5x faster than 512).
        # Floor 128: the norms output block is (Wp, tile_b) with tile_b on
        # the LANE dim, and Mosaic requires lane blocks divisible by 128.
        fit = max(1, (1 << 17) // max(state_dim, 1))
        tile_b = max(128, min(256, 1 << (fit.bit_length() - 1)))
    make_aux = getattr(update_fn, "make_aux", lambda shape: None)
    boundary_const = bool(getattr(update_fn, "boundary_const", False))

    def kernel(u_ref, beta_ref, ctrl_ref, t0_ref, uo_ref, norms_ref, bsum_ref, to_ref):
        u0 = u_ref[:]
        beta = beta_ref[:]
        ctrl = ctrl_ref[:]
        t0 = t0_ref[:]
        aux = make_aux(u0.shape)  # loop-invariant column masks, built once

        def store_norm(j, u_new):
            # dynamic store must index the sublane dim (lane-dim dynamic
            # stores need 128-alignment)
            norm_row = jnp.sqrt(jnp.sum(u_new * u_new, axis=1, keepdims=True))
            norms_ref[pl.ds(j % Wp, 1), :] = norm_row.reshape(1, -1)

        # -- masked bodies (episode boundary inside this interval) ------------
        def make_body(with_norm):
            def body(j, carry):
                u, t, bsum = carry
                active = t < nt - 1  # (TB, 1)
                u_new, boundary = update_fn(u, beta, ctrl, aux)
                u_new = jnp.where(active, u_new, u)
                if with_norm:
                    store_norm(j, u_new)
                bsum = bsum + jnp.where(active, jnp.abs(boundary), 0.0)
                t = t + active.astype(jnp.int32)
                return u_new, t, bsum

            return body

        # -- fast bodies (whole tile mid-episode: no per-sub-step masking) ----
        def make_fast_body(with_norm):
            def body(j, carry):
                u, t, bsum = carry
                u_new, boundary = update_fn(u, beta, ctrl, aux)
                if with_norm:
                    store_norm(j, u_new)
                if not boundary_const:
                    bsum = bsum + jnp.abs(boundary)
                return u_new, t, bsum

            return body

        def seg(lo, hi, body, carry):
            # Mosaic fori_loop supports only unroll=1 or full unroll; "full"
            # inlines the whole segment (trip counts are static here), which
            # removes the per-sub-step loop overhead that dominates this
            # kernel (a trivial body times at ~2/3 the cost of the real one).
            k = (hi - lo) if unroll == "full" else unroll
            return jax.lax.fori_loop(lo, hi, body, carry, unroll=k)

        def run(body_factory, carry):
            start = 0
            for j in norm_positions:  # static segment decomposition
                if j > start:
                    carry = seg(start, j, body_factory(False), carry)
                carry = body_factory(True)(j, carry)
                start = j + 1
            if S > start:
                carry = seg(start, S, body_factory(False), carry)
            return carry

        def fast(carry):
            u, t, bsum = run(make_fast_body, carry)
            if boundary_const:
                bsum = bsum + S * jnp.abs(ctrl)
            return u, t + S, bsum

        def masked(carry):
            return run(make_body, carry)

        all_active = jnp.all(t0 + S <= nt - 1)
        carry = (u0, t0, jnp.zeros_like(ctrl))
        u, t, bsum = jax.lax.cond(all_active, fast, masked, carry)
        uo_ref[:] = u
        bsum_ref[:] = bsum
        to_ref[:] = t

    @jax.jit
    def fn(u, beta, ctrl, t0):
        B = u.shape[0]
        # largest power-of-two tile <= tile_b that divides B
        tb = next(t for t in (tile_b, 256, 128, 64, 32, 16, 8, 4, 2, 1)
                  if t <= tile_b and B % t == 0)
        grid = (B // tb,)
        row_spec = pl.BlockSpec((tb, state_dim), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        one_spec = pl.BlockSpec((tb, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        norm_spec = pl.BlockSpec((Wp, tb), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        u_out, norms_t, bsum, t_out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row_spec, row_spec, one_spec, one_spec],
            out_specs=[row_spec, norm_spec, one_spec, one_spec],
            out_shape=[
                jax.ShapeDtypeStruct((B, state_dim), u.dtype),
                jax.ShapeDtypeStruct((Wp, B), u.dtype),
                jax.ShapeDtypeStruct((B, 1), u.dtype),
                jax.ShapeDtypeStruct((B, 1), jnp.int32),
            ],
            interpret=interpret,
        )(u, beta, ctrl, t0)
        return u_out, norms_t.T, bsum, t_out

    return fn


def make_interval_fn_t(
    update_fn: Callable,
    *,
    sample_rate: int,
    nt: int,
    state_dim: int,
    window: int,
    norm_positions: tuple = None,
    tile_b: int = None,
    interpret: bool = False,
):
    """Transposed-layout interval kernel: state tiles are ``(state_dim, tb)``
    — the PDE axis on SUBLANES, envs on LANES — and the state lives in a
    padded VMEM scratch mutated in place by ``update_fn``.

    Why a second layout: in the lane layout the stencil neighbor reads are
    full-width lane rotations and the boundary writes are full-width lane
    selects. Here the neighbor read is an offset sublane slice of the scratch
    (``us[1:nx+1]`` vs ``us[0:nx]``) and each boundary write is a 1-row store
    — measured 1.28x the lane skeleton for the Burgers flux-form body
    (min-of-5 timing, one process: 384M -> 493M sub-steps/s at 4096x256).

    ``update_fn(us, beta_ref, ctrl, aux) -> boundary`` performs ONE sub-step
    in place on ``us[0:state_dim, :]`` (rows state_dim..state_dim+7 are
    zeroed padding so an offset-by-one slice stays in bounds) and returns the
    ``(1, tb)`` boundary row. Same external contract as ``make_interval_fn``:
    ``fn(u, beta, ctrl, t0) -> (u_out, norms_win, bsum_add, t_out)`` with
    ``u`` in the usual ``(B, state_dim)`` layout (transposes at the interval
    boundary are ~1% of interval cost).

    Sublane-unaligned state sizes are handled by padding the row count up to
    a multiple of 8 with zero rows; updates compute over the padded rows and
    are responsible for keeping them zero (re-zeroing the single row their
    stencil pollutes), so the norm reduction can safely run over all rows.
    """
    S = sample_rate
    Wn = min(window, S)
    Wp = -(-Wn // 8) * 8
    if norm_positions is None:
        norm_positions = tuple(range(S - Wn, S))
    D = _pad8(state_dim)  # sublane-aligned row count (zero-padded)
    NP = D + 8  # padded scratch rows so the +1 neighbor slice stays in bounds
    if tile_b is None:
        # 128 lanes measured best for the in-place scratch kernel at nx=256
        # (641M vs 488M sub-steps/s at 256 lanes, min-of-5 in one process —
        # narrower tiles pipeline better across the grid); lane blocks must
        # be 128-aligned on real TPUs
        tile_b = 128
    make_aux = getattr(update_fn, "make_aux", lambda shape: None)
    boundary_const = bool(getattr(update_fn, "boundary_const", False))

    def kernel(u_ref, beta_ref, ctrl_ref, t0_ref, uo_ref, norms_ref, bsum_ref,
               to_ref, us):
        ctrl = ctrl_ref[:]  # (1, tb)
        t0 = t0_ref[:]  # (1, tb) i32
        us[0:D, :] = u_ref[:]
        us[D:NP, :] = jnp.zeros((NP - D, us.shape[1]), u_ref.dtype)
        aux = make_aux((D, us.shape[1]))

        def store_norm(j):
            u = us[0:D, :]
            norms_ref[pl.ds(j % Wp, 1), :] = jnp.sqrt(
                jnp.sum(u * u, axis=0, keepdims=True)
            )

        def make_body(with_norm):
            def body(j, carry):
                t, bsum = carry
                active = t < nt - 1  # (1, tb)
                u_old = us[0:D, :]
                boundary = update_fn(us, beta_ref, ctrl, aux)
                us[0:D, :] = jnp.where(active, us[0:D, :], u_old)
                if with_norm:
                    store_norm(j)
                bsum = bsum + jnp.where(active, jnp.abs(boundary), 0.0)
                t = t + active.astype(jnp.int32)
                return t, bsum

            return body

        def make_fast_body(with_norm):
            def body(j, carry):
                t, bsum = carry
                boundary = update_fn(us, beta_ref, ctrl, aux)
                if with_norm:
                    store_norm(j)
                if not boundary_const:
                    bsum = bsum + jnp.abs(boundary)
                return t, bsum

            return body

        def seg(lo, hi, body, carry):
            return jax.lax.fori_loop(lo, hi, body, carry)

        def run(body_factory, carry):
            start = 0
            for j in norm_positions:  # static segment decomposition
                if j > start:
                    carry = seg(start, j, body_factory(False), carry)
                carry = body_factory(True)(j, carry)
                start = j + 1
            if S > start:
                carry = seg(start, S, body_factory(False), carry)
            return carry

        def fast(carry):
            t, bsum = run(make_fast_body, carry)
            if boundary_const:
                bsum = bsum + S * jnp.abs(ctrl)
            return t + S, bsum

        def masked(carry):
            return run(make_body, carry)

        all_active = jnp.all(t0 + S <= nt - 1)
        t, bsum = jax.lax.cond(
            all_active, fast, masked, (t0, jnp.zeros_like(ctrl))
        )
        uo_ref[:] = us[0:D, :]
        bsum_ref[:] = bsum
        to_ref[:] = t

    beta_transform = getattr(update_fn, "beta_transform", None)

    @jax.jit
    def fn(u, beta, ctrl, t0):
        B, Ds = u.shape
        if interpret:
            tb, Bp = min(B, tile_b), B
        else:
            tb = tile_b if (tile_b % 128 == 0 and B % tile_b == 0) else 128
            Bp = -(-B // tb) * tb  # lane blocks must be 128-aligned; pad
        if beta_transform is not None:
            # hoist loop-invariant scaling (e.g. dt·beta) out of the kernel
            beta = beta_transform(beta)
        ut = jnp.zeros((D, Bp), u.dtype).at[:Ds, :B].set(u.T)
        betat = jnp.zeros((D, Bp), u.dtype).at[:Ds, :B].set(beta.T)
        ctrlt = jnp.zeros((1, Bp), u.dtype).at[:, :B].set(ctrl.T)
        t0t = jnp.zeros((1, Bp), jnp.int32).at[:, :B].set(t0.T)
        col_spec = pl.BlockSpec((D, tb), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        row_spec = pl.BlockSpec((1, tb), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        norm_spec = pl.BlockSpec((Wp, tb), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        u_out, norms, bsum, t_out = pl.pallas_call(
            kernel,
            grid=(Bp // tb,),
            in_specs=[col_spec, col_spec, row_spec, row_spec],
            out_specs=[col_spec, norm_spec, row_spec, row_spec],
            out_shape=[
                jax.ShapeDtypeStruct((D, Bp), u.dtype),
                jax.ShapeDtypeStruct((Wp, Bp), u.dtype),
                jax.ShapeDtypeStruct((1, Bp), u.dtype),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            ],
            scratch_shapes=[pltpu.VMEM((NP, tb), u.dtype)],
            interpret=interpret,
        )(ut, betat, ctrlt, t0t)
        return (u_out[:Ds, :B].T, norms[:, :B].T, bsum[:, :B].T,
                t_out[:, :B].T)

    return fn


# -- per-PDE row updates (row-parallel forms of the envs' _advance) ----------


def _broadcast_lane(x, idx):
    """Broadcast lane ``idx`` of each row across the full row: a lane slice +
    broadcast is cheaper than a full-width roll when only one column is
    needed (the Burgers left-outflow copy)."""
    return jnp.broadcast_to(x[:, idx: idx + 1], x.shape)


def transport_update(dt: float, dx: float, nx: int):
    """Upwind transport row update (envs/transport.py semantics): boundary
    column nx-1 is the pre-resolved control value (constant over the interval
    — the Neumann neighbor quirk reads a zero), interior is the upwind step."""

    def make_aux(shape):
        col = _col_iota(shape)
        return {"right": col == nx - 1}

    def update(u, beta, ctrl, aux):
        up = _roll(u, -1, 1)  # u[:, i+1]; wrap lands on the boundary col
        interior = u + dt * ((up - u) / dx + u[:, 0:1] * beta)
        u_new = jnp.where(aux["right"], ctrl, interior)
        return u_new, ctrl

    update.make_aux = make_aux
    update.boundary_const = True
    return update


def reaction_diffusion_update(dt: float, dx: float, state_dim: int,
                              neumann: bool):
    """FTCS row update (envs/reaction_diffusion.py): u[0]=0, boundary from the
    PREVIOUS row's [-2] for Neumann control (parabolic.py:148-150)."""
    F = dt / dx**2
    n = state_dim

    def make_aux(shape):
        col = _col_iota(shape)
        return {"left": col == 0, "right": col == n - 1}

    def update(u, beta, ctrl, aux):
        um = _roll(u, 1, 1)
        up = _roll(u, -1, 1)
        interior = u + F * (um - 2.0 * u + up) + dt * beta * u
        if neumann:
            boundary = ctrl * dx + u[:, n - 2 : n - 1]
        else:
            boundary = ctrl
        u_new = jnp.where(
            aux["left"], 0.0, jnp.where(aux["right"], boundary, interior)
        )
        return u_new, boundary

    update.make_aux = make_aux
    update.boundary_const = not neumann
    return update


def burgers_update(dt: float, dx: float, nx: int, viscosity: float,
                   neumann: bool, flux: str = "godunov"):
    """Flux-form row update (envs/burgers.py): zero-gradient left outflow,
    controlled right boundary. Viscous term folded into the face flux (see
    envs/burgers.py:_advance). All scheme constants (dt/dx, the 0.5/0.25
    flux factors, ν/dx) are pre-folded into the face flux so the hot body
    spends no vector issues on scaling: ``u_new = u - (F'_r - F'_l)`` with
    ``F' = (dt/dx)·F``. The default Godunov flux (exact Riemann for u²/2,
    ``F = max(f(max(ul,0)), f(min(ur,0)))``) is ~4 vector ops cheaper per
    sub-step than Rusanov — no |u|/face-speed chain."""
    dtdx = dt / dx
    nu_scaled = dtdx * (viscosity / dx) if viscosity else 0.0

    def make_aux(shape):
        col = _col_iota(shape)
        return {"left": col == 0, "right": col == nx - 1}

    def update(u, beta, ctrl, aux):
        up = _roll(u, -1, 1)
        # dtdx-scaled face flux to the right of cell i (valid for i < nx-1)
        if flux == "godunov":
            # max(f(max(ul,0)), f(min(ur,0))) = f(max(ul, -ur, 0)) for convex
            # f with f(-x)=f(x): one vector op fewer than the two-squares form
            m = jnp.maximum(jnp.maximum(u, -up), 0.0)
            flux_r = (0.5 * dtdx) * (m * m)
        else:  # rusanov
            coef = (0.5 * dtdx) * jnp.maximum(jnp.abs(u), jnp.abs(up))
            flux_r = (0.25 * dtdx) * (u * u + up * up) - coef * (up - u)
        if nu_scaled:
            flux_r = flux_r - nu_scaled * (up - u)
        flux_l = _roll(flux_r, 1, 1)
        interior = u - (flux_r - flux_l)
        if neumann:
            boundary = ctrl * dx + u[:, nx - 2 : nx - 1]
        else:
            boundary = ctrl
        u_new = jnp.where(aux["right"], boundary, interior)
        # left outflow copies the NEW value at column 1
        u_new = jnp.where(aux["left"], _broadcast_lane(u_new, 1), u_new)
        return u_new, boundary

    update.make_aux = make_aux
    update.boundary_const = not neumann
    return update


def burgers_update_t(dt: float, dx: float, nx: int, viscosity: float,
                     neumann: bool, flux: str = "godunov"):
    """Transposed in-place Burgers sub-step for ``make_interval_fn_t``: the
    state axis is on sublanes, so the neighbor read ``us[1:nx+1]`` is an
    offset slice (no lane rotation) and the two boundary writes are 1-row
    stores (no full-width selects). Same scheme/semantics as
    ``envs/burgers.py:_advance`` with all constants pre-folded."""
    dtdx = dt / dx
    nu_scaled = dtdx * (viscosity / dx) if viscosity else 0.0
    dp = _pad8(nx)

    def update(us, beta_ref, ctrl, aux):
        u = us[0:dp, :]
        up = us[1:dp + 1, :]  # rows nx..dp+1 are zeroed padding; row nx-1 of
        # the result is overwritten by the boundary store below
        if flux == "godunov":
            m = jnp.maximum(jnp.maximum(u, -up), 0.0)
            fr = (0.5 * dtdx) * (m * m)
        else:  # rusanov
            coef = (0.5 * dtdx) * jnp.maximum(jnp.abs(u), jnp.abs(up))
            fr = (0.25 * dtdx) * (u * u + up * up) - coef * (up - u)
        if nu_scaled:
            fr = fr - nu_scaled * (up - u)
        fl = pltpu.roll(fr, 1, 0)  # wraps garbage into row 0: overwritten
        un = u - (fr - fl)
        if neumann:
            boundary = ctrl * dx + u[nx - 2:nx - 1, :]  # previous state's [-2]
        else:
            boundary = ctrl
        us[0:dp, :] = un
        us[nx - 1:nx, :] = boundary
        us[0:1, :] = un[1:2, :]  # zero-gradient left outflow (new interior)
        if nx < dp:
            # the flux difference leaks fr[nx-1] into pad row nx; keep pads
            # zero so the norm reduction over all dp rows stays exact
            us[nx:nx + 1, :] = jnp.zeros_like(ctrl)
        return boundary

    update.transposed = True
    update.boundary_const = not neumann
    return update


def transport_update_t(dt: float, dx: float, nx: int):
    """Transposed in-place transport sub-step (same semantics as
    ``transport_update``): boundary row nx-1 is the pre-resolved control
    value, interior is the upwind step. The upwind stencil only reads the
    +1 neighbor, so the zero pad rows stay zero (beta pads are zero).
    The expression keeps the XLA path's exact association
    (``u + dt*((up-u)/dx + u0*beta)``) so the two backends match bitwise."""
    dp = _pad8(nx)

    def update(us, beta_ref, ctrl, aux):
        u = us[0:dp, :]
        up = us[1:dp + 1, :]
        # u[0:1] is the OLD recirculation value u(0,t), broadcast down rows
        un = u + dt * ((up - u) / dx + u[0:1, :] * beta_ref[:])
        us[0:dp, :] = un
        us[nx - 1:nx, :] = ctrl
        return ctrl

    update.transposed = True
    update.boundary_const = True
    return update


def reaction_diffusion_update_t(dt: float, dx: float, state_dim: int,
                                neumann: bool):
    """Transposed in-place FTCS sub-step (same semantics as
    ``reaction_diffusion_update``): u[0]=0 fixed BC, boundary from the
    PREVIOUS state's [-2] for Neumann control (parabolic.py:148-150)."""
    F = dt / dx**2
    n = state_dim
    dp = _pad8(n)

    def update(us, beta_ref, ctrl, aux):
        u = us[0:dp, :]
        up = us[1:dp + 1, :]
        um = pltpu.roll(u, 1, 0)  # wraps pad row dp-1 (zero) into row 0:
        # row 0 is overwritten by the fixed BC below either way
        un = u + F * (um - 2.0 * u + up) + u * beta_ref[:]  # beta = dt·λ
        if neumann:
            boundary = ctrl * dx + u[n - 2:n - 1, :]
        else:
            boundary = ctrl
        us[0:dp, :] = un
        us[0:1, :] = jnp.zeros_like(ctrl)  # fixed u(0,t)=0
        us[n - 1:n, :] = boundary
        if n < dp:
            # the centered stencil leaks F·u[n-1] into pad row n via um
            us[n:n + 1, :] = jnp.zeros_like(ctrl)
        return boundary

    update.transposed = True
    update.boundary_const = not neumann
    update.beta_transform = lambda beta: beta * dt
    return update
