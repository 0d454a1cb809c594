"""Pallas TPU kernels: a full control interval of 1D PDE sub-steps in VMEM.

The XLA path runs the sub-step loop as ``lax.scan``, whose carry round-trips
HBM every iteration: at 4096 envs x 128 points that is ~4 MB of HBM traffic
per sub-step — the throughput ceiling. These kernels instead tile the env
batch into VMEM, run ALL ``S`` sub-steps of the control interval on-chip, and
write back once: HBM traffic per agent step drops from ``2·S·B·nx`` floats to
``(2·nx + S)·B`` (state in/out + the per-sub-step L2 norms the reward needs).

The per-PDE row update is injected as a traced function ``update(u, beta,
ctrl) -> (u_new, boundary)`` built from rolls and column masks (no concat), so
transport / reaction-diffusion / Burgers share one kernel skeleton. Masking
(``t < nt-1``) freezes finished envs exactly like the XLA path.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _col_iota(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dimension=1)


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
    tile_b: int = 512,
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

    def kernel(u_ref, beta_ref, ctrl_ref, t0_ref, uo_ref, norms_ref, bsum_ref, to_ref):
        u0 = u_ref[:]
        beta = beta_ref[:]
        ctrl = ctrl_ref[:]
        t0 = t0_ref[:]

        def make_body(with_norm):
            def body(j, carry):
                u, t, bsum = carry
                active = t < nt - 1  # (TB, 1)
                u_new, boundary = update_fn(u, beta, ctrl)
                u_new = jnp.where(active, u_new, u)
                if with_norm:
                    # dynamic store must index the sublane dim (lane-dim
                    # dynamic stores need 128-alignment)
                    norm_row = jnp.sqrt(
                        jnp.sum(u_new * u_new, axis=1, keepdims=True)
                    )
                    norms_ref[pl.ds(j % Wp, 1), :] = norm_row.reshape(1, -1)
                bsum = bsum + jnp.where(active, jnp.abs(boundary), 0.0)
                t = t + active.astype(jnp.int32)
                return u_new, t, bsum

            return body

        carry = (u0, t0, jnp.zeros_like(ctrl))
        start = 0
        for j in norm_positions:  # static segment decomposition
            if j > start:
                carry = jax.lax.fori_loop(start, j, make_body(False), carry)
            carry = make_body(True)(j, carry)
            start = j + 1
        if S > start:
            carry = jax.lax.fori_loop(start, S, make_body(False), carry)
        u, t, bsum = carry
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


# -- per-PDE row updates (row-parallel forms of the envs' _advance) ----------


def transport_update(dt: float, dx: float, nx: int):
    """Upwind transport row update (envs/transport.py semantics): boundary
    column nx-1 is the pre-resolved control value (constant over the interval
    — the Neumann neighbor quirk reads a zero), interior is the upwind step."""

    def update(u, beta, ctrl):
        col = _col_iota(u.shape)
        up = _roll(u, -1, 1)  # u[:, i+1]; wrap lands on the boundary col
        interior = u + dt * ((up - u) / dx + u[:, 0:1] * beta)
        u_new = jnp.where(col == nx - 1, ctrl, interior)
        return u_new, jnp.broadcast_to(ctrl, (u.shape[0], 1))

    return update


def reaction_diffusion_update(dt: float, dx: float, state_dim: int,
                              neumann: bool):
    """FTCS row update (envs/reaction_diffusion.py): u[0]=0, boundary from the
    PREVIOUS row's [-2] for Neumann control (parabolic.py:148-150)."""
    F = dt / dx**2
    n = state_dim

    def update(u, beta, ctrl):
        col = _col_iota(u.shape)
        um = _roll(u, 1, 1)
        up = _roll(u, -1, 1)
        interior = u + F * (um - 2.0 * u + up) + dt * beta * u
        if neumann:
            boundary = ctrl * dx + u[:, n - 2 : n - 1]
        else:
            boundary = jnp.broadcast_to(ctrl, (u.shape[0], 1))
        u_new = jnp.where(
            col == 0, 0.0, jnp.where(col == n - 1, boundary, interior)
        )
        return u_new, boundary

    return update


def burgers_update(dt: float, dx: float, nx: int, viscosity: float,
                   neumann: bool):
    """Rusanov-flux row update (envs/burgers.py): zero-gradient left outflow,
    controlled right boundary."""

    def update(u, beta, ctrl):
        col = _col_iota(u.shape)
        up = _roll(u, -1, 1)
        um = _roll(u, 1, 1)
        # face flux to the right of cell i (valid for i < nx-1)
        fl, fr = 0.5 * u * u, 0.5 * up * up
        amax = jnp.maximum(jnp.abs(u), jnp.abs(up))
        flux_r = 0.5 * (fl + fr) - 0.5 * amax * (up - u)
        flux_l = _roll(flux_r, 1, 1)
        interior = u - dt / dx * (flux_r - flux_l)
        if viscosity:
            interior = interior + viscosity * dt / (dx * dx) * (um - 2.0 * u + up)
        if neumann:
            boundary = ctrl * dx + u[:, nx - 2 : nx - 1]
        else:
            boundary = jnp.broadcast_to(ctrl, (u.shape[0], 1))
        u_new = jnp.where(col == nx - 1, boundary, interior)
        # left outflow copies the NEW value at column 1
        left = _roll(u_new, -1, 1)
        u_new = jnp.where(col == 0, left, u_new)
        return u_new, boundary

    return update
