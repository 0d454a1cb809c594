"""Batched 2D field ops for the Navier-Stokes projection solver.

Mirrors the semantics of the reference helpers ``central_difference`` /
``laplace`` (``src/environments2d/navier_stokes2D.py:9-22``: interior-only,
zero borders) and the fixed-iteration Jacobi pressure-Poisson sweep with
sequential Neumann edge copies (``navier_stokes2D.py:94-116``). All functions
are pure jnp on ``(..., nx, ny)`` arrays so a batch of envs runs in one fused
program; the Jacobi loop is a ``lax.fori_loop`` that XLA keeps on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ddx(f, dx):
    """Interior central difference along axis -1 (the reference's "x"),
    zero on the border ring."""
    out = jnp.zeros_like(f)
    return out.at[..., 1:-1, 1:-1].set(
        (f[..., 1:-1, 2:] - f[..., 1:-1, :-2]) / (2.0 * dx)
    )


def ddy(f, dy):
    """Interior central difference along axis -2 (the reference's "y")."""
    out = jnp.zeros_like(f)
    return out.at[..., 1:-1, 1:-1].set(
        (f[..., 2:, 1:-1] - f[..., :-2, 1:-1]) / (2.0 * dy)
    )


def laplacian(f, dx, dy):
    """Interior 5-point Laplacian scaled by 1/(dx·dy) (reference convention,
    ``navier_stokes2D.py:17-22``), zero on the border ring."""
    out = jnp.zeros_like(f)
    return out.at[..., 1:-1, 1:-1].set(
        (
            f[..., 1:-1, :-2]
            + f[..., :-2, 1:-1]
            - 4.0 * f[..., 1:-1, 1:-1]
            + f[..., 1:-1, 2:]
            + f[..., 2:, 1:-1]
        )
        / (dx * dy)
    )


def _neumann_edges(p):
    """The reference's sequential pressure BC writes (order matters at the
    corners): right col ← its neighbor, then top row, left col, bottom row
    (``navier_stokes2D.py:110-113``)."""
    p = p.at[..., :, -1].set(p[..., :, -2])
    p = p.at[..., 0, :].set(p[..., 1, :])
    p = p.at[..., :, 0].set(p[..., :, 1])
    p = p.at[..., -1, :].set(p[..., -2, :])
    return p


def jacobi_pressure_flat(u, v, p0, dx, dy, dt, density, iters: int):
    """Semantically identical to :func:`jacobi_pressure`, with the grid
    flattened into the trailing (lane) axis: a (ny, nx) field becomes a
    row-major (ny·nx,) vector, neighbor access becomes lane rolls of ±1 / ±nx,
    and edge handling becomes masked selects. On TPU this keeps every op on
    fully-utilized (8, 128) vector tiles — the 2D layout wastes half the lanes
    whenever nx < 128.
    """
    ny, nx = u.shape[-2], u.shape[-1]
    lead = u.shape[:-2]
    n = ny * nx
    uf = u.reshape(lead + (n,))
    vf = v.reshape(lead + (n,))
    pf = p0.reshape(lead + (n,))

    idx = jnp.arange(n)
    row = idx // nx
    col = idx % nx
    interior = (row >= 1) & (row <= ny - 2) & (col >= 1) & (col <= nx - 2)

    def sh(x, k):
        return jnp.roll(x, -k, axis=-1)  # sh(x, k)[i] = x[i + k]

    rhs = jnp.where(
        interior,
        density / dt * (
            (sh(uf, 1) - sh(uf, -1)) / (2.0 * dx)
            + (sh(vf, nx) - sh(vf, -nx)) / (2.0 * dy)
        ),
        0.0,
    )

    def body(_, p):
        interior_val = 0.25 * (
            sh(p, -1) + sh(p, -nx) + sh(p, 1) + sh(p, nx) - dx * dy * rhs
        )
        p = jnp.where(interior, interior_val, p)
        # sequential Neumann edge copies (reference order, corners included)
        p = jnp.where(col == nx - 1, sh(p, -1), p)
        p = jnp.where(row == 0, sh(p, nx), p)
        p = jnp.where(col == 0, sh(p, 1), p)
        p = jnp.where(row == ny - 1, sh(p, -nx), p)
        return p

    pf = jax.lax.fori_loop(0, iters, body, pf)
    return pf.reshape(lead + (ny, nx))


def jacobi_pressure(u, v, p0, dx, dy, dt, density, iters: int):
    """Fixed-iteration Jacobi solve of ∇²p = ρ/dt·(∂u/∂x + ∂v/∂y).

    ``iters=2000`` reproduces the reference exactly (no convergence check,
    ``navier_stokes2D.py:104-114``); smaller values give the fast mode.
    """
    rhs = density / dt * (ddx(u, dx) + ddy(v, dy))
    rhs_c = rhs[..., 1:-1, 1:-1]

    def body(_, p):
        interior = 0.25 * (
            p[..., 1:-1, :-2]
            + p[..., :-2, 1:-1]
            + p[..., 1:-1, 2:]
            + p[..., 2:, 1:-1]
            - dx * dy * rhs_c
        )
        p = p.at[..., 1:-1, 1:-1].set(interior)
        return _neumann_edges(p)

    return jax.lax.fori_loop(0, iters, body, p0)
