"""Fused Pallas TPU kernel: one full Navier-Stokes projection step in VMEM.

The XLA fast path (``envs/navier_stokes.py::_advance`` with
``pressure_solver="direct"``) materializes every intermediate field in HBM —
predictor, two boundary applications, divergence, four spectral matmuls, ring
copies, corrector — roughly a dozen (B, ny, nx) round trips per step. At
2048 envs x 64x64 f32 that is the measured bottleneck: the physics itself is
~1.5 ms/step and item 8 of docs/PERFORMANCE.md shows it is HBM-bandwidth
bound, not FLOP bound. This kernel runs the WHOLE step (reference semantics:
``src/environments2d/navier_stokes2D.py:118-157``) on a VMEM-resident block
of envs and touches HBM exactly once per field: read u, v; write u', v', p.

The spectral pressure solve is the same math as
``ops/poisson2d.direct_pressure`` — the DCT-II diagonalization of the
mirror-Neumann Laplacian fixed point of the reference's Jacobi sweep — with
the basis matrices zero-padded from the (ny-2, nx-2) interior up to full
(ny, ny)/(nx, nx) squares so border handling costs nothing: padded rows/cols
annihilate the border ring, so ``Qyᵀ·G_full·Qx`` equals the interior
transform exactly.

Layout: each grid program owns a ``(tile_b, ny, nx)`` block — envs on the
leading (cheap) axis, the grid's y on sublanes, x on lanes. Stencil neighbor
reads are zero-filled minor-axis shifts (slice + concat, no circular wrap);
ALL four spectral contractions are batched minor-axis MXU matmuls
(``(tile_b·rows, k) @ (k, cols)``), with two in-kernel batched minor-dim
transposes swapping which grid axis is minor between the x-side and y-side
pairs (per-env unrolled 2D dots were 3x slower).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pdecontrolgym_tpu.ops.poisson2d import dct2_basis

_EDGES = ("lower", "upper", "left", "right")


def fused_basis(ny: int, nx: int, dtype=jnp.float32):
    """Zero-padded DCT-II factors for the fused kernel (device constants).

    ``Qy`` is (ny, ny) with ``Qy[1:ny-1, :ny-2]`` = the interior basis and
    zeros elsewhere; likewise ``Qx``. Padding encodes the embed/extract of
    ``direct_pressure`` as pure matmul structure: zero rows kill the border
    ring of the rhs, zero columns leave the solution's border ring zero, and
    ``inv_pad`` (zero outside the (ny-2, nx-2) mode block, zero at the (0,0)
    null mode) annihilates any spurious padded modes.
    """
    import numpy as np

    m, n = ny - 2, nx - 2
    qy, ly = dct2_basis(m, jnp.float64)
    qx, lx = dct2_basis(n, jnp.float64)
    qy, ly, qx, lx = (np.asarray(a, np.float64) for a in (qy, ly, qx, lx))
    Qy = np.zeros((ny, ny))
    Qy[1 : 1 + m, :m] = qy
    Qx = np.zeros((nx, nx))
    Qx[1 : 1 + n, :n] = qx
    denom = ly[:, None] + lx[None, :]
    inv = np.where(denom > 0, 1.0 / np.maximum(denom, 1e-30), 0.0)
    inv_pad = np.zeros((ny, nx))
    inv_pad[:m, :n] = inv
    return {
        "qy": jnp.asarray(Qy, dtype),
        "qyT": jnp.asarray(Qy.T, dtype),
        "qx": jnp.asarray(Qx, dtype),
        "qxT": jnp.asarray(Qx.T, dtype),
        "inv": jnp.asarray(inv_pad, dtype),
        # transposed mode scaling for the transpose-pipelined kernel, which
        # carries the mode matrix as (x-mode, y-mode)
        "invT": jnp.asarray(inv_pad.T, dtype),
    }


def _pick_tile_b(batch: int) -> int:
    for tb in (32, 16, 8, 4, 2, 1):
        if batch % tb == 0:
            return tb
    return 1


def make_fused_ns_step(
    *,
    ny: int,
    nx: int,
    dx: float,
    dy: float,
    dt: float,
    viscosity: float,
    density: float,
    boundary_condition: tuple,
    dtype=jnp.float32,
    tile_b: int = None,
    interpret: bool = False,
):
    """Build ``fn(u, v, action) -> (u_next, v_next, p)`` over ``(B, ny, nx)``
    batches — the full projection step of ``NavierStokesEnv._advance`` as one
    ``pallas_call``. Requires f32 (Mosaic has no f64) and a scalar action
    (``action_dim == 1``); the env falls back to the XLA path otherwise.
    ``boundary_condition`` is the frozen per-edge tuple of the config.
    """
    if dtype not in (jnp.float32, jnp.dtype("float32")):
        raise ValueError("fused NS step is float32-only (Mosaic has no f64)")
    basis = fused_basis(ny, nx, dtype)
    nu, rho = float(viscosity), float(density)
    dxf, dyf, dtf = float(dx), float(dy), float(dt)

    def _shift_x(f, k):
        # out[..., x] = f[..., x+k], zero-filled at the vacated border
        z = jnp.zeros(f.shape[:-1] + (1,), f.dtype)
        if k == 1:
            return jnp.concatenate([f[..., 1:], z], axis=-1)
        return jnp.concatenate([z, f[..., :-1]], axis=-1)

    def _shift_y(f, k):
        z = jnp.zeros(f.shape[:-2] + (1, f.shape[-1]), f.dtype)
        if k == 1:
            return jnp.concatenate([f[..., 1:, :], z], axis=-2)
        return jnp.concatenate([z, f[..., :-1, :]], axis=-2)

    def _masks():
        row = jax.lax.broadcasted_iota(jnp.int32, (1, ny, nx), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, ny, nx), 2)
        interior = (row >= 1) & (row <= ny - 2) & (col >= 1) & (col <= nx - 2)
        edges = {
            "lower": row == 0,
            "upper": row == ny - 1,
            "left": col == 0,
            "right": col == nx - 1,
        }
        return interior, edges, row, col

    def _apply_bc(u, v, act, edges):
        # static unroll of the reference's edge loop (navier_stokes2D.py:76-91)
        # in write order lower/upper/left/right x (u, v); Neumann reads the
        # CURRENT field's inner neighbor so corner overwrite chains match
        neighbor = {
            "lower": lambda f: _shift_y(f, 1),
            "upper": lambda f: _shift_y(f, -1),
            "left": lambda f: _shift_x(f, 1),
            "right": lambda f: _shift_x(f, -1),
        }
        for pos, conds in zip(_EDGES, boundary_condition):
            for i, cond in enumerate(conds):
                f = u if i == 0 else v
                if cond == "Neumann":
                    f = jnp.where(edges[pos], neighbor[pos](f), f)
                elif cond == "Controllable":
                    f = jnp.where(edges[pos], act, f)
                else:  # Dirichlet / "Dirchilet"
                    f = jnp.where(edges[pos], jnp.zeros_like(f), f)
                if i == 0:
                    u = f
                else:
                    v = f
        return u, v

    def kernel(u_ref, v_ref, act_ref, qy_ref, qyT_ref, qx_ref, qxT_ref,
               invT_ref, uo_ref, vo_ref, po_ref):
        be = u_ref.shape[0]
        u = u_ref[:]
        v = v_ref[:]
        act = act_ref[:][:, :, None]  # (be, 1, 1) scalar per env
        interior, edges, _, _ = _masks()

        # -- predictor (zero-bordered derivatives == interior select) -------
        def ddx(f):
            return (_shift_x(f, 1) - _shift_x(f, -1)) * (0.5 / dxf)

        def ddy(f):
            return (_shift_y(f, 1) - _shift_y(f, -1)) * (0.5 / dyf)

        def lap(f):
            return (
                _shift_x(f, -1) + _shift_y(f, -1) - 4.0 * f
                + _shift_x(f, 1) + _shift_y(f, 1)
            ) * (1.0 / (dxf * dyf))

        u_p = jnp.where(
            interior,
            u + dtf * (-u * ddx(u) - v * ddy(u) + nu * lap(u)),
            u,
        )
        v_p = jnp.where(
            interior,
            v + dtf * (-u * ddx(v) - v * ddy(v) + nu * lap(v)),
            v,
        )
        u_p, v_p = _apply_bc(u_p, v_p, act, edges)

        # -- spectral pressure solve (direct_pressure semantics) ------------
        g = jnp.where(
            interior,
            (-dxf * dyf * rho / dtf) * (ddx(u_p) + ddy(v_p)),
            jnp.zeros_like(u),
        )
        qy, qyT, qx, qxT, invT = (
            qy_ref[:], qyT_ref[:], qx_ref[:], qxT_ref[:], invT_ref[:]
        )

        def bdot(x3, m2, rows):
            # (be, rows, k) @ (k, cols): every env batches into ONE MXU matmul
            return jnp.dot(
                x3.reshape(be * rows, m2.shape[0]), m2,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(be, rows, m2.shape[1])

        # transpose-pipelined transform: each contraction is a batched
        # (be·dim, dim) @ (dim, dim) matmul on the minor axis; the two
        # batched minor-dim transposes swap which grid axis is minor.
        # A[b,y,l] = Σx g·Qx; Tt[b,l,k] = Σy At·Qy (= T transposed);
        # E[b,l,y] = Σk (Tt⊙invT)·Qyᵀ; P[b,y,x] = Σl Et·Qxᵀ.
        a = jnp.swapaxes(bdot(g, qx, ny), 1, 2)
        t = bdot(a, qy, nx) * invT
        p = jnp.swapaxes(bdot(t, qyT, nx), 1, 2)
        p = bdot(p, qxT, ny)
        # the reference's sequential mirror-ring copies (corner chain order)
        p = jnp.where(edges["right"], _shift_x(p, -1), p)
        p = jnp.where(edges["lower"], _shift_y(p, 1), p)
        p = jnp.where(edges["left"], _shift_x(p, 1), p)
        p = jnp.where(edges["upper"], _shift_y(p, -1), p)

        # -- corrector + boundary re-application ----------------------------
        u_n = jnp.where(interior, u_p - (dtf / rho) * ddx(p), u_p)
        v_n = jnp.where(interior, v_p - (dtf / rho) * ddy(p), v_p)
        u_n, v_n = _apply_bc(u_n, v_n, act, edges)

        uo_ref[:] = u_n
        vo_ref[:] = v_n
        po_ref[:] = p

    @functools.partial(jax.jit, static_argnames=())
    def step(u, v, action):
        batch = u.shape[0]
        tb = tile_b or _pick_tile_b(batch)
        act = jnp.asarray(action, dtype).reshape(batch, -1)[:, :1]
        field = lambda: pl.BlockSpec((tb, ny, nx), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
        const = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((batch, ny, nx), dtype)
        return pl.pallas_call(
            kernel,
            grid=(batch // tb,),
            in_specs=[
                field(), field(),
                pl.BlockSpec((tb, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                const(ny, ny), const(ny, ny),
                const(nx, nx), const(nx, nx), const(nx, ny),
            ],
            out_specs=[field(), field(), field()],
            out_shape=[out_shape, out_shape, out_shape],
            interpret=interpret,
        )(u, v, act, basis["qy"], basis["qyT"], basis["qx"], basis["qxT"],
          basis["invT"])

    return step
