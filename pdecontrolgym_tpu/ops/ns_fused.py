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

Packed layout (``pack_r`` = r > 1): f32 (8, 128) tiling pads an nx=64 lane
axis to 128, so every HBM↔VMEM byte of a ``(·, 64, 64)`` block is half
padding — a measured ~2x DMA tax on a kernel that is ~70% DMA-bound
(docs/PERFORMANCE.md item 15). With r = 128//nx, a field is carried BETWEEN
steps as ``(ny//r, nx·r)`` in "halves" packing — lane chunk j holds logical
rows ``[j·ny/r, (j+1)·ny/r)`` — which is a pure lane-concat of sublane
slices (NOT a reshape: Mosaic has no lane↔sublane reshape, but slicing and
concatenating along lanes it handles fine). All elementwise/stencil physics
runs natively packed (x-shifts gain a chunk-boundary mask; a y-shift is a
sublane shift plus ONE row's ±nx lane shift); only the spectral solve's
input ``g`` is unpacked and only ``p`` is repacked in-kernel, so the
verified matmul pipeline — and its numerics — are reused verbatim.
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


def pick_pack_r(ny: int, nx: int) -> int:
    """Row-fold factor for the packed layout: the largest r with
    ``nx·r ≤ 128``, ``128 % (nx·r) == 0`` and ``ny % r == 0`` (1 = layout
    already lane-dense or grid does not fold evenly)."""
    r = 1
    for cand in (2, 4, 8, 16):
        if nx * cand <= 128 and 128 % (nx * cand) == 0 and ny % cand == 0:
            r = cand
    return r if 128 % nx == 0 else 1


def pack_field(f, r: int):
    """(…, ny, nx) → (…, ny//r, nx·r) halves packing: lane chunk j carries
    logical rows [j·ny/r, (j+1)·ny/r). Built from slices + concat so the XLA
    form matches the in-kernel Mosaic form exactly (a reshape would give the
    row-interleaved packing instead, which Mosaic cannot unpack)."""
    if r == 1:
        return f
    m = f.shape[-2] // r
    return jnp.concatenate(
        [f[..., j * m : (j + 1) * m, :] for j in range(r)], axis=-1
    )


def unpack_field(f, r: int):
    """Inverse of :func:`pack_field`: (…, ny//r, nx·r) → (…, ny, nx)."""
    if r == 1:
        return f
    nx = f.shape[-1] // r
    return jnp.concatenate(
        [f[..., :, j * nx : (j + 1) * nx] for j in range(r)], axis=-2
    )


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
    pack_r: int = 1,
    packed_compute: bool = True,
    write_pressure: bool = True,
    interpret: bool = False,
):
    """Build ``fn(u, v, action) -> (u_next, v_next, p)`` over ``(B, ny, nx)``
    batches — the full projection step of ``NavierStokesEnv._advance`` as one
    ``pallas_call``. Requires f32 (Mosaic has no f64) and a scalar action
    (``action_dim == 1``); the env falls back to the XLA path otherwise.
    ``boundary_condition`` is the frozen per-edge tuple of the config.

    With ``pack_r`` = r > 1 the fields are expected (and produced) in the
    packed ``(B, ny//r, nx·r)`` layout of :func:`pack_field` — the carried
    rollout layout that keeps HBM↔VMEM DMA lane-dense (module docstring).
    """
    if dtype not in (jnp.float32, jnp.dtype("float32")):
        raise ValueError("fused NS step is float32-only (Mosaic has no f64)")
    r = int(pack_r)
    if r > 1 and (ny % r or 128 % (nx * r)):
        raise ValueError(f"pack_r={r} does not fold a {ny}x{nx} grid evenly")
    m, L = ny // r, nx * r
    basis = fused_basis(ny, nx, dtype)
    nu, rho = float(viscosity), float(density)
    dxf, dyf, dtf = float(dx), float(dy), float(dt)

    def _shift_x_plain(f, k):
        # out[..., x] = f[..., x+k], zero-filled at the vacated border
        z = jnp.zeros(f.shape[:-1] + (1,), f.dtype)
        if k == 1:
            return jnp.concatenate([f[..., 1:], z], axis=-1)
        return jnp.concatenate([z, f[..., :-1]], axis=-1)

    def _shift_y_plain(f, k):
        z = jnp.zeros(f.shape[:-2] + (1, f.shape[-1]), f.dtype)
        if k == 1:
            return jnp.concatenate([f[..., 1:, :], z], axis=-2)
        return jnp.concatenate([z, f[..., :-1, :]], axis=-2)

    # packed-shift masks, built ONCE per kernel invocation by _packed_masks
    # (inside the kernel body — pallas rejects captured traced constants)
    # so every shift call reuses one iota+compare
    _xbad = {}
    _ywrap_valid = {}
    _yedge = {}

    def _packed_masks():
        # called at the top of every kernel trace: clears any tracers from a
        # previous trace and rebuilds the masks inside the current one
        _xbad.clear(), _ywrap_valid.clear(), _yedge.clear()
        if r == 1:
            return
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, m, L), 2)
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, m, L), 1)
        _xbad[1] = (lane % nx) == nx - 1
        _xbad[-1] = (lane % nx) == 0
        _ywrap_valid[1] = lane < L - nx
        _ywrap_valid[-1] = lane >= nx
        _yedge[1] = sub == m - 1
        _yedge[-1] = sub == 0

    def _shift_x(f, k):
        # packed-aware: a logical x-shift is a lane shift, with the lanes
        # that crossed a chunk boundary (logical col wrapped) zeroed —
        # exactly the zero-fill the plain shift gives at the array border
        out = _shift_x_plain(f, k)
        if r > 1:
            out = jnp.where(_xbad[k], jnp.zeros_like(out), out)
        return out

    def _sroll(f, k):
        # circular sublane roll out[s] = f[(s+k) % m] as slice + concat along
        # the sublane dim: Mosaic only accepts layout offsets along the
        # concat dimension itself (a 1-row slice carries a sublane offset
        # that tpu.concatenate rejects on a lane-dim concat, and vice versa)
        k %= f.shape[-2]
        if k == 0:
            return f
        return jnp.concatenate([f[..., k:, :], f[..., :k, :]], axis=-2)

    def _lroll(f, k):
        # circular lane roll out[c] = f[(c+k) % L], same slice+concat scheme
        k %= f.shape[-1]
        if k == 0:
            return f
        return jnp.concatenate([f[..., k:], f[..., :k]], axis=-1)

    def _shift_y(f, k):
        # packed-aware: a logical y-shift is a sublane shift; the vacated
        # edge sublane takes the NEXT chunk's boundary row, which lives
        # ±nx lanes over in the opposite edge sublane (zero past chunk r−1).
        # Built from full-block circular rolls + masked selects — slicing
        # out the single edge row would give concat operands with mixed
        # sublane/lane offsets, which Mosaic refuses to concatenate.
        if r == 1:
            return _shift_y_plain(f, k)
        ro = _sroll(f, k)  # edge sublane now holds the wrap source row
        wrap = jnp.where(
            _ywrap_valid[k], _lroll(ro, k * nx), jnp.zeros_like(f)
        )
        return jnp.where(_yedge[k], wrap, ro)

    def _masks(rows, lanes):
        # logical (row, col) recovered from (sublane, lane): lane chunk j
        # holds logical rows [j·rows, (j+1)·rows). Degenerates to the plain
        # iota masks when lanes == nx (one chunk).
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, rows, lanes), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, rows, lanes), 2)
        row = (lane // nx) * rows + sub
        col = lane % nx
        interior = (row >= 1) & (row <= ny - 2) & (col >= 1) & (col <= nx - 2)
        edges = {
            "lower": row == 0,
            "upper": row == ny - 1,
            "left": col == 0,
            "right": col == nx - 1,
        }
        return interior, edges

    def _unpack_k(f):
        # in-kernel unpack (be, m, L) → (be, ny, nx): sublane-concat of lane
        # chunks (NO reshape — Mosaic has no lane↔sublane reshape). Each
        # chunk is realigned to lane offset 0 by a full-block circular roll
        # BEFORE the sublane concat: a direct f[..., j·nx:(j+1)·nx] slice
        # carries lane offset j·nx, which Mosaic rejects on a sublane concat.
        if r == 1:
            return f
        return jnp.concatenate(
            [_lroll(f, j * nx)[..., :nx] for j in range(r)], axis=-2
        )

    def _pack_k(f):
        # in-kernel repack (be, ny, nx) → (be, m, L); chunks realigned to
        # sublane offset 0 (full-block sublane roll) before the lane concat,
        # mirroring _unpack_k's offset rule
        if r == 1:
            return f
        return jnp.concatenate(
            [_sroll(f, j * m)[..., :m, :] for j in range(r)], axis=-1
        )

    def _apply_bc(u, v, act, edges, SX, SY):
        # static unroll of the reference's edge loop (navier_stokes2D.py:76-91)
        # in write order lower/upper/left/right x (u, v); Neumann reads the
        # CURRENT field's inner neighbor so corner overwrite chains match
        neighbor = {
            "lower": lambda f: SY(f, 1),
            "upper": lambda f: SY(f, -1),
            "left": lambda f: SX(f, 1),
            "right": lambda f: SX(f, -1),
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
               invT_ref, uo_ref, vo_ref, po_ref=None):
        be = u_ref.shape[0]
        _packed_masks()
        act = act_ref[:][:, :, None]  # (be, 1, 1) scalar per env
        if r > 1 and not packed_compute:
            # packed DMA, plain compute: unpack both fields up front, run the
            # whole physics in the logical layout, repack all three outputs
            u, v = _unpack_k(u_ref[:]), _unpack_k(v_ref[:])
            SX, SY = _shift_x_plain, _shift_y_plain
            interior, edges = _masks(ny, nx)
            unpack_g = lambda f: f
            pack_out = _pack_k
        else:
            u, v = u_ref[:], v_ref[:]
            SX, SY = _shift_x, _shift_y
            interior, edges = _masks(m, L)
            unpack_g = _unpack_k
            pack_out = lambda f: f

        # -- predictor (zero-bordered derivatives == interior select) -------
        def ddx(f):
            return (SX(f, 1) - SX(f, -1)) * (0.5 / dxf)

        def ddy(f):
            return (SY(f, 1) - SY(f, -1)) * (0.5 / dyf)

        def lap(f):
            return (
                SX(f, -1) + SY(f, -1) - 4.0 * f
                + SX(f, 1) + SY(f, 1)
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
        u_p, v_p = _apply_bc(u_p, v_p, act, edges, SX, SY)

        # -- spectral pressure solve (direct_pressure semantics) ------------
        # only g crosses into the unpacked domain and only p crosses back, so
        # the matmul pipeline below is reused verbatim in packed mode and its
        # numerics are unchanged
        g = unpack_g(jnp.where(
            interior,
            (-dxf * dyf * rho / dtf) * (ddx(u_p) + ddy(v_p)),
            jnp.zeros_like(u),
        ))
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
        # the reference's sequential mirror-ring copies (corner chain order),
        # in the unpacked domain p was produced in
        _, edges_u = _masks(ny, nx) if (r > 1 and packed_compute) else (None, edges)
        p = jnp.where(edges_u["right"], _shift_x_plain(p, -1), p)
        p = jnp.where(edges_u["lower"], _shift_y_plain(p, 1), p)
        p = jnp.where(edges_u["left"], _shift_x_plain(p, 1), p)
        p = jnp.where(edges_u["upper"], _shift_y_plain(p, -1), p)
        if packed_compute:
            p = _pack_k(p)

        # -- corrector + boundary re-application ----------------------------
        u_n = jnp.where(interior, u_p - (dtf / rho) * ddx(p), u_p)
        v_n = jnp.where(interior, v_p - (dtf / rho) * ddy(p), v_p)
        u_n, v_n = _apply_bc(u_n, v_n, act, edges, SX, SY)

        uo_ref[:] = pack_out(u_n)
        vo_ref[:] = pack_out(v_n)
        if po_ref is not None:
            po_ref[:] = pack_out(p)

    @functools.partial(jax.jit, static_argnames=())
    def step(u, v, action):
        batch = u.shape[0]
        tb = tile_b or _pick_tile_b(batch)
        act = jnp.asarray(action, dtype).reshape(batch, -1)[:, :1]
        field = lambda: pl.BlockSpec((tb, m, L), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
        const = lambda rr, cc: pl.BlockSpec((rr, cc), lambda i: (0, 0),
                                            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((batch, m, L), dtype)
        n_out = 3 if write_pressure else 2
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
            out_specs=[field()] * n_out,
            out_shape=[out_shape] * n_out,
            # the 16 MB scoped-vmem default is a compiler budget, not the
            # physical core limit (see ops/pallas1d.py); some tile sizes
            # need more in-kernel scratch than the default allows
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
            interpret=interpret,
        )(u, v, act, basis["qy"], basis["qyT"], basis["qx"], basis["qxT"],
          basis["invT"])

    return step
