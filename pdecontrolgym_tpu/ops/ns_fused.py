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
padding — a measured ~2x DMA tax on a kernel that was ~70% DMA-bound
(docs/PERFORMANCE.md item 15). With r = 128//nx, a field is carried BETWEEN
steps as ``(ny//r, nx·r)`` in "halves" packing — lane chunk j holds logical
rows ``[j·ny/r, (j+1)·ny/r)`` — which is a pure lane-concat of sublane
slices (NOT a reshape: Mosaic has no lane↔sublane reshape, but slicing and
concatenating along lanes it handles fine). All elementwise/stencil physics
runs natively packed (a y-shift is a sublane roll plus ONE row's ±nx lane
roll; x-shift chunk-boundary lanes are deliberately left unmasked — every
consumer is interior- or edge-masked away from them). The spectral solve
also stays packed: its x-side contractions run block-diagonally
(``kron(I_r, Qx)``, full 128-wide MXU) so ``g`` never unpacks and the
backward transform lands ``p`` directly packed; only the y-side matmuls
pass through the logical domain, reached by a transpose + chunk concat.
Optionally (``track_ref``) the NSReward tracking sum Σ(U−U_ref[t])² reduces
in VMEM on the just-computed fields. The ``packed_compute=False`` variant
(unpack both fields up front, plain compute, repack outputs) is kept for
A/B measurement.
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


def _pick_tile_b(batch: int, pack_r: int = 1) -> int:
    # packed blocks are half the VMEM, and the measured sweet spot moves up:
    # tb=128 beats 32 by ~13% at 2048x64x64 (fewer grid steps to pay per-tile
    # overhead on; still far below the raised VMEM ceiling)
    sizes = (128, 64, 32, 16, 8, 4, 2, 1) if pack_r > 1 else (32, 16, 8, 4, 2, 1)
    for tb in sizes:
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
    track_ref: bool = False,
    spectral_precision: str = "highest",
    interpret: bool = False,
    _ablate: str = "",
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
    if spectral_precision not in ("highest", "high", "default"):
        raise ValueError(
            f"spectral_precision must be 'highest', 'high' or 'default', "
            f"got {spectral_precision!r}"
        )
    r = int(pack_r)
    if r > 1 and (ny % r or 128 % (nx * r)):
        raise ValueError(f"pack_r={r} does not fold a {ny}x{nx} grid evenly")
    m, L = ny // r, nx * r
    basis = fused_basis(ny, nx, dtype)
    nu, rho = float(viscosity), float(density)
    dxf, dyf, dtf = float(dx), float(dy), float(dt)

    # Packed-native x-side transforms: with fields packed (m, L), the x
    # contraction of every lane chunk runs as ONE block-diagonal (L, L)
    # matmul — kron(I_r, Qx) — turning a K=N=nx (quarter-utilized at nx=64)
    # MXU matmul into a full-width K=N=128 one: 2x fewer MXU cycles for the
    # same math (the extra operand zeros add exact 0.0 terms). g then never
    # needs unpacking and the backward x-transform lands p directly packed.
    if r > 1 and packed_compute:
        import numpy as _np

        _eye = _np.eye(r, dtype=_np.float32)
        qx_in = jnp.asarray(_np.kron(_eye, _np.asarray(basis["qx"])), dtype)
        qxT_in = jnp.asarray(_np.kron(_eye, _np.asarray(basis["qxT"])), dtype)
        cx = L
    else:
        qx_in, qxT_in = basis["qx"], basis["qxT"]
        cx = nx

    # Effective MXU precision mode, resolved at build time ("mx*" ablates
    # are the measurement aliases of the spectral_precision knob).
    if "mxdefault" in _ablate or spectral_precision == "default":
        _prec_mode = "default"
    elif "mxhigh" in _ablate or spectral_precision == "high":
        _prec_mode = "high"
    else:
        _prec_mode = "highest"

    # Wide y-side ("q-packing"): the y-transform pair runs on (be, nx, ny)
    # intermediates whose minor dim is ny < 128 — at ny=64 every vreg/MXU
    # pass is half-empty. Pack r2 = 128//ny kx-rows into the lane axis
    # (ap[b, q, s·ny+y] = a[b, q+s·nq, y]) and contract with the
    # block-diagonal kron(I_r2, Qy): full-width MXU and 128-lane vregs for
    # the invT scale. The kron zeros double the y-side MACs, which the MXU
    # fully hides under the HBM DMA at bf16-pass precisions but NOT in
    # full-f32 HIGHEST passes (measured 0.675 vs 0.594 ms/step at
    # 2048x64x64) — so the wide pipeline is used exactly when the matmuls
    # run bf16 passes ("default"/"high") and the narrow one for "highest".
    r2 = (128 // ny
          if (r > 1 and packed_compute and 128 % ny == 0
              and _prec_mode != "highest")
          else 1)
    if r2 > 1 and nx % r2 == 0:
        import numpy as _np

        _ey = _np.eye(r2, dtype=_np.float32)
        qyK = jnp.asarray(_np.kron(_ey, _np.asarray(basis["qy"])), dtype)
        qyKT = jnp.asarray(_np.kron(_ey, _np.asarray(basis["qyT"])), dtype)
        nq = nx // r2
        _invT_np = _np.asarray(basis["invT"])  # (nx, ny)
        invK = jnp.asarray(
            _np.concatenate(
                [_invT_np[s * nq : (s + 1) * nq, :] for s in range(r2)],
                axis=-1,
            ),
            dtype,
        )  # (nq, r2·ny) — invT in the q-packed layout
        cy, cyT, inv_in = qyK, qyKT, invK
        cyn = r2 * ny
    else:
        r2 = 1
        cy, cyT, inv_in = basis["qy"], basis["qyT"], basis["invT"]
        nq = nx

    # Statically fused boundary-condition plan: for a field with no Neumann
    # edge, the reference's 4 sequential edge writes collapse to at most two
    # masked selects ("last writer wins" is computable at trace time from
    # the static write order lower/upper/left/right). Fields with a Neumann
    # edge keep the sequential chain (its inner-neighbor reads depend on
    # prior writes at corners).
    _bc_plans = []
    for _i in range(2):
        _conds = [boundary_condition[_e][_i] for _e in range(4)]
        if any(_c == "Neumann" for _c in _conds):
            _bc_plans.append(None)
        else:
            _bc_plans.append([_c == "Controllable" for _c in _conds])

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

    def _packed_masks():
        # packed-shift masks, built once per kernel trace (inside the kernel
        # body — pallas rejects captured traced constants) and passed to the
        # per-trace _shift_y so every shift call reuses one iota+compare.
        # Returned (not stashed in closure state): concurrent traces of the
        # same built step function must not see each other's tracers.
        if r == 1:
            return None
        sub = jax.lax.broadcasted_iota(jnp.int32, (1, m, L), 1)
        return {1: sub == m - 1, -1: sub == 0}

    def _shift_x(f, k):
        # packed-aware: a logical x-shift is just the lane shift. Lanes that
        # crossed a chunk boundary carry the NEIGHBORING logical row's value
        # instead of the logical zero-fill — deliberately left unmasked:
        # every consumer in this kernel (interior-masked derivatives, edge
        # Neumann reads, ring copies) reads only lanes where shift and
        # logical semantics agree, so the per-call cleanup select is pure
        # overhead. Do NOT reuse for a consumer that reads a field's
        # opposite-edge column through the shift.
        return _shift_x_plain(f, k)

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

    def _make_shift_y(yedge):
        # packed-aware: a logical y-shift is a sublane shift; the vacated
        # edge sublane takes the NEXT chunk's boundary row, which lives
        # ±nx lanes over in the opposite edge sublane (zero past chunk r−1).
        # Built from full-block circular rolls + masked selects — slicing
        # out the single edge row would give concat operands with mixed
        # sublane/lane offsets, which Mosaic refuses to concatenate.
        # ``yedge`` is this trace's mask dict from _packed_masks.
        def _shift_y(f, k):
            if r == 1:
                return _shift_y_plain(f, k)
            # the wrap row's out-of-range lanes (logical rows beyond the
            # grid, i.e. the vacated final chunk) carry wrapped-around
            # values instead of the logical zero-fill — unmasked for the
            # same reason as _shift_x: no consumer in this kernel reads them
            ro = _sroll(f, k)  # edge sublane now holds the wrap source row
            return jnp.where(yedge[k], _lroll(ro, k * nx), ro)

        return _shift_y

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

    def _bc_masks(edges):
        # last-writer-wins masks per Neumann-free field: edge k's effective
        # cells are its cells minus any later-written edge's (corner chains
        # of the reference's sequential writes, resolved statically)
        masks = []
        for plan in _bc_plans:
            if plan is None:
                masks.append(None)
                continue
            zero_m = act_m = None
            for k in range(4):
                eff = edges[_EDGES[k]]
                for k2 in range(k + 1, 4):
                    eff = eff & ~edges[_EDGES[k2]]
                if plan[k]:
                    act_m = eff if act_m is None else (act_m | eff)
                else:
                    zero_m = eff if zero_m is None else (zero_m | eff)
            masks.append((zero_m, act_m))
        return masks

    def _apply_bc(u, v, act, edges, SX, SY, bcm):
        # the reference's edge loop (navier_stokes2D.py:76-91) in write order
        # lower/upper/left/right x (u, v). Neumann-free fields use the fused
        # two-select form (bcm); otherwise the sequential unroll, whose
        # Neumann writes read the CURRENT field's inner neighbor so corner
        # overwrite chains match.
        neighbor = {
            "lower": lambda f: SY(f, 1),
            "upper": lambda f: SY(f, -1),
            "left": lambda f: SX(f, 1),
            "right": lambda f: SX(f, -1),
        }
        out = []
        for i, f in enumerate((u, v)):
            if bcm[i] is not None:
                zero_m, act_m = bcm[i]
                if zero_m is not None:
                    f = jnp.where(zero_m, jnp.zeros_like(f), f)
                if act_m is not None:
                    f = jnp.where(act_m, act, f)
            else:
                for pos, conds in zip(_EDGES, boundary_condition):
                    cond = conds[i]
                    if cond == "Neumann":
                        f = jnp.where(edges[pos], neighbor[pos](f), f)
                    elif cond == "Controllable":
                        f = jnp.where(edges[pos], act, f)
                    else:  # Dirichlet / "Dirchilet"
                        f = jnp.where(edges[pos], jnp.zeros_like(f), f)
            out.append(f)
        return out[0], out[1]

    # staging scratch for the specprobe_store measurement variant (lane-
    # slice stores vs 4-way concats for the wide pipeline's block merges —
    # measured EQUAL, 0.468 vs 0.464 ms/step at 2048x64x64: the per-trip
    # cost is the transposes' data movement itself, not the merge
    # mechanism); last kernel ref when present
    use_scr = "specprobe_store" in _ablate

    def kernel(*refs):
        (u_ref, v_ref, act_ref, qy_ref, qyT_ref, qx_ref, qxT_ref,
         invT_ref) = refs[:8]
        pos = 8
        uref_ref = vref_ref = None
        if track_ref:
            uref_ref, vref_ref = refs[8:10]
            pos = 10
        scr = refs[-1] if use_scr else None
        outs = refs[pos:-1] if use_scr else refs[pos:]
        uo_ref, vo_ref = outs[0], outs[1]
        po_ref = outs[2] if write_pressure else None
        ts_ref = outs[-1] if track_ref else None

        def _track(u_out, v_out):
            # NSReward's tracking term Σ(U−U_ref)² reduced IN VMEM on the
            # just-computed fields (carried layout on both sides): the XLA
            # reduce re-read both (B, m, L) fields from HBM every step —
            # ~2 field DMAs that never overlap the next kernel call
            if ts_ref is None:
                return
            du = u_out - uref_ref[:][None]
            dv = v_out - vref_ref[:][None]
            # staged reduction (sublanes, then lanes): a multi-axis
            # jnp.sum(axis=(1, 2)) SIGABRTs this Mosaic version
            s = jnp.sum(du * du + dv * dv, axis=1)  # (be, L)
            ts_ref[:] = jnp.sum(s, axis=1, keepdims=True)

        be = u_ref.shape[0]
        act = act_ref[:][:, :, None]  # (be, 1, 1) scalar per env
        if r > 1 and not packed_compute:
            # packed DMA, plain compute: unpack both fields up front, run the
            # whole physics in the logical layout, repack all three outputs
            u, v = _unpack_k(u_ref[:]), _unpack_k(v_ref[:])
            SX, SY = _shift_x_plain, _shift_y_plain
            interior, edges = _masks(ny, nx)
            pack_out = _pack_k
        else:
            u, v = u_ref[:], v_ref[:]
            SX, SY = _shift_x, _make_shift_y(_packed_masks())
            interior, edges = _masks(m, L)
            pack_out = lambda f: f
        bcm = _bc_masks(edges)

        # -- predictor (zero-bordered derivatives == interior select) -------
        # the four neighbor shifts of each field are computed ONCE and shared
        # between the advection derivatives and the Laplacian
        def d4(f):
            return SX(f, 1), SX(f, -1), SY(f, 1), SY(f, -1)

        def predict(f, fxp, fxm, fyp, fym):
            ddxf = (fxp - fxm) * (0.5 / dxf)
            ddyf = (fyp - fym) * (0.5 / dyf)
            lapf = (fxm + fym - 4.0 * f + fxp + fyp) * (1.0 / (dxf * dyf))
            return jnp.where(
                interior,
                f + dtf * (-u * ddxf - v * ddyf + nu * lapf),
                f,
            )

        if "stencil" in _ablate:  # perf-ablation only (not semantics)
            u_p, v_p = u * 0.999, v * 0.999
        else:
            u_p = predict(u, *d4(u))
            v_p = predict(v, *d4(v))
        if "bc" not in _ablate:
            u_p, v_p = _apply_bc(u_p, v_p, act, edges, SX, SY, bcm)

        def ddx(f):
            return (SX(f, 1) - SX(f, -1)) * (0.5 / dxf)

        def ddy(f):
            return (SY(f, 1) - SY(f, -1)) * (0.5 / dyf)

        # -- spectral pressure solve (direct_pressure semantics) ------------
        g = jnp.where(
            interior,
            (-dxf * dyf * rho / dtf) * (ddx(u_p) + ddy(v_p)),
            jnp.zeros_like(u),
        )
        if "spectral" in _ablate:
            p = g
            u_n = jnp.where(interior, u_p - (dtf / rho) * ddx(p), u_p)
            v_n = jnp.where(interior, v_p - (dtf / rho) * ddy(p), v_p)
            if "bc" not in _ablate:
                u_n, v_n = _apply_bc(u_n, v_n, act, edges, SX, SY, bcm)
            uo_ref[:] = pack_out(u_n)
            vo_ref[:] = pack_out(v_n)
            if po_ref is not None:
                po_ref[:] = pack_out(p)
            _track(uo_ref[:], vo_ref[:])
            return
        qy, qyT, qx, qxT, invT = (
            qy_ref[:], qyT_ref[:], qx_ref[:], qxT_ref[:], invT_ref[:]
        )

        # "highest" (default) runs the spectral matmuls in full-f32 MXU
        # passes — bit-comparable to the XLA twin. "high" is the bf16_3x
        # 3-pass scheme (hi/lo bf16 split, ~f32-mantissa products; Mosaic
        # has no Precision.HIGH so the passes are spelled out); "default"
        # is the single bf16 pass. Both cheaper modes also run the two
        # in-kernel transposes on bf16 ("default") — identical rounding to
        # what the DEFAULT matmul does to its inputs anyway — which halves
        # the shuffle bytes (the measured bottleneck of the wide pipeline).
        # Opt-in config knobs, never auto-picked (docs/PERFORMANCE.md).
        _prec = (jax.lax.Precision.DEFAULT if _prec_mode != "highest"
                 else jax.lax.Precision.HIGHEST)
        # dtype the layout shuffles (swapaxes/concats) run in
        _shufdt = jnp.bfloat16 if _prec_mode == "default" else jnp.float32

        def bdot(x3, m2, rows):
            # (be, rows, k) @ (k, cols): every env batches into ONE MXU
            # matmul. x3 may arrive bf16 (post-shuffle in "default" mode).
            x2 = x3.reshape(be * rows, m2.shape[0])
            if _prec_mode == "high":
                xh = x2.astype(jnp.bfloat16)
                xl = (x2 - xh.astype(jnp.float32)).astype(jnp.bfloat16)
                wh = m2.astype(jnp.bfloat16)
                wl = (m2 - wh.astype(jnp.float32)).astype(jnp.bfloat16)
                dot = lambda a, b: jnp.dot(
                    a, b, preferred_element_type=jnp.float32)
                out = dot(xh, wh) + (dot(xh, wl) + dot(xl, wh))
            elif _prec_mode == "default":
                out = jnp.dot(
                    x2.astype(jnp.bfloat16), m2.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
            else:
                out = jnp.dot(
                    x2, m2, preferred_element_type=jnp.float32,
                    precision=_prec,
                )
            return out.reshape(be, rows, m2.shape[1])

        if "spec4mm" in _ablate:  # perf probe: 4 full-width kron matmuls,
            # NO transposes/packs — isolates MXU cost from layout-shuffle
            # cost inside the spectral section (1.33x the real matmul MACs)
            q = qx_ref[:]
            pp = bdot(g, q, m)
            pp = bdot(pp, q, m)
            pp = bdot(pp, q, m)
            p = bdot(pp, q, m)
            u_n = jnp.where(interior, u_p - (dtf / rho) * ddx(p), u_p)
            v_n = jnp.where(interior, v_p - (dtf / rho) * ddy(p), v_p)
            u_n, v_n = _apply_bc(u_n, v_n, act, edges, SX, SY, bcm)
            uo_ref[:] = pack_out(u_n)
            vo_ref[:] = pack_out(v_n)
            if po_ref is not None:
                po_ref[:] = pack_out(p)
            _track(uo_ref[:], vo_ref[:])
            return

        if "specprobe" in _ablate and r > 1 and packed_compute and r2 > 1:
            # perf probes (wrong math, right shapes/structure):
            # specprobe_mm — the 4 wide matmuls + invT scale, NO shuffles;
            # specprobe_shuf — the 2 transposes + 2 four-way concats, NO
            # matmuls. Together they bracket the wide pipeline's cost split.
            if "specprobe_mm" in _ablate:
                t = bdot(g, qy, m) * invT
                e3 = bdot(t, qyT, m)
                pp = bdot(bdot(e3, qx, m), qxT, m)
            elif "specprobe_store" in _ablate:
                # the same two transposes + block merges as specprobe_shuf,
                # but the merges are lane-slice STORES into the staging
                # scratch instead of 4-way lane concats
                aT = jnp.swapaxes(g, 1, 2)
                for s in range(r2):
                    for j in range(r):
                        scr[:, 0:nq, (s * r + j) * m:(s * r + j + 1) * m] = (
                            aT[:, j * nx + s * nq : j * nx + s * nq + nq, :]
                        )
                ap = scr[:, 0:nq, :]
                e3T = jnp.swapaxes(ap * 1.0001, 1, 2)
                for j in range(r):
                    for s in range(r2):
                        scr[:, 0:m, j * nx + s * nq:j * nx + s * nq + nq] = (
                            e3T[:, s * ny + j * m : s * ny + j * m + m, :]
                        )
                pp = scr[:, 0:m, :]
            else:  # specprobe_shuf
                aT = jnp.swapaxes(g, 1, 2)
                ap = jnp.concatenate(
                    [aT[:, j * nx + s * nq : j * nx + s * nq + nq, :]
                     for s in range(r2) for j in range(r)], axis=-1)
                e3T = jnp.swapaxes(ap * 1.0001, 1, 2)
                pp = jnp.concatenate(
                    [e3T[:, s * ny + j * m : s * ny + j * m + m, :]
                     for j in range(r) for s in range(r2)], axis=-1)
            p = pp
            u_n = jnp.where(interior, u_p - (dtf / rho) * ddx(p), u_p)
            v_n = jnp.where(interior, v_p - (dtf / rho) * ddy(p), v_p)
            u_n, v_n = _apply_bc(u_n, v_n, act, edges, SX, SY, bcm)
            uo_ref[:] = pack_out(u_n)
            vo_ref[:] = pack_out(v_n)
            if po_ref is not None:
                po_ref[:] = pack_out(p)
            _track(uo_ref[:], vo_ref[:])
            return
        if r > 1 and packed_compute and r2 > 1:
            # fully-wide packed transform (round 5): every intermediate
            # keeps a 128-lane minor so all four contractions are identical
            # full-width block-diagonal matmuls and the invT scale runs on
            # full vregs (the old path's ny-wide y-side was the measured
            # bottleneck — not the transposes, which are cheap in VMEM).
            # Layouts: g packed [sub, j·nx+kx-ish]; aT [j·nx+kx, sub];
            # ap q-packed [q, s·ny+y]; t/e3 q-packed modes; e3T [s·ny+y, q];
            # pin packed [sub, j·nx+kx]; p packed.
            aT = jnp.swapaxes(bdot(g, qx, m).astype(_shufdt), 1, 2)
            # compose chunk-merge + q-pack in ONE shuffle: lane block (s, j)
            # at offset s·ny + j·m holds rows j·nx + s·nq .. +nq of aT
            ap = jnp.concatenate(
                [aT[:, j * nx + s * nq : j * nx + s * nq + nq, :]
                 for s in range(r2) for j in range(r)], axis=-1
            )  # (be, nq, r2·ny): ap[b, q, s·ny+y] = A[b, y, kx=q+s·nq]
            t = bdot(ap, qy, nq) * invT  # qy = kron(I_r2, Qy); invT = invK
            e3 = bdot(t, qyT, nq)  # (be, nq, r2·ny): [q, s·ny+y]
            e3T = jnp.swapaxes(e3.astype(_shufdt), 1, 2)  # (be, r2·ny, nq)
            # compose unpack + transpose-pack: lane block (j, s) at offset
            # j·nx + s·nq takes rows s·ny + j·m .. +m of e3T
            pin = jnp.concatenate(
                [e3T[:, s * ny + j * m : s * ny + j * m + m, :]
                 for j in range(r) for s in range(r2)], axis=-1
            )  # (be, m, L): pin[b, sub, j·nx+kx] = E[b, kx, y=j·m+sub]
            p = bdot(pin, qxT, m)  # (be, m, L) packed P
            p = jnp.where(edges["right"], SX(p, -1), p)
            p = jnp.where(edges["lower"], SY(p, 1), p)
            p = jnp.where(edges["left"], SX(p, 1), p)
            p = jnp.where(edges["upper"], SY(p, -1), p)
        elif r > 1 and packed_compute:
            # packed-native transform: x contractions are block-diagonal
            # kron(I_r, Qx) matmuls on the packed layout (full MXU width);
            # the y side runs in the logical domain reached by transposing
            # the packed A and lane-concatenating its chunks (which IS the
            # plain 'a' — no unpack needed). The backward x matmul lands p
            # directly packed, so the ring copies run packed too.
            a = jnp.swapaxes(bdot(g, qx, m).astype(_shufdt), 1, 2)
            a = jnp.concatenate(
                [a[:, j * nx : (j + 1) * nx, :] for j in range(r)], axis=-1
            )  # (be, nx, ny) == plain A transposed: [l, y]
            t = bdot(a, qy, nx) * invT
            e = jnp.swapaxes(bdot(t, qyT, nx).astype(_shufdt), 1, 2)
            p = bdot(_pack_k(e), qxT, m)  # (be, m, L) packed P
            p = jnp.where(edges["right"], SX(p, -1), p)
            p = jnp.where(edges["lower"], SY(p, 1), p)
            p = jnp.where(edges["left"], SX(p, 1), p)
            p = jnp.where(edges["upper"], SY(p, -1), p)
        else:
            # transpose-pipelined transform: each contraction is a batched
            # (be·dim, dim) @ (dim, dim) matmul on the minor axis; the two
            # batched minor-dim transposes swap which grid axis is minor.
            # A[b,y,l] = Σx g·Qx; Tt[b,l,k] = Σy At·Qy (= T transposed);
            # E[b,l,y] = Σk (Tt⊙invT)·Qyᵀ; P[b,y,x] = Σl Et·Qxᵀ.
            a = jnp.swapaxes(bdot(g, qx, ny).astype(_shufdt), 1, 2)
            t = bdot(a, qy, nx) * invT
            p = jnp.swapaxes(bdot(t, qyT, nx).astype(_shufdt), 1, 2)
            p = bdot(p, qxT, ny)
            # the reference's sequential mirror-ring copies (corner chain
            # order), in the same domain p was produced in
            p = jnp.where(edges["right"], _shift_x_plain(p, -1), p)
            p = jnp.where(edges["lower"], _shift_y_plain(p, 1), p)
            p = jnp.where(edges["left"], _shift_x_plain(p, 1), p)
            p = jnp.where(edges["upper"], _shift_y_plain(p, -1), p)

        # -- corrector + boundary re-application ----------------------------
        u_n = jnp.where(interior, u_p - (dtf / rho) * ddx(p), u_p)
        v_n = jnp.where(interior, v_p - (dtf / rho) * ddy(p), v_p)
        u_n, v_n = _apply_bc(u_n, v_n, act, edges, SX, SY, bcm)

        u_out, v_out = pack_out(u_n), pack_out(v_n)
        uo_ref[:] = u_out
        vo_ref[:] = v_out
        if po_ref is not None:
            po_ref[:] = pack_out(p)
        _track(u_out, v_out)

    @functools.partial(jax.jit, static_argnames=())
    def step(u, v, action, uref=None, vref=None):
        batch = u.shape[0]
        tb = tile_b or _pick_tile_b(batch, r)
        act = jnp.asarray(action, dtype).reshape(batch, -1)[:, :1]
        field = lambda: pl.BlockSpec((tb, m, L), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM)
        const = lambda rr, cc: pl.BlockSpec((rr, cc), lambda i: (0, 0),
                                            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((batch, m, L), dtype)
        ins = [u, v, act, cy, cyT, qx_in, qxT_in, inv_in]
        in_specs = [
            field(), field(),
            pl.BlockSpec((tb, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const(*cy.shape), const(*cyT.shape),
            const(cx, cx), const(cx, cx), const(*inv_in.shape),
        ]
        out_specs = [field(), field()]
        out_shapes = [out_shape, out_shape]
        if write_pressure:
            out_specs.append(field())
            out_shapes.append(out_shape)
        if track_ref:
            # U_ref[t] row, shared by every env: two (m, L) consts per step
            ins.extend([jnp.asarray(uref, dtype), jnp.asarray(vref, dtype)])
            in_specs.extend([const(m, L), const(m, L)])
            out_specs.append(
                pl.BlockSpec((tb, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shapes.append(jax.ShapeDtypeStruct((batch, 1), dtype))
        return pl.pallas_call(
            kernel,
            grid=(batch // tb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=(
                [pltpu.VMEM((tb, m, L), dtype)] if use_scr else []
            ),
            # u/v outputs overwrite the u/v input buffers in place: block i
            # only ever reads ITS OWN input block (plus broadcast consts),
            # and the pipeline fetches block i before writing block i, so
            # in-place is hazard-free. Without this, every scan-carried
            # rollout step paid two (B, m, L) XLA copies re-homing the
            # kernel outputs into the carry buffers — 0.20 ms/step of the
            # measured 0.80 at 2048x64x64 (profiler trace, round 5). XLA
            # still inserts a defensive copy when the caller's input buffer
            # is live elsewhere (e.g. custom_vjp residuals in training).
            input_output_aliases={0: 0, 1: 1},
            # the 16 MB scoped-vmem default is a compiler budget, not the
            # physical core limit (see ops/pallas1d.py); some tile sizes
            # need more in-kernel scratch than the default allows. The env
            # grid axis is embarrassingly parallel — telling Mosaic lets it
            # pipeline tiles without cross-iteration ordering constraints.
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(*ins)

    return step
