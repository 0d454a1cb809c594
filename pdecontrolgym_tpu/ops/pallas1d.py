"""Pallas TPU kernels: a full control interval of 1D PDE sub-steps in VMEM.

The XLA path runs the sub-step loop as ``lax.scan``, whose carry round-trips
HBM every iteration: at 4096 envs x 128 points that is ~4 MB of HBM traffic
per sub-step — the throughput ceiling. These kernels instead tile the env
batch into VMEM, run ALL ``S`` sub-steps of the control interval on-chip, and
write back once: HBM traffic per agent step drops from ``2·S·B·nx`` floats to
``(2·nx + S)·B`` (state in/out + the per-sub-step L2 norms the reward needs).

The per-PDE sub-step is injected as a traced in-place function
``update(us, beta_ref, ctrl, aux) -> boundary`` over a transposed
``(state_dim_padded, tile_b)`` VMEM scratch (PDE axis on sublanes, envs on
lanes), so transport / reaction-diffusion / Burgers share one kernel
skeleton. Neighbor reads are offset sublane slices and boundary writes are
1-row stores — no full-width lane rotations or selects in the hot body.

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


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


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

    Why transposed: with envs on sublanes the stencil neighbor reads are
    full-width lane rotations and the boundary writes are full-width lane
    selects (a lane-layout kernel skeleton measured 1.28x slower on the
    Burgers flux-form body: 384M vs 493M sub-steps/s at 4096x256, min-of-5
    in one process — it was removed once every env switched). Here the
    neighbor read is an offset sublane slice of the scratch (``us[1:nx+1]``
    vs ``us[0:nx]``) and each boundary write is a 1-row store.

    ``update_fn(us, beta_ref, ctrl, aux) -> boundary`` performs ONE sub-step
    in place on ``us[0:state_dim, :]`` (rows state_dim..state_dim+7 are
    zeroed padding so an offset-by-one slice stays in bounds) and returns the
    ``(1, tb)`` boundary row. External contract:
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
    # make_aux(shape, beta_ref, ctrl, *scratch) -> aux: per-tile
    # loop-invariant precomputation run ONCE per interval (e.g. the implicit
    # body's PCR coefficient elimination — the equivalent of XLA's
    # loop-invariant code motion, but VMEM-resident). An update_fn may
    # request a dedicated VMEM scratch block via ``aux_scratch_rows = R``:
    # make_aux then receives a (R, tb) scratch ref to WRITE its factors
    # into, and the sub-step body reads them back as ref slices. Staging
    # through memory instead of carrying ~20 live traced arrays across the
    # sub-step loop is what keeps Mosaic's live-range analysis (and compile
    # time) sane — the round-4 in-kernel-elimination attempt without it
    # compiled for ~7 minutes.
    make_aux = getattr(
        update_fn, "make_aux", lambda shape, beta_ref, ctrl, *scr: None
    )
    aux_rows = int(getattr(update_fn, "aux_scratch_rows", 0))
    boundary_const = bool(getattr(update_fn, "boundary_const", False))
    # update_fn.beta_rows = K > 1: the "beta" operand carries K stacked
    # (state_dim-padded) per-row blocks instead of one — e.g. the implicit
    # body's PCR elimination factors, precomputed per interval in XLA by
    # beta_transform. Keeping that phase OUT of the kernel collapsed Mosaic
    # compile time (the 20 arrays' in-kernel live ranges were the killer)
    # at an amortized-DMA cost of K blocks per interval.
    beta_rows = int(getattr(update_fn, "beta_rows", 1))

    def kernel(u_ref, beta_ref, ctrl_ref, t0_ref, uo_ref, norms_ref, bsum_ref,
               to_ref, us, *aux_scr):
        ctrl = ctrl_ref[:]  # (1, tb)
        t0 = t0_ref[:]  # (1, tb) i32
        us[0:D, :] = u_ref[:]
        us[D:NP, :] = jnp.zeros((NP - D, us.shape[1]), u_ref.dtype)
        aux = make_aux((D, us.shape[1]), beta_ref, ctrl, *aux_scr)

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
            tb = min(B, tile_b)
        else:
            tb = tile_b if (tile_b % 128 == 0 and B % tile_b == 0) else 128
        Bp = -(-B // tb) * tb  # pad so the grid covers the whole batch
        # (lane blocks must also be 128-aligned on real TPUs)
        if beta_transform is not None:
            # hoist loop-invariant scaling (e.g. dt·beta) out of the kernel
            beta = beta_transform(beta)
        ut = jnp.zeros((D, Bp), u.dtype).at[:Ds, :B].set(u.T)
        BD = beta_rows * D
        betat = jnp.zeros((BD, Bp), u.dtype).at[: beta.shape[-1], :B].set(beta.T)
        ctrlt = jnp.zeros((1, Bp), u.dtype).at[:, :B].set(ctrl.T)
        t0t = jnp.zeros((1, Bp), jnp.int32).at[:, :B].set(t0.T)
        # Large states: single-buffer the (D, tb) column blocks. The default
        # pipeline double-buffers every operand, and at D=4096 the 3 big
        # blocks' double buffers + scratch requested 17.8 MB > 16 MB VMEM
        # (the round-2 cliff where auto fell back to XLA at 5.9M sub-steps/s).
        # The kernel runs the WHOLE S-sub-step interval per tile, so compute
        # dominates the tile DMA by ~10⁴ and prefetch overlap is worthless:
        # buffer_count=1 halves the footprint (fits through D≈7600) at no
        # measured cost (4096-row rates within noise of the 2048 crossover
        # trend — docs/PERFORMANCE.md §4).
        big = pl.Buffered(buffer_count=1) if D >= 3072 else None
        col_spec = pl.BlockSpec((D, tb), lambda i: (0, i),
                                memory_space=pltpu.VMEM, pipeline_mode=big)
        beta_spec = col_spec if beta_rows == 1 else pl.BlockSpec(
            (BD, tb), lambda i: (0, i), memory_space=pltpu.VMEM,
            pipeline_mode=big,
        )
        row_spec = pl.BlockSpec((1, tb), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        norm_spec = pl.BlockSpec((Wp, tb), lambda i: (0, i),
                                 memory_space=pltpu.VMEM, pipeline_mode=big)
        u_out, norms, bsum, t_out = pl.pallas_call(
            kernel,
            grid=(Bp // tb,),
            in_specs=[col_spec, beta_spec, row_spec, row_spec],
            out_specs=[col_spec, norm_spec, row_spec, row_spec],
            out_shape=[
                jax.ShapeDtypeStruct((D, Bp), u.dtype),
                jax.ShapeDtypeStruct((Wp, Bp), u.dtype),
                jax.ShapeDtypeStruct((1, Bp), u.dtype),
                jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            ],
            scratch_shapes=(
                [pltpu.VMEM((NP, tb), u.dtype)]
                + ([pltpu.VMEM((aux_rows, tb), u.dtype)] if aux_rows else [])
            ),
            interpret=interpret,
            # the default scoped-vmem budget reserves headroom we don't need
            # (no nested scopes, no spills): claim the full 128 MiB ceiling
            # so D=8192 (16.05 MiB of blocks+scratch) compiles. Mosaic still
            # fails loudly if the physical core can't satisfy it.
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(ut, betat, ctrlt, t0t)
        return (u_out[:Ds, :B].T, norms[:, :B].T, bsum[:, :B].T,
                t_out[:, :B].T)

    return fn


# -- per-PDE transposed in-place sub-steps (row-parallel _advance forms) -----


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
    """Transposed in-place transport sub-step (envs/transport.py semantics):
    boundary row nx-1 is the pre-resolved control value (constant over the
    interval — the Neumann neighbor quirk reads a zero), interior is the
    upwind step. The upwind stencil only reads the
    +1 neighbor, so the zero pad rows stay zero (beta pads are zero).
    The folded association (dt/dx pre-divided statically, beta pre-scaled by
    dt via ``beta_transform``) drops the per-point divide+mul — 12% on the
    kernel (4.13B → 4.64B sub-steps/s at the bench config) — and keeps the
    XLA path's exact association (envs/transport.py uses the same fold) so
    the two backends still match bitwise."""
    dp = _pad8(nx)
    dtdx = dt / dx

    def update(us, beta_ref, ctrl, aux):
        u = us[0:dp, :]
        up = us[1:dp + 1, :]
        # u[0:1] is the OLD recirculation value u(0,t), broadcast down rows;
        # beta_ref is dt-scaled
        un = u + dtdx * (up - u) + u[0:1, :] * beta_ref[:]
        us[0:dp, :] = un
        us[nx - 1:nx, :] = ctrl
        return ctrl

    update.transposed = True
    update.boundary_const = True
    update.beta_transform = lambda beta: beta * dt
    return update


def reaction_diffusion_implicit_update_t(dt: float, dx: float,
                                         state_dim: int, theta: float,
                                         neumann: bool,
                                         elimination: str = "kernel"):
    """Transposed in-place implicit θ-scheme sub-step with a VMEM-resident
    PCR solve (``envs/reaction_diffusion.py:_implicit_interior`` semantics:
    ``(I − θ·dt·L) u⁺ = (I + (1−θ)·dt·L) u``, edge rows pinned to u(0)=0 and
    u(X)=control, L = ∂²/∂x² + diag(β)).

    The tridiagonal coefficients are CONSTANT across sub-steps (β and dt are
    fixed), so the whole PCR elimination of (a, b, c) runs ONCE per interval
    and each sub-step only reduces the rhs: ceil(log2 n) steps of
    ``d += α_k·shift(d, s) + β_k·shift(d, −s)`` plus one multiply, all on
    the VMEM tile. XLA performs the same hoisting (LICM over the scan) but
    pays HBM for every d round trip — the measured gap at 4096×257
    (docs/PERFORMANCE.md).

    Two elimination placements:

    - ``"kernel"`` (default, round 5): the elimination runs IN-KERNEL once
      per interval, writing its per-step (α, β) factors, 1/b and the
      explicit-part diagonal into a dedicated VMEM scratch block
      (``aux_scratch_rows``); the sub-step body reads them back as ref
      slices. Staging through memory is the fix for the round-4 attempt
      whose ~20 live traced factor arrays blew Mosaic's live-range analysis
      to ~7 min of compile — ref reads have no SSA live range. Only β ships
      over HBM (1 block per interval instead of K≈20): the measured 153M →
      205M sub-steps/s gap at 4096×257 was that factor-block DMA.
    - ``"xla"`` (round-4 behavior, kept as fallback): ``beta_transform``
      computes the same factors in XLA per interval and ships them in as
      stacked blocks of the beta operand (``beta_rows``).

    Zero-shift semantics at the array edges are reproduced by giving the
    padded rows identity-row coefficients (a=c=0, b=1, d=0) and one-filling
    b shifts, which also removes the XLA path's division guard.
    """
    if elimination not in ("kernel", "xla"):
        raise ValueError(f"elimination must be 'kernel' or 'xla', "
                         f"got {elimination!r}")
    F = dt / dx**2
    th = float(theta)
    n = state_dim
    dp = _pad8(n)
    steps = max((max(n, 2) - 1).bit_length(), 1)
    has_eb = th < 1.0
    K = 2 * steps + 1 + (1 if has_eb else 0)  # alphas, betas, inv_b[, eb]
    PADR = 1 << (steps - 1)  # max PCR stride = d-staging pad rows per side
    _dsbase = K * dp  # d-staging region offset inside the factor scratch

    def beta_transform(beta):
        """(β…, n) → (…, K·dp): the PCR elimination factors, per env, padded
        to the kernel's row count per block (pads = decoupled identity rows)."""
        dt_c = jnp.asarray(dt, beta.dtype)
        F_c = jnp.asarray(F, beta.dtype)
        th_c = jnp.asarray(th, beta.dtype)
        lead = beta.shape[:-1]
        row = jnp.arange(dp)
        interior = (row >= 1) & (row < n - 1)
        bpad = jnp.zeros(lead + (dp,), beta.dtype).at[..., :n].set(beta)
        b = jnp.where(interior,
                      1.0 + th_c * (2.0 * F_c - dt_c * bpad),
                      jnp.ones(lead + (dp,), beta.dtype))
        off = jnp.where(interior, -th_c * F_c, 0.0).astype(beta.dtype)
        a, c = off, off

        def shift(x, k, fill=0.0):
            pad = [(0, 0)] * (x.ndim - 1)
            if k > 0:
                return jnp.pad(x, pad + [(k, 0)],
                               constant_values=fill)[..., :dp]
            return jnp.pad(x, pad + [(0, -k)],
                           constant_values=fill)[..., -dp:]

        blocks = []
        stride = 1
        for _ in range(steps):
            am, cm = shift(a, stride), shift(c, stride)
            bm = shift(b, stride, 1.0)
            ap, cp_ = shift(a, -stride), shift(c, -stride)
            bp = shift(b, -stride, 1.0)
            alpha = -a / bm
            beta_k = -c / bp
            b = b + alpha * cm + beta_k * ap
            a = alpha * am
            c = beta_k * cp_
            blocks.extend([alpha, beta_k])
            stride *= 2
        blocks.append(1.0 / b)
        if has_eb:
            # explicit-part diagonal 1 + (1−θ)(dtβ − 2F); θ=1 (backward
            # Euler) statically drops the whole rhs stencil instead
            blocks.append(1.0 + (1.0 - th_c) * (dt_c * bpad - 2.0 * F_c))
        return jnp.concatenate(blocks, axis=-1)

    def _shift_rows(x, k, fill=0.0):
        # out[i] = x[i-k] along the sublane (row) axis, fill at the vacated
        # rows (k may be negative)
        rows = x.shape[0]
        pad = jnp.full((abs(k), x.shape[1]), fill, x.dtype)
        if k > 0:
            return jnp.concatenate([pad, x[: rows - k, :]], axis=0)
        return jnp.concatenate([x[-k:, :], pad], axis=0)

    def _masks(shape, dtype):
        # masks folded to f32 so the per-sub-step rhs pinning is one
        # multiply + one fused add instead of two selects
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        keep = ((row >= 1) & (row < n - 1)).astype(dtype)
        last = (row == n - 1).astype(dtype)
        return keep, last

    def make_aux_xla(shape, beta_ref, ctrl, *scr):
        blk = lambda k: beta_ref[k * dp : (k + 1) * dp, :]
        alphas = tuple(blk(2 * s) for s in range(steps))
        betas = tuple(blk(2 * s + 1) for s in range(steps))
        inv_b = blk(2 * steps)
        eb = blk(2 * steps + 1) if has_eb else None
        keep, last = _masks(shape, inv_b.dtype)
        return alphas, betas, inv_b, keep, last, eb

    def make_aux_kernel(shape, beta_ref, ctrl, fac):
        # the same elimination as beta_transform, run on the VMEM tile and
        # staged through the `fac` scratch ref block by block
        dtype = fac.dtype
        keep, last = _masks(shape, dtype)
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        bpad = beta_ref[0:dp, :]  # β, zero pads (masked to identity below)
        b = jnp.where(keep > 0, 1.0 + th * (2.0 * F - dt * bpad), 1.0)
        off = keep * (-th * F)
        a, c = off, off
        stride = 1
        for s in range(steps):
            am, cm = _shift_rows(a, stride), _shift_rows(c, stride)
            bm = _shift_rows(b, stride, 1.0)
            ap, cp_ = _shift_rows(a, -stride), _shift_rows(c, -stride)
            bp = _shift_rows(b, -stride, 1.0)
            alpha = -a / bm
            beta_k = -c / bp
            # fold the rhs reduction's zero-fill shift semantics into the
            # stored factors: rows the shift would zero-fill get a zero
            # factor, so the hot loop can use bare circular rolls (one VPU
            # pass) instead of pad+concat shifts (two) — once-per-interval
            # masking buying ~25% of the per-sub-step passes
            fac[2 * s * dp:(2 * s + 1) * dp, :] = jnp.where(
                row >= stride, alpha, 0.0)
            fac[(2 * s + 1) * dp:(2 * s + 2) * dp, :] = jnp.where(
                row < dp - stride, beta_k, 0.0)
            b = b + alpha * cm + beta_k * ap
            a = alpha * am
            c = beta_k * cp_
            stride *= 2
        fac[2 * steps * dp:(2 * steps + 1) * dp, :] = 1.0 / b
        if has_eb:
            fac[(2 * steps + 1) * dp:(2 * steps + 2) * dp, :] = (
                1.0 + (1.0 - th) * (dt * bpad - 2.0 * F)
            )
        # zero the d-staging pads ONCE per interval: the per-sub-step solve
        # keeps d in fac[base+PADR : base+PADR+dp] and reads its shifted
        # neighbors as offset ref slices (free) instead of materializing
        # pad+concat copies; writes never touch the pads, so they stay zero
        # and provide the shifts' zero-fill for the whole interval
        zero_pad = jnp.zeros((PADR, shape[1]), dtype)
        fac[_dsbase:_dsbase + PADR, :] = zero_pad
        fac[_dsbase + PADR + dp:_dsbase + 2 * PADR + dp, :] = zero_pad
        return fac, keep, last

    def _solve(d, alphas, betas, inv_b):
        stride = 1
        for alpha, beta_k in zip(alphas, betas):
            d = (d + alpha * _shift_rows(d, stride)
                 + beta_k * _shift_rows(d, -stride))
            stride *= 2
        return d * inv_b

    def update(us, beta_ref, ctrl, aux):
        if elimination == "kernel":
            fac, keep, last = aux
            blk = lambda k: fac[k * dp:(k + 1) * dp, :]
            alphas = tuple(blk(2 * s) for s in range(steps))
            betas = tuple(blk(2 * s + 1) for s in range(steps))
            inv_b = blk(2 * steps)
            eb = blk(2 * steps + 1) if has_eb else None
        else:
            alphas, betas, inv_b, keep, last, eb = aux
        u = us[0:dp, :]
        if neumann:
            boundary = ctrl * dx + u[n - 2:n - 1, :]  # previous state's [-2]
        else:
            boundary = ctrl
        if th < 1.0:
            up = us[1:dp + 1, :]
            um = pltpu.roll(u, 1, 0)
            rhs = u * eb + ((1.0 - th) * F) * (um + up)
        else:
            rhs = u
        # pin: d=0 at row 0 and pads, d=boundary at row n−1
        d = rhs * keep + last * boundary
        if elimination == "kernel":
            # scratch-staged reduction: d lives in the zero-padded staging
            # region of fac, so each PCR step's two shifted operands are
            # OFFSET REF SLICES of the previous write — no pad+concat
            # copies in the hot loop, and the pads supply the zero fill
            ctr = _dsbase + PADR
            fac[ctr:ctr + dp, :] = d
            stride = 1
            for alpha, beta_k in zip(alphas, betas):
                fac[ctr:ctr + dp, :] = (
                    fac[ctr:ctr + dp, :]
                    + alpha * fac[ctr - stride:ctr - stride + dp, :]
                    + beta_k * fac[ctr + stride:ctr + stride + dp, :]
                )
                stride *= 2
            us[0:dp, :] = fac[ctr:ctr + dp, :] * inv_b
        else:
            us[0:dp, :] = _solve(d, alphas, betas, inv_b)
        return boundary

    update.transposed = True
    update.boundary_const = not neumann
    if elimination == "kernel":
        update.make_aux = make_aux_kernel
        update.aux_scratch_rows = _dsbase + 2 * PADR + dp
    else:
        update.make_aux = make_aux_xla
        update.beta_transform = beta_transform
        update.beta_rows = K
    return update


def reaction_diffusion_update_t(dt: float, dx: float, state_dim: int,
                                neumann: bool):
    """Transposed in-place FTCS sub-step (envs/reaction_diffusion.py
    semantics): u[0]=0 fixed BC, boundary from the PREVIOUS state's [-2]
    for Neumann control (parabolic.py:148-150).

    Folded form ``u·(1 − 2F + dt·β) + F·(um + up)`` — the loop-invariant
    diagonal coefficient is precomputed per interval via ``beta_transform``,
    dropping 3 vector ops per point per sub-step vs
    ``u + F·(um − 2u + up) + dt·β·u``; envs/reaction_diffusion.py uses the
    identical association so the backends match bitwise."""
    F = dt / dx**2
    n = state_dim
    dp = _pad8(n)

    def update(us, beta_ref, ctrl, aux):
        u = us[0:dp, :]
        up = us[1:dp + 1, :]
        um = pltpu.roll(u, 1, 0)  # wraps pad row dp-1 (zero) into row 0:
        # row 0 is overwritten by the fixed BC below either way
        un = u * beta_ref[:] + F * (um + up)  # beta_ref = 1 − 2F + dt·λ
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
    # the transform runs pre-padding, so pad rows of the beta block stay
    # zero (u is zero there anyway). Scalars are staged through the array
    # dtype exactly like the XLA path so the diagonals match bitwise.
    def beta_transform(beta):
        Fc = jnp.asarray(F, beta.dtype)
        dtc = jnp.asarray(dt, beta.dtype)
        return (1.0 - 2.0 * Fc) + beta * dtc

    update.beta_transform = beta_transform
    return update
