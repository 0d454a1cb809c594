"""Fused Pallas kernel: K neuron-growth dt-steps per launch, state in VMEM.

The neuron env's controller is EMBEDDED — ``step()`` ignores external
actions (reference ``neuron_env.py:261``) — so fusing K dt-steps per kernel
launch breaks no policy-in-the-loop contract; it is the same move as the 1D
families' control-interval kernels, with the "control interval" being the
env's new ``steps_per_call``. The floor analysis (``bench_floor.py``) put
the XLA path at 165M env-steps/s against a 420M machinery floor: ~60% of
the step is the moving-boundary body, and the remaining machinery (rollout
scan carry, autoreset selects, obs) amortizes K-fold here.

Layout mirrors ``ops/pallas1d``: transposed ``(M_padded, tile_b)`` tiles —
grid points on sublanes, envs on lanes. Every read at the per-env moving
boundary index L is a masked multiply + SUBLANE reduction (a lane-varying
dynamic row gather does not exist on TPU); the trapezoidal control integral
is one more masked reduction. Gain/constant tables (pB, p, row iota) enter
as ``(M_padded, 1)`` columns and broadcast across lanes.

Semantics are the env's ``step`` body op-for-op (envs/neuron.py:249-343,
itself parity-tested against the patched reference): OLD-L tip stencil, OLD
dxreal everywhere, L_new from the updated cone ODE, the masked interior
stencil with wrap-safe rolls, the terminate-resets-time quirk per dt-step.
Eligibility is gated by the env (float32, no reward/noise/truncation —
``envs/neuron.py:_kernel_eligible``).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def make_neuron_interval_fn(
    env,
    *,
    steps: int,
    window: int = 0,
    ring_ord: str = "2",
    need_prev: bool = False,
    tile_b: int = 128,
    interpret: bool = False,
):
    """Build ``fn(u, Z, L, t) -> (u', Z', L', t', terminated[, norms, prev])``
    advancing ``steps`` dt-steps for a ``(B, …)`` batch of neuron envs on
    VMEM tiles. ``env`` is the constructed NeuronEnv (its gain tables are
    baked in as kernel constants).

    Reward support (round 5 — lifts the round-4 reward-free restriction):
    with ``window = W > 0`` the kernel also evaluates the per-dt norm of
    the updated row in ``ring_ord`` ("1"/"2"/"inf") into a W-slot rotating
    ring (slot ``j % W``) — the trailing window NormReward's t-horizon
    reads — and with ``need_prev`` stores the row BEFORE the final dt-step
    (NormReward differential's ``prev_u``). The env unrotates the ring and
    assembles the RewardCtx (envs/neuron.py ``step_batch``)."""
    c = env.config
    M = env.M
    Mp = _pad8(M)
    W = int(window)
    Wp = _pad8(W) if W else 0
    dt, dx = float(c.dt), float(c.dx)
    D, a, g = float(c.D), float(c.a), float(c.g)
    LSubS, scale = float(c.LSubS), float(env.scale)
    RSubG = float(c.RSubG)
    aT1, beta_c = float(env.aTilde1), float(env.beta_c)
    nt = float(c.nt)
    K = int(steps)

    import numpy as np

    # the env's gain tables are concrete, but this builder may be reached
    # lazily INSIDE a jit trace (step_batch), where omnistaging would stage
    # even ops on constants — force compile-time evaluation
    with jax.ensure_compile_time_eval():
        coeff = float(env.coefficient)
        H0, H1 = float(env.H[0]), float(env.H[1])
        pB_host = np.asarray(jax.device_get(env.pB), np.float32)
        p_host = np.asarray(jax.device_get(env.p), np.float32)

    def col(v):
        out = np.zeros((Mp, 1), np.float32)
        out[:M, 0] = v
        return jnp.asarray(out)

    pB_c, p0_c, p1_c = col(pB_host), col(p_host[:, 0]), col(p_host[:, 1])

    def kernel(u_ref, z_ref, l_ref, t_ref, pB_ref, p0_ref, p1_ref,
               uo_ref, zo_ref, lo_ref, to_ref, done_ref, *extra_refs):
        norms_ref = extra_refs[0] if W else None
        prev_ref = extra_refs[-1] if need_prev else None
        row = jax.lax.broadcasted_iota(jnp.int32, (Mp, u_ref.shape[1]), 0)
        rowf = (row - 1).astype(jnp.float32)
        pB = pB_ref[:]   # (Mp, 1) — broadcasts across lanes
        p0 = p0_ref[:]
        p1 = p1_ref[:]

        def body(j, carry):
            u, Z0, Z1, L, t = carry
            if need_prev:
                # row BEFORE the final dt-step = NormReward's prev_u
                @pl.when(j == K - 1)
                def _():
                    prev_ref[:] = u
            t = t + dt
            lt = Z1 + LSubS                      # (1, tb)
            dxreal = dx * lt

            mL = (row == L).astype(jnp.float32)  # L broadcasts (1,tb)->(Mp,tb)
            mLm1 = (row == L - 1).astype(jnp.float32)
            mLm2 = (row == L - 2).astype(jnp.float32)
            pick = lambda m: jnp.sum(u * m, axis=0, keepdims=True)
            ux_tip = (3.0 * pick(mL) - 4.0 * pick(mLm1) + pick(mLm2)) / (
                2.0 * dxreal
            )
            Z0n = (aT1 * Z0 - beta_c * ux_tip) * dt + Z0
            Z1n = RSubG * Z0 * dt + Z1
            Ln = jnp.clip(
                jnp.round(((Z1n + LSubS) / scale) / dx).astype(jnp.int32),
                1, M - 1,
            )

            # backstepping control: masked trapezoid over [0, L_new]
            # (neuron_env.py:302-307); all with OLD u and OLD dxreal
            mtip = (row == Ln).astype(jnp.float32)
            inner_m = ((row >= 1) & (row < Ln)).astype(jnp.float32)
            pBu = pB * u
            inner = jnp.sum(pBu * inner_m, axis=0, keepdims=True) * dxreal
            u0 = u[0:1, :]
            u1 = u[1:2, :]
            middle = (
                dxreal * pB[0:1] * u0 / 2.0
                + inner
                + dxreal / 2.0 * jnp.sum(pBu * mtip, axis=0, keepdims=True)
            ) / D
            ptip0 = jnp.sum(p0 * mtip, axis=0, keepdims=True)
            ptip1 = jnp.sum(p1 * mtip, axis=0, keepdims=True)
            control = lt * (coeff * u0 - middle + ptip0 * Z0n + ptip1 * Z1n)

            # left boundary via fictitious point (:313-314)
            ufic = u1 - control * dxreal * 2.0
            u0n = (
                (D / dxreal**2) * (u1 - 2.0 * u0 + ufic)
                - a / (2.0 * dxreal) * (u1 - ufic)
                - g * u0
            ) * dt + u0

            # interior update over 1 <= n < L_new (:317-320); rolls wrap
            # garbage into rows the masks below never select
            up1 = pltpu.roll(u, Mp - 1, 0)  # == jnp.roll(u, -1, 0)
            um1 = pltpu.roll(u, 1, 0)
            uxx = (up1 - 2.0 * u + um1) / dxreal**2
            diff = up1 - um1
            adv = (rowf / lt) * (RSubG * Z0) * diff / 2.0
            interior = u + dt * (D * uxx + adv - a * diff / dxreal / 2.0 - g * u)

            tip_val = H0 * Z0n + H1 * Z1n
            u_new = jnp.where((row >= 1) & (row < Ln), interior, u)
            u_new = jnp.where(row == 0, u0n, u_new)
            u_new = jnp.where(row == Ln, tip_val, u_new)

            if W:
                # per-dt norm of the updated row into the rotating ring
                # (pads are kept zero, so whole-column reductions are exact)
                if ring_ord == "1":
                    nv = jnp.sum(jnp.abs(u_new), axis=0, keepdims=True)
                elif ring_ord == "inf":
                    nv = jnp.max(jnp.abs(u_new), axis=0, keepdims=True)
                else:
                    nv = jnp.sqrt(
                        jnp.sum(u_new * u_new, axis=0, keepdims=True)
                    )
                norms_ref[pl.ds(j % W, 1), :] = nv

            # terminate-resets-time quirk per dt-step (:276, :347)
            t = jnp.where(t >= nt, 0.0, t)
            return u_new, Z0n, Z1n, Ln, t

        u = u_ref[:]
        Z0 = z_ref[0:1, :]
        Z1 = z_ref[1:2, :]
        L = l_ref[:]
        t = t_ref[:]
        u, Z0, Z1, L, t = jax.lax.fori_loop(
            0, K, body, (u, Z0, Z1, L, t)
        )
        uo_ref[:] = u
        zo_ref[0:1, :] = Z0
        zo_ref[1:2, :] = Z1
        zo_ref[2:, :] = jnp.zeros(
            (zo_ref.shape[0] - 2, u.shape[1]), jnp.float32
        )
        lo_ref[:] = L
        to_ref[:] = t
        # the final sub-step's terminated flag (t was zeroed iff it fired)
        done_ref[:] = (t == 0.0).astype(jnp.int32)

    @jax.jit
    def fn(u, Z, L, t):
        B = u.shape[0]
        tb = min(tile_b, B) if interpret else tile_b
        Bp = -(-B // tb) * tb
        ut = jnp.zeros((Mp, Bp), jnp.float32).at[:M, :B].set(u.T)
        zt = jnp.zeros((8, Bp), jnp.float32).at[:2, :B].set(Z.T)
        lt_ = jnp.zeros((1, Bp), jnp.int32).at[:, :B].set(L[None, :])
        tt = jnp.zeros((1, Bp), jnp.float32).at[:, :B].set(t[None, :])
        colspec = pl.BlockSpec((Mp, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM)
        zspec = pl.BlockSpec((8, tb), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
        rowspec = lambda: pl.BlockSpec((1, tb), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec((Mp, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        out_specs = [colspec, zspec, rowspec(), rowspec(), rowspec()]
        out_shapes = [
            jax.ShapeDtypeStruct((Mp, Bp), jnp.float32),
            jax.ShapeDtypeStruct((8, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ]
        if W:
            out_specs.append(pl.BlockSpec((Wp, tb), lambda i: (0, i),
                                          memory_space=pltpu.VMEM))
            out_shapes.append(jax.ShapeDtypeStruct((Wp, Bp), jnp.float32))
        if need_prev:
            out_specs.append(colspec)
            out_shapes.append(jax.ShapeDtypeStruct((Mp, Bp), jnp.float32))
        outs = pl.pallas_call(
            kernel,
            grid=(Bp // tb,),
            in_specs=[colspec, zspec, rowspec(), rowspec(),
                      cspec, cspec, cspec],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(ut, zt, lt_, tt, pB_c, p0_c, p1_c)
        u2, z2, l2, t2, done = outs[:5]
        result = [
            u2[:M, :B].T,
            z2[:2, :B].T,
            l2[0, :B],
            t2[0, :B],
            done[0, :B].astype(jnp.bool_),
        ]
        pos = 5
        if W:
            ring = outs[pos][:W, :B].T  # (B, W), slot s = dt-step j%W==s
            # unrotate to chronological (oldest..newest): lag l lives at
            # slot (K-1-l) % W — a static gather, W is tiny
            order = [(K - 1 - (W - 1 - i)) % W for i in range(W)]
            result.append(ring[:, jnp.asarray(order)])
            pos += 1
        if need_prev:
            result.append(outs[pos][:M, :B].T)
        return tuple(result)

    return fn
