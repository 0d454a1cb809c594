"""Brain-tumor field kernel — and the measured case AGAINST fusing more.

:func:`make_brain_tumor_field_fn` runs the per-policy-day FIELD pass for
``BrainTumorEnv.step_batch`` (``backend='pallas'`` only): T2 radius scan +
BED radiation + FD day update + T1 radius scan (op-for-op the field part
of the env's ``step()``, envs/brain_tumor.py, itself parity-tested against
``src/environments1d/brain_tumor_env.py:123-345``) in one aliased HBM pass
over (B, nx); the stage machine stays in XLA (the env's ``_day_scalars``).

MEASURED NEGATIVE RESULT (round 5, 4096 envs, one v5e chip): every Pallas
variant of this family LOSES to ``vmap(step)``:

- whole-day kernel, 1D-style transposed layout: 59M env-steps/s (the two
  per-call (B, nx) transposes dominate a one-day body);
- whole-day kernel, lane layout with packed scalar blocks: 18M (16-column
  lane pack/unpack shuffles);
- this minimal field kernel: 49M in the rollout, 99 vs 56 us/step bare vs
  the equivalent bare-XLA chain — Mosaic masks every vreg op on the
  unaligned 201-lane tile, while XLA fuses the whole day body into ~one
  memory pass;
- an in-kernel while-loop fast-forward for the TherapyWrapper spans fails
  to compile in Mosaic on the real chip (interpret mode worked).

So ``backend='auto'`` keeps vmap for this family (115M env-steps/s after
the round-5 rollout machinery cuts: state-only carry via observe_batch);
the kernel is retained behind ``backend='pallas'`` with its parity test as
the documented record. The family's remaining headroom is machinery, not
the body — see docs/PERFORMANCE.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def make_brain_tumor_field_fn(env, *, tile_b=256, interpret=False):
    """Minimal field kernel for ``BrainTumorEnv.step_batch``:

        fn(u, applied, can) -> (u_new, treatment_radius, t1, has_t1)

    One aliased HBM pass over the (B, nx) density row computing the T2
    radius scan, the BED radiation field, the FD day update and the T1
    radius scan in VMEM; every per-env scalar stays a (B, 1) column (no
    packed scalar blocks — the round-5 lane-layout prototype showed the
    16-column pack/unpack shuffles cost more than the body). The stage
    machine/reward run in XLA on (B,) vectors (they are ~40 scalar-vector
    ops; the HBM passes were the bottleneck: 97M env-steps/s with the XLA
    body's ~6 fused passes, the kernel leaves 2 + the autoreset select).

    ``applied`` must already be the therapy-gated dose in Gy (zero outside
    Therapy — R == 0 follows exactly from d == 0); ``can`` the pre-step
    ``time_index < nt-1`` mask as float.
    """
    c = env.config
    nx = c.nx
    dt, dx = float(c.dt), float(c.dx)
    D, rho, k = float(c.D), float(c.rho), float(c.k)
    alpha, abr = float(c.alpha), float(c.alpha_beta_ratio)
    thr_t1 = float(c.t1_detection_threshold) * k
    thr_t2 = float(c.t2_detection_threshold) * k

    def kernel(u_ref, ap_ref, can_ref, uo_ref, tr_ref, t1_ref, h1_ref):
        u = u_ref[:]
        applied = ap_ref[:]
        can = can_ref[:] > 0.0
        col = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
        x_scale = col.astype(jnp.float32) * dx

        def radius(uu, thr):
            idx = jnp.max(jnp.where(uu >= thr, col, -1),
                          axis=1, keepdims=True)
            has = idx >= 0
            return jnp.where(has, idx.astype(jnp.float32) * dx, 0.0), has

        def shift(f, k_):
            z = jnp.zeros(f.shape[:-1] + (1,), f.dtype)
            if k_ == 1:
                return jnp.concatenate([f[..., 1:], z], axis=-1)
            return jnp.concatenate([z, f[..., :-1]], axis=-1)

        t2, has_t2 = radius(u, thr_t2)
        treatment_radius = jnp.where(has_t2, t2 + 25.0, 0.0)
        d = jnp.where(x_scale <= treatment_radius, applied, 0.0)
        bed = d + d * d / abr
        R = 1.0 - jnp.exp(-alpha * bed)

        u_l, u_r = shift(u, -1), shift(u, 1)
        logistic = u * (1.0 - u / k)
        growth = D * (u_r - 2.0 * u + u_l) / (dx * dx) + rho * logistic
        upd = u + dt * (growth - R * logistic)
        first_int = jnp.sum(jnp.where(col == 1, upd, 0.0), 1, keepdims=True)
        last_int = jnp.sum(jnp.where(col == nx - 2, upd, 0.0), 1,
                           keepdims=True)
        nxt = jnp.where(col == 0, first_int, upd)
        nxt = jnp.where(col == nx - 1, last_int, nxt)
        nxt = jnp.clip(nxt, 0.0, k)
        u_new = jnp.where(can, nxt, u)

        t1, has_t1 = radius(u_new, thr_t1)
        uo_ref[:] = u_new
        tr_ref[:] = treatment_radius
        t1_ref[:] = t1
        h1_ref[:] = has_t1.astype(jnp.float32)

    @jax.jit
    def fn(u, applied, can):
        B = u.shape[0]
        tb = min(tile_b, B)
        colspec = pl.BlockSpec((tb, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        uspec = pl.BlockSpec((tb, nx), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
        u2, tr, t1, h1 = pl.pallas_call(
            kernel,
            grid=(-(-B // tb),),
            in_specs=[uspec, colspec, colspec],
            out_specs=[uspec, colspec, colspec, colspec],
            out_shape=[
                jax.ShapeDtypeStruct((B, nx), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
                jax.ShapeDtypeStruct((B, 1), jnp.float32),
            ],
            input_output_aliases={0: 0},
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(jnp.asarray(u, jnp.float32),
          jnp.asarray(applied, jnp.float32).reshape(B, 1),
          jnp.asarray(can, jnp.float32).reshape(B, 1))
        return u2, tr[:, 0], t1[:, 0], h1[:, 0] > 0.0

    return fn
