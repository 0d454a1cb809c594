"""Spatial sharding: halo-exchange stencils over a mesh axis.

The batch-of-envs axis is this workload's primary parallel dimension (grids
are tiny, SURVEY §5), but for very large grids the sequence-parallel analog is
sharding the SPATIAL axis: each device owns a contiguous slab of the row and
exchanges one-point halos with its neighbors via ``ppermute`` each sub-step —
the collectives ride ICI inside ``shard_map``.

This module implements that pattern for the transport upwind stencil:
``make_spatial_transport_interval`` builds a jitted function running a full
control interval with ``u`` sharded over a ``("x",)`` mesh axis. The upwind update needs each slab's RIGHT
neighbor's first point; β·u(0,t) needs the global left boundary value, which
is broadcast from shard 0 once per sub-step (also a ppermute-free
``all_gather`` of one scalar would do; we use the gather of slab heads).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

X_AXIS = "x"


def spatial_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (X_AXIS,))


def make_spatial_transport_interval(mesh: Mesh, dt: float, dx: float,
                                    sample_rate: int):
    """Returns jitted ``fn(u, beta, control) -> u_final`` with ``u``/``beta``
    sharded over the spatial mesh axis. Matches
    ``TransportEnv._advance`` semantics (boundary column = control, constant
    over the interval)."""
    n_shards = mesh.size

    def interval(u_local, beta_local, control):
        axis_idx = jax.lax.axis_index(X_AXIS)
        is_last = axis_idx == n_shards - 1
        right_neighbor = [(i, (i - 1) % n_shards) for i in range(n_shards)]

        def substep(u, _):
            # halo: receive the RIGHT neighbor's first point (shifted left)
            head = u[:1]
            halo = jax.lax.ppermute(head, X_AXIS, right_neighbor)
            up = jnp.concatenate([u[1:], halo])
            # global u(0,t): every shard needs slab 0's head
            heads = jax.lax.all_gather(head, X_AXIS)
            u0 = heads[0, 0]
            interior = u + dt * ((up - u) / dx + u0 * beta_local)
            # last shard's last column is the controlled boundary
            col = jnp.arange(u.shape[0])
            u_new = jnp.where(
                jnp.logical_and(is_last, col == u.shape[0] - 1),
                control,
                interior,
            )
            return u_new, None

        u_final, _ = jax.lax.scan(substep, u_local, None, length=sample_rate)
        return u_final

    sharded = jax.shard_map(
        interval,
        mesh=mesh,
        in_specs=(P(X_AXIS), P(X_AXIS), P()),
        out_specs=P(X_AXIS),
    )
    return jax.jit(sharded)


def make_spatial_transport_episode(mesh: Mesh, *, dt: float, dx: float,
                                   sample_rate: int, nt: int,
                                   terminate_reward: float = 3e2,
                                   lookback: int = 100):
    """Full closed-loop backstepping episode on a SPATIALLY sharded transport
    state: one PDE too large for a single device, split over the ``x`` mesh
    axis with one-point ``ppermute`` halos per sub-step — the full-episode
    upgrade of :func:`make_spatial_transport_interval`.

    Returns jitted ``fn(u, beta, kernel) -> (rewards, u_final)`` where all
    three inputs are ``(nx,)`` arrays sharded over ``x``:

    - the backstepping control is computed distributively each interval:
      ``ctrl = psum(kern_local · u_local) · dx`` (a sharded dot product);
    - rewards reproduce ``TunedReward1D`` exactly (envs/common.py step
      semantics): running ``‖u(t−lookback)‖ − ‖u(t)‖`` per interval and the
      terminal ``terminate_reward − bsum/1000 − ‖u(T)‖`` bonus gated on
      ``‖u(T)‖ < 20``, with norms as ``sqrt(psum(local Σu²))`` — verified
      against ``TransportEnv`` to fp tolerance in
      ``tests/test_spatial_sharding.py``;
    - requires ``(nt−1) % sample_rate == 0`` (every reference config: the
      horizon divides into full control intervals) and ``lookback <
      sample_rate``.
    """
    S = sample_rate
    if (nt - 1) % S:
        raise ValueError("horizon must divide into full control intervals")
    if not 0 < lookback < S:
        raise ValueError("lookback must be inside one control interval")
    n_steps = (nt - 1) // S
    n_shards = mesh.size
    perm = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def episode(u_local, beta_local, kern_local):
        axis_idx = jax.lax.axis_index(X_AXIS)
        is_last = axis_idx == n_shards - 1
        col = jnp.arange(u_local.shape[0])
        last_col = jnp.logical_and(is_last, col == u_local.shape[0] - 1)

        def norm(u):
            return jnp.sqrt(jax.lax.psum(jnp.sum(u * u), X_AXIS))

        def make_sub(ctrl):
            def sub(u, _):
                # halo: the RIGHT neighbor's first point; the wrap into the
                # last shard is dead (its last column is the boundary write)
                halo = jax.lax.ppermute(u[:1], X_AXIS, perm)
                up = jnp.concatenate([u[1:], halo])
                # recirculation reads the OLD global u(0, t) (shard 0's head)
                u0 = jax.lax.all_gather(u[:1], X_AXIS)[0, 0]
                un = u + dt * ((up - u) / dx + u0 * beta_local)
                return jnp.where(last_col, ctrl, un), None

            return sub

        def interval(carry, _):
            u, t, bsum = carry
            ctrl = jax.lax.psum(jnp.dot(kern_local, u), X_AXIS) * dx
            sub = make_sub(ctrl)
            # segment the S sub-steps so the two norms the reward reads
            # (lag `lookback` and lag 0 from the interval end) are computed
            # exactly where TunedReward1D reads them
            u, _ = jax.lax.scan(sub, u, None, length=S - lookback)
            prev = norm(u)
            u, _ = jax.lax.scan(sub, u, None, length=lookback)
            cur = norm(u)
            bsum = bsum + S * jnp.abs(ctrl)  # boundary is ctrl all interval
            t = t + S
            terminated = t >= nt - 1
            r_term = terminate_reward - bsum / 1000.0 - cur
            r = jnp.where(jnp.logical_and(terminated, cur < 20.0),
                          r_term, prev - cur)
            return (u, t, bsum), r

        # bsum starts at |u0[-1]| (envs/common.py init_from)
        tails = jax.lax.all_gather(u_local[-1:], X_AXIS)
        bsum0 = jnp.abs(tails[-1, 0])
        (u, _, _), rewards = jax.lax.scan(
            interval, (u_local, jnp.asarray(0, jnp.int32), bsum0), None,
            length=n_steps)
        # rewards are built from psum-reduced scalars so every shard holds
        # the same values, but the scan carry's vma unification marks them
        # device-varying; a psum-mean re-asserts the replication statically
        # (n_steps scalars, once per episode)
        rewards = jax.lax.psum(rewards, X_AXIS) / n_shards
        return rewards, u

    sharded = jax.shard_map(
        episode,
        mesh=mesh,
        in_specs=(P(X_AXIS), P(X_AXIS), P(X_AXIS)),
        out_specs=(P(), P(X_AXIS)),
    )
    return jax.jit(sharded)
