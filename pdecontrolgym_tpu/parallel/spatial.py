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
