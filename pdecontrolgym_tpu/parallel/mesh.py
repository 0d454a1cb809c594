"""Device-mesh utilities: env-axis data parallelism over TPU slices.

The reference has no distributed backend of any kind (SURVEY §2.3/§5). The
TPU-native scaling axis for this workload is the batch-of-envs dimension:
envs shard over a 1D ``("env",)`` mesh (ICI within a slice, DCN across hosts
via ``jax.distributed.initialize``), the learner's parameters replicate, and
gradients reduce with ``psum`` inside ``shard_map`` — XLA inserts the
collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


ENV_AXIS = "env"


def env_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """A 1D mesh over all (or the given) devices with a single env axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (env-batch) axis over the mesh."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Device-put a batch pytree with its leading axis sharded over the mesh."""
    sh = env_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def multihost_env_mesh(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Mesh:
    """Initialize multi-host JAX (DCN between hosts, ICI within a slice) and
    return the global env mesh. On a single host this is just :func:`env_mesh`.

    Each host steps its env shard in lockstep; the learner's gradients
    ``pmean`` across the whole mesh (agents/ppo.py), which XLA lowers to ICI
    collectives intra-slice and DCN allreduce across hosts.
    """
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return env_mesh()
