from pdecontrolgym_tpu.parallel.mesh import (
    ENV_AXIS,
    env_mesh,
    env_sharding,
    replicated,
    shard_batch,
)
from pdecontrolgym_tpu.parallel.rollout import batch_init, batch_step, rollout

__all__ = [
    "ENV_AXIS",
    "batch_init",
    "batch_step",
    "env_mesh",
    "env_sharding",
    "replicated",
    "rollout",
    "shard_batch",
]
