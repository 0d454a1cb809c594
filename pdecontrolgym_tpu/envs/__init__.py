from pdecontrolgym_tpu.envs.common import Boundary1DConfig, Boundary1DEnv, Boundary1DState
from pdecontrolgym_tpu.envs.transport import TransportConfig, TransportEnv, chebyshev_beta

__all__ = [
    "Boundary1DConfig",
    "Boundary1DEnv",
    "Boundary1DState",
    "TransportConfig",
    "TransportEnv",
    "chebyshev_beta",
]
