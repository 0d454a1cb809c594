from pdecontrolgym_tpu.compat.adapter import Boundary1DGymEnv, TransportPDE1D

__all__ = ["Boundary1DGymEnv", "TransportPDE1D"]
