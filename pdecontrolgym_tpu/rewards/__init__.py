from pdecontrolgym_tpu.rewards.base import BaseReward
from pdecontrolgym_tpu.rewards.norm import NormReward
from pdecontrolgym_tpu.rewards.traffic import TrafficARZReward
from pdecontrolgym_tpu.rewards.tuned import TunedReward1D

__all__ = ["BaseReward", "NormReward", "TrafficARZReward", "TunedReward1D"]
