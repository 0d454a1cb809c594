from pdecontrolgym_tpu.rewards.base import BaseReward
from pdecontrolgym_tpu.rewards.brain_tumor import BrainTumorReward
from pdecontrolgym_tpu.rewards.norm import NormReward
from pdecontrolgym_tpu.rewards.ns import NSReward
from pdecontrolgym_tpu.rewards.traffic import TrafficARZReward
from pdecontrolgym_tpu.rewards.tuned import TunedReward1D

__all__ = [
    "BaseReward",
    "BrainTumorReward",
    "NSReward",
    "NormReward",
    "TrafficARZReward",
    "TunedReward1D",
]
