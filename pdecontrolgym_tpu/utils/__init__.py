from pdecontrolgym_tpu.utils.checkpointing import restore, save
from pdecontrolgym_tpu.utils.metrics import MetricsLogger
from pdecontrolgym_tpu.utils.profiling import steps_per_second, time_device_fn, trace

__all__ = [
    "MetricsLogger",
    "restore",
    "save",
    "steps_per_second",
    "time_device_fn",
    "trace",
]
