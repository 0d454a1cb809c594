from pdecontrolgym_tpu.utils.checkpointing import restore, save
from pdecontrolgym_tpu.utils.debug import cfl_report, checked_step, checked_step_batch
from pdecontrolgym_tpu.utils.metrics import MetricsLogger
from pdecontrolgym_tpu.utils.profiling import steps_per_second, time_device_fn, trace

__all__ = [
    "MetricsLogger",
    "cfl_report",
    "checked_step",
    "checked_step_batch",
    "restore",
    "save",
    "steps_per_second",
    "time_device_fn",
    "trace",
]
