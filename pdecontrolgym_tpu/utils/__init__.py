from pdecontrolgym_tpu.utils.checkpointing import (
    load_params,
    restore,
    save,
    save_params,
)
from pdecontrolgym_tpu.utils.debug import cfl_report, checked_step, checked_step_batch
from pdecontrolgym_tpu.utils.metrics import MetricsLogger
from pdecontrolgym_tpu.utils.plotting import ns_fields, spacetime_1d, surface_1d
from pdecontrolgym_tpu.utils.profiling import steps_per_second, time_device_fn, trace

__all__ = [
    "MetricsLogger",
    "ns_fields",
    "spacetime_1d",
    "surface_1d",
    "cfl_report",
    "checked_step",
    "checked_step_batch",
    "load_params",
    "restore",
    "save",
    "save_params",
    "steps_per_second",
    "time_device_fn",
    "trace",
]
