from pdecontrolgym_tpu.ops.pallas1d import make_interval_fn_t
from pdecontrolgym_tpu.ops.poisson2d import (
    dct2_basis,
    direct_pressure,
    direct_pressure_setup,
    jacobi_pressure,
    jacobi_pressure_flat,
)
from pdecontrolgym_tpu.ops.tridiag import pcr, thomas

__all__ = [
    "dct2_basis",
    "direct_pressure",
    "direct_pressure_setup",
    "jacobi_pressure",
    "jacobi_pressure_flat",
    "make_interval_fn_t",
    "pcr",
    "thomas",
]
