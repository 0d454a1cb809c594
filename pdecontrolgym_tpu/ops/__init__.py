from pdecontrolgym_tpu.ops.ns_fused import (
    make_fused_ns_step,
    pack_field,
    pick_pack_r,
    unpack_field,
)
from pdecontrolgym_tpu.ops.brain_tumor_interval import (
    make_brain_tumor_field_fn,
)
from pdecontrolgym_tpu.ops.neuron_interval import make_neuron_interval_fn
from pdecontrolgym_tpu.ops.pallas1d import (
    make_interval_fn_t,
    reaction_diffusion_implicit_update_t,
)
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
    "make_brain_tumor_field_fn",
    "make_fused_ns_step",
    "make_interval_fn_t",
    "make_neuron_interval_fn",
    "pack_field",
    "pcr",
    "pick_pack_r",
    "reaction_diffusion_implicit_update_t",
    "thomas",
    "unpack_field",
]
