"""Extended physics: Boussinesq thermal convection, FTLE diagnostics."""

from cfd_tpu.physics.boussinesq import (
    RBParams,
    make_rayleigh_benard_case,
    nusselt_numbers,
    streamfunction,
)

__all__ = ["RBParams", "make_rayleigh_benard_case", "nusselt_numbers", "streamfunction"]
