"""Numerics/ops layer: vectorized MAC-grid stencils and reductions (L1)."""

from cfd_tpu.ops.stencil import (
    StencilCoeffs,
    divergence,
    interpolate_to_centers,
    poisson_source,
    predictor,
    pressure_correction,
    vorticity_centers,
)
from cfd_tpu.ops.reductions import flow_statistics

__all__ = [
    "StencilCoeffs",
    "predictor",
    "divergence",
    "poisson_source",
    "pressure_correction",
    "interpolate_to_centers",
    "vorticity_centers",
    "flow_statistics",
]
