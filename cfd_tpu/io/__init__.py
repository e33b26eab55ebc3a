"""I/O layer: VTK/ParaView export, structured metrics logging, checkpointing."""

from cfd_tpu.io.vtk import (
    VTKExporter,
    generate_filename,
    write_paraview_collection,
    write_structured_grid,
)
from cfd_tpu.io.metrics import MetricsLog

__all__ = [
    "VTKExporter",
    "MetricsLog",
    "generate_filename",
    "write_paraview_collection",
    "write_structured_grid",
]
