"""PNG contour-figure exporter (matplotlib, save-interval cadence).

The reference publishes rendered contour figures for every case (PNG/JPG
committed to the repo and the README's "PNG frames" claim,
/root/reference/README.md:38; RB.jpg, INLET_BOX-CONTOURS.png) but renders
them externally in ParaView from the VTK series. This module closes that
artifact surface in-framework: a Simulation-compatible exporter callback
that draws filled contours of |V| and vorticity (plus temperature for
Rayleigh-Benard) from the device state at save cadence, with solid cells
masked out, writing ``<base>_XXXXXX.png`` next to the VTK series.

Cost model: device->host copy + matplotlib rasterization happen at save
cadence only (never on the hot path), same as the VTK writer; wrap in
io.async_writer.AsyncExporter to keep the render off the time loop (the
CLI does this by default).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cfd_tpu.grid import Grid
from cfd_tpu.ops.stencil import StencilCoeffs, interpolate_to_centers, vorticity_centers


class PNGExporter:
    """Render contour panels of the state as ``<base>_XXXXXX.png``.

    Panels: |V| (speed) + vorticity; temperature appended when the state
    carries T (Rayleigh-Benard). Solid cells (backwards step) render as
    blanked (masked) regions, matching the reference figures' gray block.
    """

    def __init__(self, grid: Grid, coeffs: StencilCoeffs, title: str,
                 base: str, out_dir: str | Path = "vtk_output",
                 dpi: int = 110):
        self.grid = grid
        self.title = title
        self.base = base
        self.dpi = dpi
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.entries: list[tuple[float, str]] = []
        self._masked = grid.has_solids
        self._fluid = grid.fluid[1 : grid.ny + 1, 1 : grid.nx + 1] \
            if self._masked else None
        cell = jnp.asarray(grid.cell_mask)

        def derive(u, v):
            uc, vc = interpolate_to_centers(u, v, cell)
            w = vorticity_centers(uc, vc, grid, coeffs)
            speed = jnp.sqrt(uc * uc + vc * vc)
            return speed, w

        self._derive = jax.jit(derive)
        # cell-center coordinates (reference writer origin convention:
        # first center at dx/2, dy/2)
        self._x = (np.arange(grid.nx) + 0.5) * coeffs.dx
        self._y = (np.arange(grid.ny) + 0.5) * coeffs.dy

    def _panels(self, state):
        sl = np.s_[1 : self.grid.ny + 1, 1 : self.grid.nx + 1]
        speed, w = self._derive(state.u, state.v)
        panels = [("|V|", np.asarray(speed)[sl], "viridis"),
                  ("vorticity", np.asarray(w)[sl], "RdBu_r")]
        if state.T is not None:
            panels.append(("T", np.asarray(state.T)[sl], "inferno"))
        return panels

    def __call__(self, state, step: int, time_value: float) -> Path:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        panels = self._panels(state)
        aspect = self.grid.nx / max(1, self.grid.ny)
        w_in = min(12.0, max(5.0, 4.0 * min(aspect, 3.0)))
        fig, axes = plt.subplots(
            len(panels), 1, figsize=(w_in, 0.4 + len(panels)
                                     * max(1.6, w_in / max(aspect, 1e-9) + 0.6)),
            squeeze=False)
        for ax, (name, a, cmap) in zip(axes[:, 0], panels):
            if self._fluid is not None:
                a = np.where(self._fluid, a, np.nan)
            if name == "vorticity":
                lim = np.nanpercentile(np.abs(a), 99) or 1.0
                m = ax.pcolormesh(self._x, self._y, a, cmap=cmap,
                                  vmin=-lim, vmax=lim, shading="auto",
                                  rasterized=True)
            else:
                m = ax.pcolormesh(self._x, self._y, a, cmap=cmap,
                                  shading="auto", rasterized=True)
            ax.set_aspect("equal")
            ax.set_title(f"{name}  (t={time_value:.3f})", fontsize=9)
            fig.colorbar(m, ax=ax, shrink=0.85)
        fig.suptitle(self.title, fontsize=10)
        fig.tight_layout()
        fname = f"{self.base}_{step:06d}.png"
        fig.savefig(self.out_dir / fname, dpi=self.dpi)
        plt.close(fig)
        self.entries.append((time_value, fname))
        return self.out_dir / fname


class MultiExporter:
    """Fan one Simulation exporter callback out to several (VTK + PNG)."""

    def __init__(self, exporters):
        self.exporters = [e for e in exporters if e is not None]

    def __call__(self, state, step: int, time_value: float):
        out = None
        for e in self.exporters:
            out = e(state, step, time_value)
        return out

    def write_collection(self):
        out = None
        for e in self.exporters:
            if hasattr(e, "write_collection"):
                out = e.write_collection()
        return out


def png_exporter_for_case(case, out_dir: str | Path = "vtk_output") -> PNGExporter:
    """PNGExporter from a solver.Case (duck-typed like vtk.exporter_for_case)."""
    return PNGExporter(case.grid, case.coeffs, case.vtk_title,
                       case.vtk_basename, out_dir)
