"""Reference-parity console output: ANSI colors, the simulation-info banner,
and the completion summary.

The reference paints its stdout with ANSI constants (cavity-01.cpp:35-41),
prints a cyan parameter banner at construction (printSimulationInfo,
cavity-01.cpp:501-518, channel-01.cpp:487-505, backwards_step-01.cpp:588-608)
and a green completion block after the run (cavity-01.cpp:404-410). The
stats ROWS themselves are emitted by Simulation.run and parsed by the
golden-trace tests, so they stay uncolored; everything here is presentation
around them.
"""

from __future__ import annotations

import sys

RESET = "\033[0m"
RED = "\033[31m"
GREEN = "\033[32m"
YELLOW = "\033[33m"
BLUE = "\033[34m"
MAGENTA = "\033[35m"
CYAN = "\033[36m"


def use_color(flag: bool | None = None) -> bool:
    """None = auto (color iff stdout is a tty, the conventional default)."""
    if flag is not None:
        return flag
    return bool(getattr(sys.stdout, "isatty", lambda: False)())


def paint(text: str, color: str, enabled: bool) -> str:
    return f"{color}{text}{RESET}" if enabled else text


def banner_lines(case) -> list[str]:
    """The reference printSimulationInfo block for a case, built from the
    factory-recorded ``case.info`` scalars (fixed 6-decimal formatting as in
    the reference's ``std::setprecision(6)``)."""
    info = case.info or {}
    g = case.grid
    f = lambda x: f"{float(x):.6f}"
    title = info.get("banner_title", f"{case.name} Simulation")
    lines = [f"=== {title} ===",
             f"Domain: {f(info.get('length', g.nx * g.dx))}x"
             f"{f(info.get('height', g.ny * g.dy))}"]
    if "step_height" in info:  # backwards_step-01.cpp:592-594
        lines.append(f"Step: height={f(info['step_height'])}, "
                     f"location={f(info['step_location'])}")
    if info.get("square_spacing"):  # cavity-01.cpp:505-506
        lines.append(f"Grid: {g.nx}x{g.ny} (spacing={f(g.dx)})")
    else:
        lines.append(f"Grid: {g.nx}x{g.ny} (dx={f(g.dx)}, dy={f(g.dy)})")
    lines.append(f"Time: dt={f(case.dt)}, steps={case.total_steps}, "
                 f"final_time={f(case.final_time)}")
    if "rayleigh" in info:
        lines.append(f"Rayleigh={info['rayleigh']:.6g}, "
                     f"Prandtl={f(info['prandtl'])}, "
                     f"CFL={f(info.get('cfl', 0.0))}")
    else:
        lines.append(f"Reynolds={f(info.get('reynolds', 0.0))}, "
                     f"kinematic viscosity={f(case.coeffs.viscosity)}, "
                     f"CFL={f(info.get('cfl', 0.0))}")
    if "omega" in info:
        lines.append(f"Relaxation factor={f(info['omega'])}")
    lines.append(f"VTK export interval={case.save_interval} steps")
    lines.append("==========================================")
    return lines


def print_banner(case, color: bool | None = None, log=print) -> None:
    en = use_color(color)
    log(paint("\n".join(banner_lines(case)), CYAN, en))
    if case.grid.has_solids:
        # backwards_step-01.cpp:523-531 geometry report
        g = case.grid
        log(paint(f"Geometry setup complete. Fluid cells: "
                  f"{g.n_fluid}/{g.nx * g.ny}", BLUE, en))


def print_completion(case, out_dir, color: bool | None = None, log=print) -> None:
    """The green end-of-run block (cavity-01.cpp:404-410)."""
    en = use_color(color)
    log(paint(
        "Simulation completed successfully!\n"
        f"VTK files saved in directory: {out_dir}\n"
        f"Open '{out_dir}/{case.vtk_basename}_animation.pvd' in ParaView "
        "for animation", GREEN, en))
