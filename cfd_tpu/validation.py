"""Physics validation: the quantitative checks the reference claims.

The reference README claims (with no scripts in its repo): cavity centerline
profiles vs. Ghia, Ghia & Shin (1982) (README.md:27, 36), channel Poiseuille
parabola + friction factor (README.md:46, 56), and a step case whose
physically meaningful check is reattachment length vs. Re (README.md:62-75).
This module makes those checks executable.

All profile extraction happens on host numpy from a final state — these are
post-processing utilities, not hot-path code.
"""

from __future__ import annotations

import numpy as np

from cfd_tpu.grid import Grid

# --------------------------------------------------------------------- #
# Ghia, Ghia & Shin (1982), Table I & II: 129x129-grid benchmark values.
# u along the vertical centerline (x = 0.5), v along the horizontal
# centerline (y = 0.5), lid-driven cavity.
# --------------------------------------------------------------------- #

GHIA_Y = np.array([
    0.0000, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813, 0.4531, 0.5000,
    0.6172, 0.7344, 0.8516, 0.9531, 0.9609, 0.9688, 0.9766, 1.0000,
])
GHIA_U = {
    100: np.array([
        0.00000, -0.03717, -0.04192, -0.04775, -0.06434, -0.10150, -0.15662,
        -0.21090, -0.20581, -0.13641, 0.00332, 0.23151, 0.68717, 0.73722,
        0.78871, 0.84123, 1.00000,
    ]),
    1000: np.array([
        0.00000, -0.18109, -0.20196, -0.22220, -0.29730, -0.38289, -0.27805,
        -0.10648, -0.06080, 0.05702, 0.18719, 0.33304, 0.46604, 0.51117,
        0.57492, 0.65928, 1.00000,
    ]),
}
GHIA_X = np.array([
    0.0000, 0.0625, 0.0703, 0.0781, 0.0938, 0.1563, 0.2266, 0.2344, 0.5000,
    0.8047, 0.8594, 0.9063, 0.9453, 0.9531, 0.9609, 0.9688, 1.0000,
])
GHIA_V = {
    100: np.array([
        0.00000, 0.09233, 0.10091, 0.10890, 0.12317, 0.16077, 0.17507,
        0.17527, 0.05454, -0.24533, -0.22445, -0.16914, -0.10313, -0.08864,
        -0.07391, -0.05906, 0.00000,
    ]),
    1000: np.array([
        0.00000, 0.27485, 0.29012, 0.30353, 0.32627, 0.37095, 0.33075,
        0.32235, 0.02526, -0.31966, -0.42665, -0.51550, -0.39188, -0.33714,
        -0.27669, -0.21388, 0.00000,
    ]),
}


def centerline_profiles(u: np.ndarray, v: np.ndarray, grid: Grid
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(y, u(x=Lx/2), x, v(y=Ly/2)) from staggered face velocities.

    u faces live at x = i*dx — for even nx the face column i = nx/2 lies
    exactly on the centerline; odd nx interpolates the two nearest columns.
    v symmetric. y/x coordinates are cell centers.
    """
    nx, ny = grid.nx, grid.ny
    dx, dy = grid.dx, grid.dy
    u = np.asarray(u)
    v = np.asarray(v)

    xc_target = grid.lx / 2
    fi = xc_target / dx  # fractional face index
    i0 = int(np.floor(fi))
    w = fi - i0
    u_line = (1 - w) * u[1 : ny + 1, i0] + w * u[1 : ny + 1, i0 + 1]
    y = (np.arange(1, ny + 1) - 0.5) * dy

    yc_target = grid.ly / 2
    fj = yc_target / dy
    j0 = int(np.floor(fj))
    wv = fj - j0
    v_line = (1 - wv) * v[j0, 1 : nx + 1] + wv * v[j0 + 1, 1 : nx + 1]
    x = (np.arange(1, nx + 1) - 0.5) * dx
    return y, u_line, x, v_line


def ghia_errors(u: np.ndarray, v: np.ndarray, grid: Grid, reynolds: int
                ) -> dict[str, float]:
    """Interpolate our centerlines onto Ghia's sample points; RMS/max error."""
    y, u_line, x, v_line = centerline_profiles(u, v, grid)
    # extend with wall values for interpolation to y=0 / y=1
    ye = np.concatenate([[0.0], y, [grid.ly]])
    ue = np.concatenate([[0.0], u_line, [1.0]])  # no-slip bottom, lid top
    xe = np.concatenate([[0.0], x, [grid.lx]])
    ve = np.concatenate([[0.0], v_line, [0.0]])
    ui = np.interp(GHIA_Y, ye, ue)
    vi = np.interp(GHIA_X, xe, ve)
    du = ui - GHIA_U[reynolds]
    dv = vi - GHIA_V[reynolds]
    return {
        "u_rms": float(np.sqrt(np.mean(du**2))),
        "u_max": float(np.max(np.abs(du))),
        "v_rms": float(np.sqrt(np.mean(dv**2))),
        "v_max": float(np.max(np.abs(dv))),
    }


def poiseuille_profile_error(u: np.ndarray, grid: Grid, x_station: float,
                             u_mean: float | None = None) -> dict[str, float]:
    """Developed plane-Poiseuille check at a station: u(y) vs the analytic
    parabola 6*U_mean*(y/H)*(1 - y/H) (README.md:46 claim).

    ``u_mean=None`` uses the station's own mean flux. That is the right
    normalization for this scheme: the reference's mean-source removal plus
    zero-gradient outlet leaves a uniform residual divergence (its own
    steady max(div)=2.17e-2, golden/channel), so the flux decays slowly
    along the channel while the profile SHAPE is exactly parabolic
    (u_max/u_mean -> 1.5)."""
    ny, dy, h = grid.ny, grid.dy, grid.ly
    i = int(round(x_station / grid.dx))
    prof = np.asarray(u)[1 : ny + 1, i]
    if u_mean is None:
        u_mean = float(prof.mean())
    y = (np.arange(1, ny + 1) - 0.5) * dy
    exact = 6.0 * u_mean * (y / h) * (1.0 - y / h)
    err = prof - exact
    return {
        "rms": float(np.sqrt(np.mean(err**2))),
        "max": float(np.max(np.abs(err))),
        "u_centerline": float(prof[ny // 2]),
        "u_mean": u_mean,
        "peak_ratio": float(prof.max() / u_mean),
    }


def fanning_friction_factor(u: np.ndarray, grid: Grid, viscosity: float,
                            density: float, x_station: float,
                            u_mean: float = 1.0) -> float:
    """Fanning f = tau_w / (rho u_mean^2 / 2) from one-sided wall shear at a
    station; plane Poiseuille exact value is f = 12 / Re_H
    (README.md:56 'friction factor vs Re' claim, made precise)."""
    i = int(round(x_station / grid.dx))
    un = np.asarray(u)
    tau_bottom = viscosity * un[1, i] / (grid.dy / 2)
    tau_top = viscosity * un[grid.ny, i] / (grid.dy / 2)
    tau = 0.5 * (tau_bottom + tau_top)
    return float(tau / (0.5 * density * u_mean**2))


def reattachment_length(u: np.ndarray, grid: Grid, step_x: float,
                        wall: str = "top") -> float:
    """Backward-facing-step reattachment: first sign change of wall shear
    (proportional to u in the wall-adjacent cell row) downstream of the step
    (the physically meaningful validation for backwards_step-01.cpp,
    SURVEY.md section 4).

    In the reference geometry the solid blocks the UPPER half upstream
    (backwards_step-01.cpp:499-520: solid = i <= step AND j > inlet), so the
    expansion — and the recirculation bubble — is at the top wall."""
    un = np.asarray(u)
    i_step = int(round(step_x / grid.dx))
    j = grid.ny if wall == "top" else 1
    row = un[j, i_step + 1 : grid.nx]  # u on faces in the wall-adjacent row
    x = (np.arange(i_step + 1, grid.nx)) * grid.dx
    neg = row < 0
    if not neg[0]:
        return 0.0  # no recirculation resolved
    idx = int(np.argmax(~neg))  # first non-negative
    if idx == 0:
        return float("nan")
    x0, x1 = x[idx - 1], x[idx]
    f0, f1 = row[idx - 1], row[idx]
    xr = x0 + (0.0 - f0) * (x1 - x0) / (f1 - f0)
    return float(xr - step_x)


# --------------------------------------------------------------------- #
# Method of Manufactured Solutions (MMS): steady forced Navier-Stokes
# verification of the discretization's spatial order. No reference analog
# (the reference has no body-force term at all); this is the standard
# order-of-accuracy evidence for the scheme the reference claims is
# "2nd-order central" (cavity-01.cpp:7-9).
#
# Exact fields from the streamfunction psi = sin^2(pi x) sin^2(pi y) on the
# unit box (velocities vanish on all walls -> the cavity's no-slip BC
# machinery applies exactly, with lid_velocity = 0):
#   u =  d(psi)/dy =  pi sin^2(pi x) sin(2 pi y)
#   v = -d(psi)/dx = -pi sin(2 pi x) sin^2(pi y)      (divergence-free)
#   p = cos(pi x) cos(pi y)                            (zero-mean)
# Steady momentum gives the body force
#   f = (u . grad) u + grad(p)/rho - nu lap(u).
# --------------------------------------------------------------------- #

def mms_exact(x, y):
    """(u, v, p) of the manufactured solution at coordinates (x, y)."""
    pi = np.pi
    u = pi * np.sin(pi * x) ** 2 * np.sin(2 * pi * y)
    v = -pi * np.sin(2 * pi * x) * np.sin(pi * y) ** 2
    p = np.cos(pi * x) * np.cos(pi * y)
    return u, v, p


def _mms_force(x, y, viscosity: float, density: float):
    """(fx, fy): steady-momentum residual of the exact fields (analytic
    derivatives; spot-checked against numerical differentiation in
    tests/test_mms.py)."""
    pi = np.pi
    sx, cx = np.sin(pi * x), np.cos(pi * x)
    sy, cy = np.sin(pi * y), np.cos(pi * y)
    s2x, c2x = np.sin(2 * pi * x), np.cos(2 * pi * x)
    s2y, c2y = np.sin(2 * pi * y), np.cos(2 * pi * y)

    u = pi * sx**2 * s2y
    v = -pi * s2x * sy**2
    du_dx = pi**2 * s2x * s2y
    du_dy = 2 * pi**2 * sx**2 * c2y
    lap_u = 2 * pi**3 * c2x * s2y - 4 * pi**3 * sx**2 * s2y
    dv_dx = -2 * pi**2 * c2x * sy**2
    dv_dy = -pi**2 * s2x * s2y
    lap_v = 4 * pi**3 * s2x * sy**2 - 2 * pi**3 * s2x * c2y
    dp_dx = -pi * sx * cy
    dp_dy = -pi * cx * sy

    fx = u * du_dx + v * du_dy + dp_dx / density - viscosity * lap_u
    fy = u * dv_dx + v * dv_dy + dp_dy / density - viscosity * lap_v
    return fx, fy


def manufactured_solution(grid: Grid, viscosity: float, density: float = 1.0):
    """Exact MAC-grid fields and forcing arrays for the MMS case.

    Returns (u_ex, v_ex, p_ex, fx, fy) as full padded (ny+2, nx+2) float64
    arrays: u_ex/fx on the u-faces (x = i dx, y = (j-1/2) dy), v_ex/fy on
    the v-faces (x = (i-1/2) dx, y = j dy), p_ex at cell centers. Entries
    outside the valid face/cell ranges are 0."""
    ny, nx = grid.ny, grid.nx
    dx, dy = grid.dx, grid.dy
    jj, ii = np.meshgrid(np.arange(ny + 2), np.arange(nx + 2), indexing="ij")

    xu, yu = ii * dx, (jj - 0.5) * dy
    u_ex, _, _ = mms_exact(xu, yu)
    fx, _ = _mms_force(xu, yu, viscosity, density)
    u_valid = (jj >= 1) & (jj <= ny) & (ii >= 1) & (ii <= nx - 1)
    u_ex = np.where(u_valid, u_ex, 0.0)
    fx = np.where(u_valid, fx, 0.0)

    xv, yv = (ii - 0.5) * dx, jj * dy
    _, v_ex, _ = mms_exact(xv, yv)
    _, fy = _mms_force(xv, yv, viscosity, density)
    v_valid = (jj >= 1) & (jj <= ny - 1) & (ii >= 1) & (ii <= nx)
    v_ex = np.where(v_valid, v_ex, 0.0)
    fy = np.where(v_valid, fy, 0.0)

    xp, yp = (ii - 0.5) * dx, (jj - 0.5) * dy
    _, _, p_ex = mms_exact(xp, yp)
    cell = (jj >= 1) & (jj <= ny) & (ii >= 1) & (ii <= nx)
    p_ex = np.where(cell, p_ex, 0.0)
    return u_ex, v_ex, p_ex, fx, fy
