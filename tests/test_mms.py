"""Method of Manufactured Solutions: order-of-accuracy verification of the
discretization (cfd_tpu.validation.manufactured_solution + the body-force
predictor hook).

The reference claims a "2nd-order central" scheme (cavity-01.cpp:7-9) with
no verification anywhere; this test measures the spatial order directly.
The projection splitting does not pollute the measurement: at the discrete
FIXED POINT the dt-splitting cancels (u* = u + dt(F(u)+f) followed by
u - dt grad(p)/rho returns u exactly when 0 = F(u) + f - grad(p)/rho), so
the steady MMS error is pure spatial truncation.
"""

import jax.numpy as jnp
import numpy as np

from cfd_tpu.cases import make_cavity_case
from cfd_tpu.solver import make_step
from cfd_tpu.state import State
from cfd_tpu.validation import _mms_force, manufactured_solution, mms_exact

NU = 0.1  # Re ~ pi/0.1 ~ 31: advection matters but diffusion dominates


def test_mms_force_matches_numerical_differentiation():
    """The hand-derived forcing equals (u.grad)u + grad(p)/rho - nu lap(u)
    of the exact fields by central differences — guards the algebra."""
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.15, 0.85, size=(40, 2))
    x, y = pts[:, 0], pts[:, 1]
    h = 1e-5

    def du(f, comp, wrt):
        def g(xx, yy):
            return f(xx, yy)[comp]
        if wrt == "x":
            return (g(x + h, y) - g(x - h, y)) / (2 * h)
        return (g(x, y + h) - g(x, y - h)) / (2 * h)

    def lap(comp):
        def g(xx, yy):
            return mms_exact(xx, yy)[comp]
        return ((g(x + h, y) - 2 * g(x, y) + g(x - h, y)) / h**2
                + (g(x, y + h) - 2 * g(x, y) + g(x, y - h)) / h**2)

    u, v, _ = mms_exact(x, y)
    fx_num = (u * du(mms_exact, 0, "x") + v * du(mms_exact, 0, "y")
              + du(mms_exact, 2, "x") - NU * lap(0))
    fy_num = (u * du(mms_exact, 1, "x") + v * du(mms_exact, 1, "y")
              + du(mms_exact, 2, "y") - NU * lap(1))
    fx, fy = _mms_force(x, y, NU, 1.0)
    np.testing.assert_allclose(fx, fx_num, rtol=0, atol=5e-4)
    np.testing.assert_allclose(fy, fy_num, rtol=0, atol=5e-4)
    # divergence-free check of the exact velocity
    div = du(mms_exact, 0, "x") + du(mms_exact, 1, "y")
    np.testing.assert_allclose(div, 0.0, atol=5e-6)


def _mms_errors(n: int, poisson_flavor: str = "neumann") -> dict[str, float]:
    """March the forced cavity (lid 0) to steady state from the exact
    fields; return interior L2 errors vs the manufactured solution.

    ``poisson_flavor``: "neumann" swaps in the pure-Neumann pressure
    operator (mean-pinned multigrid); "cavity" keeps the factory's
    reference-faithful operator with the eps_s quirk (cavity-01.cpp:647:
    the south boundary row couples to the zero ghost) — measured below to
    cost a full order of accuracy."""
    # stability: diffusive dt bound 0.25 h^2 / nu at half margin
    h = 1.0 / n
    dt = 0.5 * 0.25 * h * h / NU
    from cfd_tpu.grid import Grid

    u_ex, v_ex, p_ex, fx, fy = manufactured_solution(
        Grid.regular(n, n, 1.0, 1.0), NU)
    case = make_cavity_case(
        n_interior=n, lid_velocity=0.0, dt=dt, final_time=1.0,
        tolerance_factor=1e-7, poisson="multigrid", dtype=jnp.float64,
        forcing=(fx, fy),
        reynolds_number=1.0,  # lid 0 zeroes the derived nu; fixed below
    )
    import dataclasses

    case = dataclasses.replace(
        case, coeffs=dataclasses.replace(case.coeffs, viscosity=NU))
    if poisson_flavor == "neumann":
        from cfd_tpu.poisson.multigrid import (MGConfig,
                                               make_multigrid_poisson,
                                               neumann_problem)

        solve = make_multigrid_poisson(
            neumann_problem(n, n, h, h),
            MGConfig(tol_factor=1e-7, pin_mean=True), dtype=jnp.float64)
        case = dataclasses.replace(case, poisson_solve=solve)
    grid = case.grid

    import jax

    step = jax.jit(make_step(case))
    st = State(jnp.asarray(u_ex), jnp.asarray(v_ex), jnp.asarray(p_ex),
               None, jnp.asarray(p_ex))
    n_steps = int(1.0 / dt)
    for _ in range(n_steps):
        st, _ = step(st)
    u = np.asarray(st.u)
    v = np.asarray(st.v)
    p = np.asarray(st.p)

    ui = np.s_[1:grid.ny + 1, 1:grid.nx]
    vi = np.s_[1:grid.ny, 1:grid.nx + 1]
    ci = np.s_[1:grid.ny + 1, 1:grid.nx + 1]
    du = u[ui] - u_ex[ui]
    dv = v[vi] - v_ex[vi]
    dp = p[ci] - p_ex[ci]
    dp -= dp.mean()  # pressure defined up to a constant (pure Neumann)
    l2 = lambda a: float(np.sqrt(np.mean(a**2)))
    return {"u": l2(du), "v": l2(dv), "p": l2(dp)}


def test_mms_spatial_order_is_second():
    """With the pure-Neumann pressure operator the discretization is
    cleanly 2nd order (measured 2.01/2.01/2.00 for u/v/p at 32->64)."""
    e32 = _mms_errors(32)
    e64 = _mms_errors(64)
    order_u = np.log2(e32["u"] / e64["u"])
    order_v = np.log2(e32["v"] / e64["v"])
    order_p = np.log2(e32["p"] / e64["p"])
    assert 1.8 <= order_u <= 2.3, (e32, e64, order_u)
    assert 1.8 <= order_v <= 2.3, (e32, e64, order_v)
    assert 1.7 <= order_p <= 2.3, (e32, e64, order_p)
    # absolute accuracy sanity at 64^2
    assert e64["u"] < 2e-3 and e64["v"] < 2e-3, e64


def test_reference_eps_quirk_costs_an_order():
    """The reference's eps_s Poisson quirk (cavity-01.cpp:647, deliberately
    reproduced in the cavity flavor for trace parity) degrades the scheme
    to ~1st order (measured 0.94/1.08 for u/v at 32->64) — quantified
    evidence that the quirk is a bug worth isolating to the parity path."""
    e32 = _mms_errors(32, poisson_flavor="cavity")
    e64 = _mms_errors(64, poisson_flavor="cavity")
    order_u = np.log2(e32["u"] / e64["u"])
    assert 0.6 <= order_u <= 1.5, (e32, e64, order_u)
    # and the quirk's error is strictly worse than the clean operator's
    assert e64["u"] > 2.0 * 0.0012, e64  # neumann e64 u-error is ~0.0011


def test_temporal_order_is_first():
    """Forward-Euler + projection splitting is O(dt): Richardson study on
    the unforced decaying MMS initial condition at fixed grid/time —
    errors vs a dt/8 reference halve when dt halves (the spatial error is
    identical across runs and cancels in the differences)."""
    import dataclasses

    import jax

    from cfd_tpu.grid import Grid
    from cfd_tpu.validation import manufactured_solution

    n, T = 32, 0.04
    h = 1.0 / n
    dt0 = 0.5 * 0.25 * h * h / NU
    u_ex, v_ex, p_ex, _, _ = manufactured_solution(
        Grid.regular(n, n, 1.0, 1.0), NU)

    def final_u(dt):
        case = make_cavity_case(
            n_interior=n, lid_velocity=0.0, dt=dt, final_time=T,
            tolerance_factor=1e-9, poisson="multigrid", dtype=jnp.float64,
            reynolds_number=1.0)
        case = dataclasses.replace(
            case, coeffs=dataclasses.replace(case.coeffs, viscosity=NU))
        step = jax.jit(make_step(case))
        st = State(jnp.asarray(u_ex), jnp.asarray(v_ex), jnp.asarray(p_ex),
                   None, jnp.asarray(p_ex))
        for _ in range(round(T / dt)):
            st, _ = step(st)
        return np.asarray(st.u)

    ref = final_u(dt0 / 8)
    e1 = np.sqrt(np.mean((final_u(dt0) - ref) ** 2))
    e2 = np.sqrt(np.mean((final_u(dt0 / 2) - ref) ** 2))
    order = np.log2(e1 / e2)
    # measured 0.80: non-incremental (Chorin) projection carries an O(dt)
    # bulk error plus pressure boundary layers that shade the observed
    # L2 order slightly below 1 — first-order-ish is the correct
    # expectation for this splitting, not clean 1.0
    assert 0.6 <= order <= 1.4, (e1, e2, order)
