import numpy as np

from cfd_tpu.cases.backwards_step import make_backwards_step_case
from cfd_tpu.grid import Grid, cfl_time_step, optimal_omega


def test_regular_grid_shapes():
    g = Grid.regular(63, 63)
    assert g.shape == (65, 65)
    assert g.n_fluid == 63 * 63
    assert not g.has_solids
    assert np.isclose(g.dx, 1.0 / 63)


def test_optimal_omega_reference_values():
    # cavity-01.cpp prints 1.90645 for N=63; channel 1.86349 (93x31);
    # step 1.87300 (256x32) — SURVEY.md section 6.
    assert abs(optimal_omega(63) - 1.90645) < 1e-5
    assert abs(optimal_omega(93, 31) - 1.86349) < 1e-5
    assert abs(optimal_omega(256, 32) - 1.87300) < 1e-5


def test_reference_time_steps():
    # dt values from SURVEY.md section 6 (derived from reference constants)
    assert abs(cfl_time_step(1 / 63, 1 / 63, 1e-3, 1.0, 0.5) - 7.93651e-3) < 1e-8
    assert abs(cfl_time_step(3 / 93, 1 / 31, 1e-2, 1.0, 0.25) - 6.50364e-3) < 1e-8
    assert abs(cfl_time_step(8 / 256, 2 / 32, 1e-2, 1.0, 0.2) - 4.8828125e-3) < 1e-12


def test_reference_step_counts():
    from cfd_tpu.cases.cavity import make_cavity_case
    from cfd_tpu.cases.channel import make_channel_case

    assert make_cavity_case().total_steps == 2520
    assert make_channel_case().total_steps == 1537
    assert make_backwards_step_case().total_steps == 3072


def test_step_geometry_fluid_count():
    # Reference prints fluid count: solid block is i in [1,64] x j in [17,32]
    # -> 64*16 = 1024 solid; 256*32 - 1024 = 7168 fluid.
    case = make_backwards_step_case()
    assert case.grid.n_fluid == 7168


def test_step_masks_match_bruteforce():
    case = make_backwards_step_case(nx=32, ny=16, final_time=0.1)
    g = case.grid
    nx, ny = g.nx, g.ny
    f = g.fluid

    u_valid = np.zeros(g.shape, dtype=bool)
    for j in range(1, ny + 1):
        for i in range(1, nx):
            u_valid[j, i] = f[j, i] or f[j, i + 1]
    assert (g.u_valid_mask == u_valid).all()

    v_valid = np.zeros(g.shape, dtype=bool)
    for j in range(1, ny):
        for i in range(1, nx + 1):
            v_valid[j, i] = f[j, i] or f[j + 1, i]
    assert (g.v_valid_mask == v_valid).all()

    # interface zero masks vs the reference's solid-cell sweep
    u_zero = np.zeros(g.shape, dtype=bool)
    v_zero = np.zeros(g.shape, dtype=bool)
    for j in range(1, ny + 1):
        for i in range(1, nx + 1):
            if not f[j, i]:
                if i < nx and f[j, i + 1]:
                    u_zero[j, i] = True
                if i > 1 and f[j, i - 1]:
                    u_zero[j, i - 1] = True
                if j < ny and f[j + 1, i]:
                    v_zero[j, i] = True
                if j > 1 and f[j - 1, i]:
                    v_zero[j - 1, i] = True
    assert (g.u_zero_mask == u_zero).all()
    assert (g.v_zero_mask == v_zero).all()
