"""Whole-Poisson-solve-in-VMEM: the ENTIRE tolerance-driven multigrid
solve for the quad fast path in ONE Pallas call.

Motivation (PARITY.md round-3 roadmap): at the secondary-case sizes
(channel/RB 1536x512, step 2048x256) the quad fields are a few MB each, so
the whole V-cycle state — finest quad planes AND every coarse level — fits
in VMEM simultaneously.  The per-step Poisson cost is then dominated not by
HBM bandwidth but by kernel launches and the XLA glue between them (pre
kernel + coarse levels/fused tail + post kernel + while_loop plumbing per
cycle).  This kernel runs the OUTER tolerance loop itself
(``lax.while_loop`` with scalar carries + the four quad planes), so one
step's whole pressure solve is a single launch: p and b stream from HBM
exactly once, every V-cycle in between runs at VMEM speed.

Semantics are identical to the per-kernel composition it replaces
(poisson.multigrid.make_multigrid_poisson with quad_level0= the
kernels.quad pre/post pair + the aligned coarse hierarchy):

* finest level: ``_smooth_pairs_quad`` red/black pairs -> residual ->
  full-weighting restriction (the quad pre kernel's compute, with the
  whole array as one "slab": band bookkeeping degenerates to all-true
  because physical ghost rows terminate every dependency chain);
* coarse hierarchy: kernels.mg_tail's ``run_tail_vcycle`` (lane-dimension
  transfers as banded constant matmuls on the MXU, coarsest dense
  pseudo-inverse in lane-space blocks);
* back at the finest level: bilinear prolongation + post pairs + the
  tolerance residual max (the quad post kernel's compute);
* stopping rule: exactly MGConfig's (tol, max_cycles, stall_ratio) triple
  with the same 1e30 finite sentinel as multigrid.solve.

``pin_mean`` (pure-Neumann / Rayleigh-Benard): the per-cycle interior mean
subtraction runs in-kernel after the fused residual (valid because the
constant is the operator's nullspace — the same argument as
multigrid.solve's pin_mean composition).

The V-cycle bodies are exposed as ``separable_vcycle_ctx`` /
``masked_vcycle_ctx`` so kernels.whole_step can embed the same solve
inside the fused whole-time-step kernel.

Float32 only (the performance path).  Reference anchor: this replaces the
SOR hot loop of /root/reference/cavity-01.cpp:609-690 (and the channel/
step twins) at production sizes; equivalence to the per-kernel path is
asserted in tests/test_whole_solve.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from cfd_tpu.kernels.mg_tail import (
    _lv_masks_invdiag,
    _ref_bytes,
    _residual as _tail_residual,
    _solid_fill,
    build_tail_consts,
    run_tail_vcycle,
    tail_consts_bytes,
)
from cfd_tpu.kernels.quad import (
    _band_maker,
    _plane_weight_vectors,
    _qiota,
    _residual_quad,
    _smooth_pairs_quad,
    quad_dims,
)
from cfd_tpu.poisson.multigrid import MGConfig, PoissonProblem, _build_level, _dense_pinv, coarsen_problem


def _bilinear_corr(ec, Jc, Ic, nyc: int, nxc: int):
    """Bilinear 9-3-3-1 prolongation of the aligned coarse correction to
    the four quad planes (plane order: corr[q >> 1][q & 1]) — the
    kernels.quad post kernel's construction on whole VMEM-resident
    arrays."""
    ecJ1 = jnp.roll(ec, -1, axis=0)
    ecJ0 = jnp.where(Jc == 0, ecJ1, ec)
    ecJ1 = jnp.where(Jc == nyc, ec, ecJ1)
    rowmix = [0.75 * ecJ0 + 0.25 * ecJ1,
              0.25 * ecJ0 + 0.75 * ecJ1]
    corr = []
    for rr in range(2):
        m1 = jnp.roll(rowmix[rr], -1, axis=1)
        m0 = jnp.where(Ic == 0, m1, rowmix[rr])
        m1 = jnp.where(Ic == nxc, rowmix[rr], m1)
        corr.append([0.75 * m0 + 0.25 * m1,
                     0.25 * m0 + 0.75 * m1])
    return [corr[q >> 1][q & 1] for q in range(4)]


def _whole_call(kernel, n_consts: int, plane_shape, vmem_limit: int,
                interpret: bool, alias_p: bool = False):
    """The shared pallas_call scaffold: (p4, b4, tol, *consts) ->
    (p4, (cycles, res) SMEM pair), everything VMEM-resident.

    ``alias_p``: alias the warm-start input with the pressure output
    (the solve consumes its warm start), saving one whole quad field of
    VMEM — the margin the 2048^2 bf16-hierarchy composition needs."""
    from jax.experimental.pallas import tpu as pltpu

    Hq8, Wqa = plane_shape
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_consts,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((4, Hq8, Wqa), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2), jnp.float32)),
        input_output_aliases={0: 0} if alias_p else {},
        compiler_params=pltpu.CompilerParams(
            has_side_effects=False, vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )


def _make_solve(call, consts, cfg: MGConfig):
    """The (p_warm, b, max_b) -> (p, cycles, res) contract around the
    fused call (multigrid.solve's tolerance construction)."""
    def solve(p_warm, b, max_b=None):
        if max_b is None:
            max_b = jnp.max(jnp.abs(b))  # quad b is 0 outside the interior
        tol = jnp.maximum(
            cfg.tol_factor * jnp.where(max_b > 0, max_b,
                                       jnp.ones_like(max_b)),
            jnp.asarray(cfg.abs_tol, jnp.float32))
        p, s = call(p_warm, b, jnp.reshape(tol, (1,)).astype(jnp.float32),
                    *consts)
        return p, s[0, 0].astype(jnp.int32), s[0, 1]

    return solve


def tolerance_loop(p0, vcycle, tol, max_cycles: int, stall_ratio: float):
    """multigrid.solve's stopping rule on in-kernel VALUES: iterate
    ``vcycle([p0..p3]) -> (p, res)`` from the 4-tuple ``p0`` until
    res <= tol, max_cycles, or stall. Returns (p 4-tuple, cycles, res)."""
    def cond(carry):
        _, _, _, _, res, prev, it = carry
        return (res > tol) & (it < max_cycles) & (res < stall_ratio * prev)

    def body(carry):
        pa, pb, pc, pd, res, _, it = carry
        p, new_res = vcycle([pa, pb, pc, pd])
        return (*p, new_res, res, it + 1)

    big = jnp.float32(1e30)
    out = jax.lax.while_loop(cond, body, (*p0, big / 2, big, jnp.int32(0)))
    return out[:4], out[6], out[4]


def _coarse_dt(cfg: MGConfig):
    """Validated storage dtype of the in-VMEM coarse hierarchy (None or
    jnp.bfloat16)."""
    if cfg.coarse_dtype is None:
        return None
    if cfg.coarse_dtype not in ("bfloat16", "bf16"):
        raise ValueError(f"unsupported coarse_dtype {cfg.coarse_dtype!r}"
                         " (only 'bfloat16')")
    return jnp.bfloat16


def _coarsen_chain(problem: PoissonProblem, cfg: MGConfig):
    probs = [problem]
    while (probs[-1].nx % 2 == 0 and probs[-1].ny % 2 == 0
           and probs[-1].nx // 2 >= cfg.min_coarse
           and probs[-1].ny // 2 >= cfg.min_coarse):
        probs.append(coarsen_problem(probs[-1]))
    if len(probs) < 3:
        raise ValueError("whole-solve needs >= 2 coarse levels")
    return probs


def separable_vcycle_ctx(shape, problem: PoissonProblem, cfg: MGConfig,
                         pin_mean: bool = False,
                         n_interior: int | None = None):
    """VMEM-resident V-cycle context for the separable quad flavors
    (cavity / channel / Rayleigh-Benard).

    Returns ``(consts, est_fixed, plane_shape, make_vcycle)``: the jnp
    constant list to append to the pallas_call inputs, their + the coarse
    levels' live-array VMEM footprint, the (Hq8, Wqa) plane shape, and
    ``make_vcycle(getc, b) -> vcycle(p4_list) -> (p4_list, res)`` — the
    in-kernel body (``getc(i)`` loads consts[i]; pin_mean's per-cycle
    interior mean shift is folded in after the fused residual).

    ``cfg.coarse_dtype='bfloat16'``: store the whole IN-VMEM coarse
    hierarchy — tail constants and the per-level descent arrays — in
    bfloat16 (f32 arithmetic per level, run_tail_vcycle store_dtype).
    Roughly halves the hierarchy's resident footprint; the finest quad
    planes, smoothing and tolerance residual stay f32, so the convergence
    floor is untouched (MGConfig.coarse_dtype's iterative-refinement
    argument). This is what lets the whole-solve kernel fit VMEM at the
    2048^2 cavity headline size, where the f32 hierarchy build-rejects."""
    coarse_dt = _coarse_dt(cfg)
    if cfg.corr_opt:
        raise ValueError("corr_opt is a masked defect-correction knob — "
                         "separable hierarchies coarsen consistently and "
                         "do not take it")
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    nyc, nxc = ny // 2, nx // 2
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    n_int = n_interior or (nx * ny)

    probs = _coarsen_chain(problem, cfg)
    levels = [_build_level(p, jnp.float32, aligned=True) for p in probs[1:]]
    if levels[0].shape != (Hq8, Wqa):
        raise ValueError(f"aligned coarse shape {levels[0].shape} != quad "
                         f"plane shape {(Hq8, Wqa)}")
    pinv = _dense_pinv(probs[-1])

    tail_consts, w_idx, t_idx, m_idx = build_tail_consts(
        levels, pinv,
        dtype=np.dtype(coarse_dt) if coarse_dt is not None else np.float32)
    wEc, wWc, wNc, wSc = _plane_weight_vectors(problem, shape)
    fine_consts = [*wEc, *wWc, *wNc, *wSc]  # 8 arrays
    n_fine = len(fine_consts)
    consts = [jnp.asarray(c, jnp.float32) for c in fine_consts] \
        + [jnp.asarray(c) for c in tail_consts]
    cb = 2 if coarse_dt is not None else 4
    # per-level live set: b[k] + ps[k] (store dtype) across the whole
    # descent+ascent. Transient f32 arithmetic at the active level is NOT
    # summed here: the kernel is sequential, so level-1 f32 temporaries
    # (<= 0.75 qfield — the aligned level-1 shape IS the quad plane shape)
    # and finest-plane smoothing temporaries are never live together;
    # _solve_from_ctx budgets their max once as the transient allowance.
    est_fixed = (sum(3 * _ref_bytes(lv.shape, cb) for lv in levels)
                 + tail_consts_bytes(tail_consts)
                 + sum(_ref_bytes(np.asarray(c).shape) for c in fine_consts))

    idx2 = 1.0 / (problem.dx * problem.dx)
    idy2 = 1.0 / (problem.dy * problem.dy)
    omega = float(cfg.omega)
    pre_sweeps, post_sweeps = cfg.pre_sweeps, cfg.post_sweeps

    def make_vcycle(getc, b):
        wE = [getc(0), getc(1)]
        wW = [getc(2), getc(3)]
        wN = [getc(4), getc(5)]
        wS = [getc(6), getc(7)]
        grow, gcol = _qiota(0, Hq8, Wqa)
        masks = [(g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
                 for g, c in zip(grow, gcol)]
        # whole-array "slab": physical edges terminate every half-sweep
        # dependency chain, so the band is all-true at every offset
        band = _band_maker(0, Hq8, Wqa, ny)
        Jc = jax.lax.broadcasted_iota(jnp.int32, (Hq8, Wqa), 0)
        Ic = jax.lax.broadcasted_iota(jnp.int32, (Hq8, Wqa), 1)
        cmask = (Jc >= 1) & (Jc <= nyc) & (Ic >= 1) & (Ic <= nxc)
        tail_getc = lambda i: getc(n_fine + i)
        if pin_mean:
            cell = [m.astype(jnp.float32) for m in masks]

        def vcycle(p):
            # --- finest level: pre-smooth + residual + restriction
            # (the kernels.quad pre compute at s=0, whole array)
            p = _smooth_pairs_quad(p, b, pre_sweeps, omega, idx2, idy2,
                                   wE, wW, wN, wS, masks, band)
            r = _residual_quad(p, b, idx2, idy2, wE, wW, wN, wS, masks)
            rc = 0.25 * (r[0]
                         + jnp.roll(r[1], 1, axis=1)
                         + jnp.roll(r[2], 1, axis=0)
                         + jnp.roll(jnp.roll(r[3], 1, axis=0), 1, axis=1))
            rc = jnp.where(cmask, rc, jnp.zeros_like(rc))

            # --- the whole coarse hierarchy (kernels.mg_tail body)
            ec = run_tail_vcycle(levels, rc, tail_getc, w_idx, t_idx, m_idx,
                                 omega, pre_sweeps, post_sweeps,
                                 store_dtype=coarse_dt)

            # --- finest level: bilinear prolongation + post-smooth +
            # tolerance residual (the kernels.quad post compute at s=0)
            corr = _bilinear_corr(ec, Jc, Ic, nyc, nxc)
            p = [jnp.where(masks[q], p[q] + corr[q], p[q])
                 for q in range(4)]
            p = _smooth_pairs_quad(p, b, post_sweeps, omega, idx2, idy2,
                                   wE, wW, wN, wS, masks, band)
            r = _residual_quad(p, b, idx2, idy2, wE, wW, wN, wS, masks)
            new_res = jnp.max(jnp.stack([jnp.max(jnp.abs(a)) for a in r]))
            if pin_mean:
                # pure Neumann: the constant is the nullspace, so the fused
                # residual stays valid after the shift (multigrid.solve)
                mean = sum(jnp.sum(a) for a in p) / n_int
                p = [a - mean * m for a, m in zip(p, cell)]
            return p, new_res

        return vcycle

    return consts, est_fixed, (Hq8, Wqa), make_vcycle


def masked_vcycle_ctx(grid, coeffs, cfg: MGConfig):
    """VMEM-resident V-cycle context for the MASKED (backwards-step)
    flavor: the exact quad fine level (ghost refresh incl. solid-cell
    averaging + dense red/black planes, kernels.step_quad semantics) over
    the full-2D-weight coarse hierarchy (kernels.mg_tail full-weight
    mode), defect-correction structure preserved exactly
    (/root/reference/backwards_step-01.cpp:685-740 ghosts on the fine
    level, weighted approximation below). Same contract as
    separable_vcycle_ctx, including the ``cfg.coarse_dtype='bfloat16'``
    in-VMEM bf16 hierarchy (the masked 2D weights are 0/1 valued — exactly
    representable — and the defect-correction seam stays f32)."""
    coarse_dt = _coarse_dt(cfg)
    from cfd_tpu.kernels.step_quad import (
        _exact_residual_quad,
        _smooth_stage_quad,
        _step_masks,
    )
    from cfd_tpu.poisson.multigrid import (
        masked_channel_problem,
        step_rect_params,
    )

    rect = step_rect_params(grid)
    if rect is None:
        raise ValueError("the masked whole-solve requires the reference's "
                         "step rectangle raster")
    step_i, inlet_j = rect
    nx, ny = grid.nx, grid.ny
    nyc, nxc = ny // 2, nx // 2
    Hq, Wq, Hq8, Wqa = quad_dims(grid.shape)
    idx2, idy2 = coeffs.idx2, coeffs.idy2

    probs = _coarsen_chain(masked_channel_problem(grid, coeffs.dx,
                                                  coeffs.dy), cfg)
    levels = [_build_level(p, jnp.float32, aligned=True, allow_full=True)
              for p in probs[1:]]
    if levels[0].shape != (Hq8, Wqa):
        raise ValueError(f"aligned coarse shape {levels[0].shape} != quad "
                         f"plane shape {(Hq8, Wqa)}")
    pinv = _dense_pinv(probs[-1])

    tail_consts, w_idx, t_idx, m_idx = build_tail_consts(
        levels, pinv,
        dtype=np.dtype(coarse_dt) if coarse_dt is not None else np.float32)
    consts = [jnp.asarray(c) for c in tail_consts]
    cb = 2 if coarse_dt is not None else 4
    # transient f32 arithmetic is budgeted once in _solve_from_ctx (see
    # separable_vcycle_ctx's est_fixed comment — sequential liveness)
    est_fixed = (sum(3 * _ref_bytes(lv.shape, cb) for lv in levels)
                 + tail_consts_bytes(tail_consts))

    omega = float(cfg.omega)
    pre_sweeps, post_sweeps = cfg.pre_sweeps, cfg.post_sweeps

    def make_vcycle(getc, b):
        grow, gcol = _qiota(0, Hq8, Wqa)
        fluid, _, _ = _step_masks(grow, gcol, ny, nx, step_i, inlet_j)
        # whole-array "slab" at s=0: the band ledger is all-true at every
        # offset (physical edges terminate every dependency chain)
        band = _band_maker(0, Hq8, Wqa, ny)
        Jc = jax.lax.broadcasted_iota(jnp.int32, (Hq8, Wqa), 0)
        Ic = jax.lax.broadcasted_iota(jnp.int32, (Hq8, Wqa), 1)
        cmask = (Jc >= 1) & (Jc <= nyc) & (Ic >= 1) & (Ic <= nxc)

        def vcycle(p):
            # --- exact masked fine level: pre pairs + residual + restrict
            # (the kernels.step_quad pre compute at s=0)
            p, k = _smooth_stage_quad(p, b, grow, gcol, fluid, band, 0,
                                      pre_sweeps, omega, idx2, idy2, ny, nx,
                                      step_i, inlet_j)
            r = _exact_residual_quad(p, b, grow, gcol, fluid, band, k,
                                     idx2, idy2, ny, nx, step_i, inlet_j)
            rc = 0.25 * (r[0]
                         + jnp.roll(r[1], 1, axis=1)
                         + jnp.roll(r[2], 1, axis=0)
                         + jnp.roll(jnp.roll(r[3], 1, axis=0), 1, axis=1))
            rc = jnp.where(cmask, rc, jnp.zeros_like(rc))

            # --- the full-2D-weight coarse hierarchy (kernels.mg_tail)
            ec = run_tail_vcycle(levels, rc, getc, w_idx, t_idx, m_idx,
                                 omega, pre_sweeps, post_sweeps,
                                 store_dtype=coarse_dt)
            if cfg.corr_opt:
                # clamped line-searched correction steplength at the
                # exact/weighted defect-correction seam — the in-kernel
                # twin of multigrid._corr_alpha (see its docstring for the
                # clamp rationale): alpha = clip(<rc, A1 ec>/<A1 ec, A1 ec>,
                # 1.0, 1.5) with A1 the level-1 weighted operator.
                lv0 = levels[0]
                wE, wW, wN, wS = (getc(w_idx[0] + i).astype(jnp.float32)
                                  for i in range(4))
                interior1 = _lv_masks_invdiag(lv0, wE, wW, wN, wS)[0]
                Aec = -_tail_residual(lv0, ec, jnp.zeros_like(ec),
                                      interior1, wE, wW, wN, wS)
                num = jnp.sum(rc * Aec)
                den = jnp.sum(Aec * Aec)
                raw = jnp.where(den > 0,
                                num / jnp.where(den > 0, den,
                                                jnp.ones_like(den)),
                                jnp.ones_like(num))
                ec = jnp.clip(raw, 1.0, 1.5) * ec

            # --- prolongation on FLUID cells + exact post + tolerance
            # residual (the kernels.step_quad post compute at s=0).
            # Neumann-extend the correction into level-1 solid cells first
            # (mg_tail._solid_fill) — the bilinear stencil is mask-blind
            # and would damp the near-wall correction every cycle (the
            # barely-contracting masked mode; multigrid._solid_fill).
            lv1 = levels[0]
            w1 = tuple(getc(w_idx[0] + i).astype(jnp.float32)
                       for i in range(4))
            ec = _solid_fill(lv1, ec, *w1)
            corr = _bilinear_corr(ec, Jc, Ic, nyc, nxc)
            p = [jnp.where(fluid[q], p[q] + corr[q], p[q])
                 for q in range(4)]
            p, k = _smooth_stage_quad(p, b, grow, gcol, fluid,
                                      lambda lo: band(lo + 1), 0,
                                      post_sweeps, omega, idx2, idy2,
                                      ny, nx, step_i, inlet_j)
            r = _exact_residual_quad(p, b, grow, gcol, fluid,
                                     lambda lo: band(lo + 1), k, idx2, idy2,
                                     ny, nx, step_i, inlet_j)
            new_res = jnp.max(jnp.stack([jnp.max(jnp.abs(a)) for a in r]))
            return p, new_res

        return vcycle

    return consts, est_fixed, (Hq8, Wqa), make_vcycle


# Probe-derived toolchain ceiling (tools/ws2048_probe.py, round 5): the
# fused whole-solve program compiles and runs at every production secondary
# size — largest measured-good is channel/RB 1536x512 = 4*264*896 = 946,176
# padded quad plane cells — but at 2048^2 cavity (4*1032*1152 = 4,755,456
# cells, reachable only via the bf16 in-VMEM hierarchy; the f32 sizing
# VMEM-rejects first) the axon `tpu_compile_helper` subprocess crashes
# (HTTP 500, exit 1) — the same toolchain failure that caps whole_step at
# 512^2 (kernels/whole_step.py). The boundary between 946k and 4.76M cells
# is unprobed and no bench size sits there; enforce the measured-good
# maximum. Interpret mode has no toolchain and no ceiling;
# CFD_TPU_WHOLE_SOLVE_NO_CEILING=1 bypasses the check when the toolchain
# moves (re-probe with tools/ws2048_probe.py).
WHOLE_SOLVE_MAX_PADDED_CELLS = 946_176


def _solve_from_ctx(ctx, cfg: MGConfig, what: str, interpret: bool):
    """Wrap a vcycle context into the single-call solve: (p4, b4, tol) ->
    (p4, (cycles, res))."""
    import os

    consts, est_fixed, plane_shape, make_vcycle = ctx
    padded_cells = 4 * plane_shape[0] * plane_shape[1]
    if (not interpret and padded_cells > WHOLE_SOLVE_MAX_PADDED_CELLS
            and not os.environ.get("CFD_TPU_WHOLE_SOLVE_NO_CEILING")):
        raise ValueError(
            f"whole_solve at {what} has {padded_cells} padded quad plane "
            f"cells > the probed toolchain ceiling "
            f"{WHOLE_SOLVE_MAX_PADDED_CELLS} (the fused program crashes the "
            "TPU compile helper at 2048^2, tools/ws2048_probe.py) — use the "
            "per-kernel quad path, or set CFD_TPU_WHOLE_SOLVE_NO_CEILING=1 "
            "after re-probing")
    # VMEM estimate: finest quad p (in + carry + out) and b + the context's
    # fixed footprint (coarse levels + constants), lane padding accounted.
    qfield = 4 * _ref_bytes(plane_shape)
    alias_p = cfg.coarse_dtype is not None
    if alias_p:
        # bf16-hierarchy composition (the 2048^2 headline): the warm-start
        # input aliases the output (3 resident quad fields: p_io, b, loop
        # carry) and the budget uses an absolute temporaries allowance —
        # max over program points of transient f32 arithmetic (level-1
        # temporaries <= 0.75 qfield vs finest smoothing temporaries
        # ~0.8 qfield: sequential, never coexist) + ~12 MB Mosaic stack —
        # instead of the blanket 1.5x factor, which would reject a
        # composition whose itemized footprint fits. The admitting
        # arithmetic is validated on-chip by tools/ws2048_probe.py.
        est = 3 * qfield + est_fixed
        vmem_limit = min(int(est + 1.2 * qfield + 12e6), int(117e6))
        if est + 0.8 * qfield + 12e6 > 117e6:
            raise ValueError(
                f"whole-solve VMEM estimate {est / 1e6:.0f} MB (+ transient"
                f" allowance) too large for {what} even with the bf16 "
                "hierarchy — use the per-kernel quad path")
    else:
        est = 4 * qfield + est_fixed
        vmem_limit = int(1.5 * est + 20e6)
        if vmem_limit > 115e6:
            raise ValueError(
                f"whole-solve VMEM estimate {est / 1e6:.0f} MB too large for "
                f"{what} — use the per-kernel quad path")
    max_cycles = int(cfg.max_cycles)
    stall_ratio = float(cfg.stall_ratio)

    def kernel(p_ref, b_ref, tol_ref, *refs):
        cref = refs[:-2]
        out_ref, sref = refs[-2], refs[-1]
        b = [b_ref[q] for q in range(4)]
        vcycle = make_vcycle(lambda i: cref[i][...], b)
        p, cycles, res = tolerance_loop(
            tuple(p_ref[q] for q in range(4)), vcycle, tol_ref[0],
            max_cycles, stall_ratio)
        for q in range(4):
            out_ref[q] = p[q]
        sref[0, 0] = cycles.astype(jnp.float32)
        sref[0, 1] = res

    call = _whole_call(kernel, len(consts), plane_shape, vmem_limit,
                       interpret, alias_p=alias_p)
    return _make_solve(call, consts, cfg)


def make_quad_whole_solve(shape, problem: PoissonProblem, cfg: MGConfig,
                          pin_mean: bool = False,
                          n_interior: int | None = None,
                          interpret: bool = False):
    """Returns ``solve(p4_warm, b4, max_b=None) -> (p4, cycles, res)`` with
    the quad-layout multigrid solve contract of
    ``make_multigrid_poisson(..., quad_level0=...)`` — in ONE Pallas call.

    Raises ValueError when the hierarchy's total VMEM footprint exceeds the
    per-kernel cap (use the per-kernel path at such sizes) or when the
    aligned level-1 shape does not coincide with the quad plane shape.
    """
    ctx = separable_vcycle_ctx(shape, problem, cfg, pin_mean=pin_mean,
                               n_interior=n_interior)
    return _solve_from_ctx(ctx, cfg, str(shape), interpret)


def auto_whole_solve(mg: MGConfig, mg_overrides, interp: bool, build,
                     fallback, build_reduced=None):
    """Round-3 measured default policy for the f32 quad factories: the
    whole-solve kernel wins wherever the hierarchy fits in VMEM
    (BASELINE.md round-3 table — step 2048x256: 2715 vs 2248 steps/s,
    RB 1536x512: 2771 vs 2356, channel 1536x512: 3390 vs 3142), so it is
    the DEFAULT on the real-TPU path.  Explicitly overriding any fusion
    knob (whole_solve / whole_step / tail_from) takes manual control;
    build-time rejections (VMEM cap at e.g. 2048^2 cavity, too-shallow
    hierarchy, quad-shape mismatch) fall back to the per-kernel path.
    Interpret mode keeps the per-kernel default (an in-kernel
    while_loop of V-cycles is pathologically slow to interpret).

    ``build`` / ``fallback`` are thunks returning the solve callable.
    ``build_reduced`` (optional): a second fused build tried when
    ``build`` VMEM-rejects — the bf16-hierarchy whole-solve, whose
    halved in-VMEM footprint admits sizes the f32 hierarchy cannot
    (the 2048^2 cavity headline; VERDICT round-4 item 1). Only the
    fully-auto path reaches it, mirroring auto_bf16_coarse.
    Returns ``(solve, mg)`` with ``mg.whole_solve`` (and, when the
    reduced build is chosen, ``mg.coarse_dtype``) reflecting the
    chosen path."""
    import dataclasses as _dc

    if mg.whole_solve:
        return build(), mg
    manual = bool(mg_overrides) and any(
        k in mg_overrides
        for k in ("whole_solve", "whole_step", "tail_from", "coarse_dtype"))
    if interp or manual or mg.whole_step or mg.tail_from is not None:
        return fallback(), mg
    try:
        solve = build()
    except ValueError:
        if build_reduced is not None:
            try:
                solve = build_reduced()
            except ValueError:
                return fallback(), mg
            return solve, _dc.replace(mg, whole_solve=True,
                                      coarse_dtype="bfloat16")
        return fallback(), mg
    return solve, _dc.replace(mg, whole_solve=True)


def make_quad_step_whole_solve(grid, coeffs, cfg: MGConfig,
                               interpret: bool = False):
    """The MASKED (backwards-step) whole-solve: the exact quad fine level,
    the full-2D-weight coarse hierarchy and the tolerance loop in ONE
    Pallas call — the fused twin of
    poisson.multigrid.make_masked_quad_multigrid_poisson with the same
    ``solve(p4_warm, b4, max_b=None) -> (p4, cycles, res)`` contract
    (see masked_vcycle_ctx; equivalence asserted in
    tests/test_whole_solve.py)."""
    ctx = masked_vcycle_ctx(grid, coeffs, cfg)
    return _solve_from_ctx(ctx, cfg, str(grid.shape), interpret)
