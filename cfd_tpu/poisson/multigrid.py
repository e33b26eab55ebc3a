"""Geometric multigrid pressure-Poisson solver.

The reference's own TODO list names "switch to multigrid Poisson" as the
scaling fix for SOR's O(N) iteration growth (README.md:39); this module is
that solver, built TPU-first: every smoothing sweep, restriction,
prolongation and residual is a whole-array fused VPU pass, the V-cycle is a
static unrolled loop over levels (compile-time level count), and the outer
tolerance loop is a device-resident ``lax.while_loop`` — one XLA program per
solve, no host syncs.

Unified operator
----------------
All three reference Poisson flavors are instances of one weighted 5-point
operator on the padded grid (ghost ring identically zero):

    A(p) = idx2*(wE*(pE - p) + wW*(pW - p)) + idy2*(wN*(pN - p) + wS*(pS - p))

* Neumann side (wall/inlet ghosts copying the interior,
  channel-01.cpp:531-541): coupling weight w = 0.
* Dirichlet-0 side (channel outlet ghost column pinned to the reference
  pressure 0, channel-01.cpp:535): w = 1 with the neighbor read from the
  zero ghost.
* The cavity's ``eps_s = 1`` quirk (cavity-01.cpp:647) — every interior cell
  counts a south neighbor, so the bottom row couples to the zero ghost — is
  just wS = 1 at j = 1.
* Fluid-fluid interior couplings: w = 1.

Coarsening rediscretizes the same weights: an interface coupling on the
coarse grid is the average of the two fine couplings it covers, which
preserves the boundary encoding on every level.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from cfd_tpu.ops.stencil import _sh


@dataclasses.dataclass(frozen=True)
class PoissonProblem:
    """Host-side spec of one weighted-Poisson level."""

    nx: int
    ny: int
    dx: float
    dy: float
    wE: np.ndarray  # (ny+2, nx+2) float; coupling weights, 0 outside interior
    wW: np.ndarray
    wN: np.ndarray
    wS: np.ndarray

    @property
    def shape(self) -> tuple[int, int]:
        return (self.ny + 2, self.nx + 2)


def mg_compatible(nx: int, ny: int, min_coarse: int = 4) -> bool:
    """True when at least one factor-2 coarsening is possible."""
    return nx % 2 == 0 and ny % 2 == 0 and nx // 2 >= min_coarse and ny // 2 >= min_coarse


def _interior_mask(nx: int, ny: int) -> np.ndarray:
    m = np.zeros((ny + 2, nx + 2), dtype=bool)
    m[1 : ny + 1, 1 : nx + 1] = True
    return m


def cavity_problem(nx: int, ny: int, dx: float, dy: float) -> PoissonProblem:
    """The cavity flavor: Neumann sides except the always-on south coupling
    (cavity-01.cpp:644-647)."""
    jj = np.arange(ny + 2)[:, None]
    ii = np.arange(nx + 2)[None, :]
    interior = _interior_mask(nx, ny)
    wE = ((ii < nx) & interior).astype(np.float64)
    wW = ((ii > 1) & interior).astype(np.float64)
    wN = ((jj < ny) & interior).astype(np.float64)
    wS = interior.astype(np.float64)  # reference quirk: couples j=1 to 0-ghost
    return PoissonProblem(nx, ny, dx, dy, wE, wW, wN, wS)


def neumann_problem(nx: int, ny: int, dx: float, dy: float) -> PoissonProblem:
    """Pure-Neumann box (use with mean-pinning / mean-removed sources)."""
    jj = np.arange(ny + 2)[:, None]
    ii = np.arange(nx + 2)[None, :]
    interior = _interior_mask(nx, ny)
    wE = ((ii < nx) & interior).astype(np.float64)
    wW = ((ii > 1) & interior).astype(np.float64)
    wN = ((jj < ny) & interior).astype(np.float64)
    wS = ((jj > 1) & interior).astype(np.float64)
    return PoissonProblem(nx, ny, dx, dy, wE, wW, wN, wS)


def channel_problem(nx: int, ny: int, dx: float, dy: float) -> PoissonProblem:
    """Channel flavor: inlet/walls Neumann, outlet Dirichlet-0 through the
    ghost column (channel-01.cpp:531-541)."""
    p = neumann_problem(nx, ny, dx, dy)
    wE = p.wE.copy()
    wE[1 : ny + 1, nx] = 1.0  # outlet column couples to the 0-pinned ghost
    return dataclasses.replace(p, wE=wE)


@dataclasses.dataclass(frozen=True)
class _Level:
    """Device-side constants for one level (jnp arrays, closed over by jit).

    HBM-bandwidth design: for separable (rectangle) problems the coupling
    weights are stored as broadcastable 1D vectors — wE/wW as (1, nx+2),
    wN/wS as (ny+2, 1) — and the diagonal, interior mask and red/black
    parity are (re)computed inline from iotas. A smoothing half-sweep then
    streams only p and b from HBM instead of p, b, four full-size weight
    arrays, the inverse diagonal and a parity mask (~3x less traffic on the
    dominant cost of the whole solver). Non-separable (masked-geometry)
    problems fall back to full 2D weights.
    """

    wE: jnp.ndarray
    wW: jnp.ndarray
    wN: jnp.ndarray
    wS: jnp.ndarray
    idx2: float
    idy2: float
    shape: tuple[int, int]
    separable: bool
    # interior dims — equal to shape-2 for regular levels; smaller for a
    # Mosaic-ALIGNED level whose arrays carry dead zero rows/columns beyond
    # the logical padded grid (see make_multigrid_poisson aligned_io)
    ny: int = -1
    nx: int = -1


def _round_up8_128(shape: tuple[int, int], dtype=None) -> tuple[int, int]:
    """Mosaic-aligned dims: sublane multiple 8 (f32) or 16 (2-byte dtypes
    — bf16 native tiles are (16, 128)), lane multiple 128."""
    H, W = shape
    g = 16 if dtype is not None and np.dtype(dtype).itemsize == 2 else 8
    return (-(-H // g) * g, -(-W // 128) * 128)


def _is_separable(p: PoissonProblem) -> bool:
    """True when every weight is constant along the non-edge axis over the
    interior (all rectangle problems and their coarsenings)."""
    inter = np.s_[1 : p.ny + 1, 1 : p.nx + 1]

    def rows_equal(w):  # w[j, i] independent of j on the interior
        return bool((w[inter] == w[inter][0:1, :]).all())

    def cols_equal(w):
        return bool((w[inter] == w[inter][:, 0:1]).all())

    return (rows_equal(p.wE) and rows_equal(p.wW)
            and cols_equal(p.wN) and cols_equal(p.wS))


def _build_level(p: PoissonProblem, dtype, aligned: bool = False,
                 allow_full: bool = False) -> _Level:
    """``aligned``: carry the level's arrays in the Mosaic-aligned layout
    (shape rounded up to 8x128 with zero weights beyond the logical grid).
    Non-separable problems (masked geometry) require ``allow_full``: their
    2D weight arrays are zero-padded to the aligned shape."""
    idx2 = 1.0 / (p.dx * p.dx)
    idy2 = 1.0 / (p.dy * p.dy)
    H, W = (p.ny + 2, p.nx + 2)
    if aligned:
        if not _is_separable(p):
            if not allow_full:
                raise ValueError("aligned levels require separable weights")
            Ha, Wa = _round_up8_128((H, W), dtype)
            pad = lambda w: np.pad(w, ((0, Ha - H), (0, Wa - W)))
            return _Level(
                wE=jnp.asarray(pad(p.wE), dtype),
                wW=jnp.asarray(pad(p.wW), dtype),
                wN=jnp.asarray(pad(p.wN), dtype),
                wS=jnp.asarray(pad(p.wS), dtype),
                idx2=idx2, idy2=idy2, shape=(Ha, Wa), separable=False,
                ny=p.ny, nx=p.nx,
            )
        H, W = _round_up8_128((H, W), dtype)
    if _is_separable(p):
        wE = np.zeros((1, W))
        wE[0, 1 : p.nx + 1] = p.wE[1, 1 : p.nx + 1]
        wW = np.zeros((1, W))
        wW[0, 1 : p.nx + 1] = p.wW[1, 1 : p.nx + 1]
        wN = np.zeros((H, 1))
        wN[1 : p.ny + 1, 0] = p.wN[1 : p.ny + 1, 1]
        wS = np.zeros((H, 1))
        wS[1 : p.ny + 1, 0] = p.wS[1 : p.ny + 1, 1]
        sep = True
    else:
        wE, wW, wN, wS = p.wE, p.wW, p.wN, p.wS
        sep = False
    return _Level(
        wE=jnp.asarray(wE, dtype), wW=jnp.asarray(wW, dtype),
        wN=jnp.asarray(wN, dtype), wS=jnp.asarray(wS, dtype),
        idx2=idx2, idy2=idy2, shape=(H, W), separable=sep,
        ny=p.ny, nx=p.nx,
    )


def _inline_masks(level: _Level):
    """(interior, red, black) from iotas — fused by XLA, zero HBM traffic."""
    ny = level.ny if level.ny >= 0 else level.shape[0] - 2
    nx = level.nx if level.nx >= 0 else level.shape[1] - 2
    jj = jax.lax.broadcasted_iota(jnp.int32, level.shape, 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, level.shape, 1)
    interior = (jj >= 1) & (jj <= ny) & (ii >= 1) & (ii <= nx)
    if not level.separable:
        denom = (level.idx2 * (level.wE + level.wW)
                 + level.idy2 * (level.wN + level.wS))
        interior = interior & (denom > 0)
    even = ((jj + ii) % 2) == 0
    return interior, interior & even, interior & ~even


def _inv_diag(level: _Level, interior):
    denom = (level.idx2 * (level.wE + level.wW)
             + level.idy2 * (level.wN + level.wS))
    denom = jnp.broadcast_to(denom, level.shape)
    return jnp.where(interior, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)


def coarsen_problem(p: PoissonProblem) -> PoissonProblem:
    """Factor-2 coarsening with interface-averaged couplings.

    A coarse east coupling spans the two fine east interfaces of the right
    column of the 2x2 block; averaging the fine weights preserves
    Neumann (0), Dirichlet (1) and fractional masked couplings.
    """
    assert p.nx % 2 == 0 and p.ny % 2 == 0
    nx, ny = p.nx // 2, p.ny // 2

    def block(a: np.ndarray) -> np.ndarray:
        """(ny, 2, nx, 2): [J, j_child, I, i_child] over the fine interior."""
        return a[1 : p.ny + 1, 1 : p.nx + 1].reshape(ny, 2, nx, 2)

    def pad(interior: np.ndarray) -> np.ndarray:
        w = np.zeros((ny + 2, nx + 2))
        w[1 : ny + 1, 1 : nx + 1] = interior
        return w

    # A coarse E/W coupling spans the two fine interfaces of the right/left
    # child column (averaged over the j-children); N/S analogously.
    wE = pad(block(p.wE)[:, :, :, 1].mean(axis=1))
    wW = pad(block(p.wW)[:, :, :, 0].mean(axis=1))
    wN = pad(block(p.wN)[:, 1, :, :].mean(axis=-1))
    wS = pad(block(p.wS)[:, 0, :, :].mean(axis=-1))

    # Domain-edge Dirichlet couplings pin the value at a ghost CENTER of the
    # finer grid — a fixed physical location. Plain averaging would re-anchor
    # the pin at the coarse ghost center, weakening it each level; that
    # inconsistency makes the smooth (near-nullspace) mode's coarse
    # correction wrong by an O(1) factor and the V-cycle convergence factor
    # roughly doubles per level (measured: 0.23 -> 0.46 -> divergence).
    # Consistency: a coupling w at spacing H encodes pin distance d = H/w;
    # the coarse center sits H/2 further away, so
    #   w_c = (2H) / (d + H/2) = 4 w / (2 + w),
    # which maps 1 -> 4/3 -> 8/5 -> ... (and fixes 0 = Neumann).
    def edge_fix(w):
        return 4.0 * w / (2.0 + w)

    wS[1, 1 : nx + 1] = edge_fix(wS[1, 1 : nx + 1])
    wN[ny, 1 : nx + 1] = edge_fix(wN[ny, 1 : nx + 1])
    wW[1 : ny + 1, 1] = edge_fix(wW[1 : ny + 1, 1])
    wE[1 : ny + 1, nx] = edge_fix(wE[1 : ny + 1, nx])
    return PoissonProblem(nx, ny, p.dx * 2, p.dy * 2, wE, wW, wN, wS)


def _smooth(level: _Level, p, b, omega, parity_mask, inv_diag):
    pE, pW = _sh(p, 0, 1), _sh(p, 0, -1)
    pN, pS = _sh(p, 1, 0), _sh(p, -1, 0)
    gs = (level.idx2 * (level.wE * pE + level.wW * pW)
          + level.idy2 * (level.wN * pN + level.wS * pS) - b) * inv_diag
    upd = p + omega * (gs - p)
    return jnp.where(parity_mask, upd.astype(p.dtype), p)


def _apply(level: _Level, p, interior=None):
    if interior is None:
        interior, _, _ = _inline_masks(level)
    pE, pW = _sh(p, 0, 1), _sh(p, 0, -1)
    pN, pS = _sh(p, 1, 0), _sh(p, -1, 0)
    a = (level.idx2 * (level.wE * (pE - p) + level.wW * (pW - p))
         + level.idy2 * (level.wN * (pN - p) + level.wS * (pS - p)))
    return jnp.where(interior, a, jnp.zeros_like(a))


def _residual(level: _Level, p, b, interior=None):
    if interior is None:
        interior, _, _ = _inline_masks(level)
    return jnp.where(interior, b - _apply(level, p, interior), jnp.zeros_like(b))


def _restrict(fine: _Level, coarse: _Level, r):
    """Full-weighting: coarse cell value = mean of its 4 fine children.

    Implemented with ``lax.reduce_window`` (native TPU windowed reduction):
    the obvious ``reshape(ny_c, 2, nx_c, 2).mean((1, 3))`` forces a layout
    change on the offset-sliced operand that costs ~3 ms per call at 2048^2
    inside the compiled V-cycle (profiled: the single most expensive op in
    the whole solver), vs ~0.02 ms for the windowed form."""
    ny_f = fine.ny if fine.ny >= 0 else fine.shape[0] - 2
    nx_f = fine.nx if fine.nx >= 0 else fine.shape[1] - 2
    ny_c = coarse.ny if coarse.ny >= 0 else coarse.shape[0] - 2
    nx_c = coarse.nx if coarse.nx >= 0 else coarse.shape[1] - 2
    inner = r[1 : ny_f + 1, 1 : nx_f + 1]
    rc = jax.lax.reduce_window(inner, jnp.zeros((), r.dtype), jax.lax.add,
                               (2, 2), (2, 2), "VALID") * 0.25
    out = jnp.zeros(coarse.shape, dtype=r.dtype)
    return out.at[1 : ny_c + 1, 1 : nx_c + 1].set(rc)


def _solid_fill(coarse: _Level, e):
    """Neumann-extend the coarse correction into solid cells before
    prolongation (masked hierarchies only): replace each solid interior
    cell's value with the average of its FLUID 4-neighbors.

    Without this, the mask-blind bilinear stencil below interpolates
    wall-adjacent fine fluid children from solid coarse cells whose
    correction is identically 0 (the smoother masks them out), damping the
    near-wall correction by up to 4/16 every level.  That under-correction
    compounds per level and was THE barely-contracting masked mode
    (BASELINE.md round-4 step rows): measured V(1,2) factors at 256x32
    go 0.47-oscillating -> 0.31-monotone with the fill (V(2,2): 0.36 ->
    0.21).  The fill mirrors the exact fine operator's own ghost
    semantics — solid-cell pressure = average of fluid neighbors
    (/root/reference/backwards_step-01.cpp:708-739) — so the two
    operators of the defect correction finally agree about what a
    correction means next to a wall."""
    ny = coarse.ny if coarse.ny >= 0 else coarse.shape[0] - 2
    nx = coarse.nx if coarse.nx >= 0 else coarse.shape[1] - 2
    jj = jax.lax.broadcasted_iota(jnp.int32, coarse.shape, 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, coarse.shape, 1)
    geom = (jj >= 1) & (jj <= ny) & (ii >= 1) & (ii <= nx)
    denom = (coarse.idx2 * (coarse.wE + coarse.wW)
             + coarse.idy2 * (coarse.wN + coarse.wS))
    fluid = geom & (jnp.broadcast_to(denom, coarse.shape) > 0)
    f = fluid.astype(e.dtype)
    ef = e * f
    num = _sh(ef, 0, 1) + _sh(ef, 0, -1) + _sh(ef, 1, 0) + _sh(ef, -1, 0)
    den = _sh(f, 0, 1) + _sh(f, 0, -1) + _sh(f, 1, 0) + _sh(f, -1, 0)
    fill = num / jnp.maximum(den, jnp.ones_like(den))
    return jnp.where(geom & ~fluid & (den > 0), fill.astype(e.dtype), e)


def _prolong(coarse: _Level, fine: _Level, e):
    """Bilinear (cell-centered 9-3-3-1) interpolation of the coarse
    correction. Piecewise-constant transfer violates the transfer-order rule
    (prolongation+restriction order must exceed the PDE order) and caps the
    V-cycle at ~0.86/cycle; bilinear restores mesh-independent rates.
    Boundary ghosts are edge-extrapolated (Neumann in the correction), which
    post-smoothing localizes to O(h) boundary error per cycle.  Masked
    (non-separable) hierarchies first Neumann-extend the correction into
    solid cells (see _solid_fill).

    Implementation note: the stack+reshape interleave below costs ~105 us of
    layout copies per call at 2048^2, but it is the best known lowering —
    the transposed-conv formulation (``lhs_dilation=2``, separable
    [1,3,3,1]/4 x [1,3,3,1]/4 kernel) is mathematically identical yet
    lowers catastrophically on this TPU (measured 14 steps/s vs 745 for the
    whole solver), and a plain reshape-to-(ny_c,2,nx_c,2) costs ~3 ms."""
    if not coarse.separable:
        e = _solid_fill(coarse, e)
    ny_c = coarse.ny if coarse.ny >= 0 else coarse.shape[0] - 2
    nx_c = coarse.nx if coarse.nx >= 0 else coarse.shape[1] - 2
    ny_f = fine.ny if fine.ny >= 0 else fine.shape[0] - 2
    nx_f = fine.nx if fine.nx >= 0 else fine.shape[1] - 2
    ce = jnp.pad(e[1 : ny_c + 1, 1 : nx_c + 1], 1, mode="edge")
    c = ce[1:-1, 1:-1]
    cw, ceast = ce[1:-1, :-2], ce[1:-1, 2:]
    cs, cn = ce[:-2, 1:-1], ce[2:, 1:-1]
    csw, cse = ce[:-2, :-2], ce[:-2, 2:]
    cnw, cne = ce[2:, :-2], ce[2:, 2:]
    k = 1.0 / 16.0
    c00 = k * (9 * c + 3 * cw + 3 * cs + csw)  # child (j-lo, i-lo)
    c01 = k * (9 * c + 3 * ceast + 3 * cs + cse)
    c10 = k * (9 * c + 3 * cw + 3 * cn + cnw)
    c11 = k * (9 * c + 3 * ceast + 3 * cn + cne)
    bottom = jnp.stack([c00, c01], axis=-1).reshape(ny_c, nx_f)
    top = jnp.stack([c10, c11], axis=-1).reshape(ny_c, nx_f)
    ef = jnp.stack([bottom, top], axis=1).reshape(ny_f, nx_f)
    out = jnp.zeros(fine.shape, dtype=e.dtype)
    out = out.at[1 : ny_f + 1, 1 : nx_f + 1].set(ef)
    interior, _, _ = _inline_masks(fine)
    return jnp.where(interior, out, jnp.zeros_like(out))


@dataclasses.dataclass(frozen=True)
class MGConfig:
    omega: float = 1.0  # smoother relaxation (GS); >1 can destabilize rb-MG
    pre_sweeps: int = 2  # red+black pairs before coarse correction
    post_sweeps: int = 2
    coarse_sweeps: int = 32
    max_cycles: int = 100
    tol_factor: float = 1e-9  # relative to max|b|
    abs_tol: float = 0.0
    min_coarse: int = 4  # stop coarsening when a side would drop below this
    pin_mean: bool = False  # subtract interior mean each cycle (pure Neumann)
    # Stop when a cycle no longer contracts the residual by at least this
    # factor — float32 runs hit the roundoff floor long before a
    # 1e-9-relative tolerance, and burning further cycles there is pure
    # waste.  At the floor the measured cycle-to-cycle ratios are >= 0.94
    # (channel 1536x512 f32: 1.00/1.06/0.94/0.97), while a MID-SOLVE
    # transient plateau can contract as slowly as 0.84 for one cycle and
    # then resume at ~0.3-0.5 (channel 1536x512 V(2,1), cycle 1->2 on the
    # sharp inlet-layer source).  The original 0.7 threshold mistook that
    # plateau for the floor, exited with the residual 7.5e4x tolerance,
    # and the un-projected velocity blew the simulation up within ~70
    # steps.  0.9 sits between the worst measured plateau (0.84) and the
    # floor band (>= 0.94).
    stall_ratio: float = 0.9
    # Fuse the entire V-cycle below this GLOBAL level index into one Pallas
    # call (kernels.mg_tail) — removes the per-level kernel launches and
    # XLA restrict/prolong glue that dominate coarse-level cost. None = off.
    # Honored by the f32 Pallas paths only (XLA/f64 paths ignore it).
    tail_from: int | None = None
    # Run the ENTIRE tolerance-driven solve as ONE Pallas call
    # (kernels.whole_solve) — requires the quad layout and the whole
    # hierarchy fitting in VMEM (secondary-case sizes). Supersedes
    # tail_from. Honored by the f32 quad paths only.
    whole_solve: bool = False
    # Fuse the whole TIME STEP into ONE Pallas call (kernels.whole_step):
    # the tentative-carry stage + source mean removal + the whole_solve
    # solve in a single kernel — 1 launch/step. Supersedes whole_solve.
    # Same VMEM/quad requirements; f32 quad paths only.
    whole_step: bool = False
    # Mixed-precision V-cycle: store the COARSE hierarchy (the restricted
    # residual, every level below the finest, and the prolonged correction)
    # in this dtype ("bfloat16") while the finest level, the outer residual
    # and the tolerance check stay float32 — the correction path tolerates
    # bf16's 8-bit mantissa because each cycle recomputes the true f32
    # residual (iterative-refinement structure: reduced precision perturbs
    # the CONTRACTION RATE, not the convergence floor). Halves the coarse
    # levels' HBM/VMEM bytes. Honored by (a) the per-kernel aligned/quad
    # f32 Pallas paths (bf16 HBM storage between kernels) and (b) the
    # FUSED whole_solve/whole_step kernels, separable AND masked, where it
    # halves the in-VMEM hierarchy instead (kernels/whole_solve.py
    # coarse_dt) — the margin that lets whole-solve build at the 2048^2
    # cavity headline size. Incompatible with tail_from (the tail keeps
    # its own f32 hierarchy), the per-kernel masked builder and the
    # sharded builders (loud errors). None = full precision.
    coarse_dtype: str | None = None
    # Residual-minimizing coarse-correction steplength for the masked
    # DEFECT-CORRECTION hierarchies (the backwards-step geometry): the
    # coarse operator there is a non-Galerkin approximation (Neumann-
    # through-solids weights, masked_channel_problem) of the exact fine
    # operator (backwards_step-01.cpp:685-739 ghost semantics), so the
    # correction returned for the seam equation A1 ec = rc has a
    # systematically wrong amplitude along the slowest error mode. Scaling
    # it by the 1-D line-search optimum
    #   alpha = <rc, A1 ec> / <A1 ec, A1 ec>
    # (minimizes ||rc - alpha A1 ec||_2 before prolongation) costs one
    # level-1 operator apply + two reductions per cycle and cannot move
    # the fixed point (the update is residual-driven: rc = 0 -> ec = 0).
    # Honored by every masked path — the XLA builder, the per-kernel quad
    # builder AND the fused masked whole_solve/whole_step kernels (the
    # production step size auto-fuses, so the knob must live in-kernel to
    # matter; kernels/whole_solve.py masked_vcycle_ctx). Separable
    # hierarchies (their coarsening is consistent, see coarsen_problem
    # edge_fix) and the sharded builders reject it loudly.
    corr_opt: bool = False


def normalize_coarse_dtype_optout(mg_overrides):
    """Normalize the explicit full-precision opt-out of the auto bf16
    coarse hierarchy: ``coarse_dtype='float32'/'f32'`` in mg_overrides
    means "keep f32" — strip the key (so it does not count as a manual
    fusion override for the auto_whole_solve policy) and report the
    opt-out. Returns ``(explicit_f32, stripped_overrides)``. Pure helper
    so the predicate is unit-testable off-TPU (tests/test_coarse_dtype.py)."""
    explicit_f32 = bool(
        mg_overrides
        and mg_overrides.get("coarse_dtype") in ("float32", "f32"))
    if explicit_f32:
        mg_overrides = {k: v for k, v in mg_overrides.items()
                        if k != "coarse_dtype"}
    return explicit_f32, mg_overrides


def auto_bf16_coarse(interp: bool, explicit_f32: bool, mg: "MGConfig",
                     mg_overrides) -> bool:
    """The fully-auto condition for flipping the per-kernel fallback's
    coarse hierarchy to bf16 (cases/cavity.py): real-TPU path only (the
    measured +5.3% at 2048^2 is a TPU number; interpret runs keep the
    reference-matching f32 ladder), no explicit opt-out, and no manual
    fusion/precision knob in mg_overrides — manual control keeps full
    precision exactly like auto_whole_solve's manual rule."""
    return (not interp and not explicit_f32
            and mg.coarse_dtype is None
            and mg.tail_from is None and not mg.whole_step
            and not (mg_overrides and any(
                k in mg_overrides for k in (
                    "whole_solve", "whole_step", "tail_from",
                    "coarse_dtype"))))


def _corr_alpha(level1: _Level, rc, ec):
    """Clamped line-search steplength for the coarse-grid correction
    (corr_opt). The raw optimum alpha = <rc, A1 ec>/<A1 ec, A1 ec> is
    measured at ~1.10-1.15 SUSTAINED on the step geometry (the coarse
    hierarchy systematically under-corrects by ~13%) — but on the first
    cycle of a solve the correction is only weakly aligned with rc under
    the level-1 operator (cos ~0.4, raw alpha ~0.2), and applying that
    tiny alpha wipes a correction whose unseen components were doing real
    work: the un-clamped search measured cascading NEGATIVE alphas and
    solves stall-exiting at 400-1000x the baseline floor. The [1.0, 1.5]
    clamp makes the anomalous cycles a no-op (alpha 1 = plain correction)
    while keeping the systematic over-relaxation where the search is
    trustworthy."""
    Aec = _apply(level1, ec)
    num = jnp.sum(rc * Aec)
    den = jnp.sum(Aec * Aec)
    raw = jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0),
                    jnp.ones_like(num))
    return jnp.clip(raw, 1.0, 1.5)


def _apply_np(p: PoissonProblem, x: np.ndarray) -> np.ndarray:
    """numpy twin of _apply for host-side dense-matrix probing."""
    idx2, idy2 = 1.0 / (p.dx * p.dx), 1.0 / (p.dy * p.dy)
    xE = np.roll(x, -1, axis=1)
    xW = np.roll(x, 1, axis=1)
    xN = np.roll(x, -1, axis=0)
    xS = np.roll(x, 1, axis=0)
    a = idx2 * (p.wE * (xE - x) + p.wW * (xW - x)) + idy2 * (p.wN * (xN - x) + p.wS * (xS - x))
    m = _interior_mask(p.nx, p.ny)
    return np.where(m, a, 0.0)


def _dense_pinv(p: PoissonProblem) -> np.ndarray:
    """Pseudo-inverse of the coarsest operator over interior cells.

    The weighted cavity/Neumann operators are nearly (or exactly) singular —
    the near-constant mode makes iterative coarse solves arbitrarily slow,
    which is the classic V-cycle killer. The coarsest grid is tiny
    (<= min_coarse^2-ish cells), so an exact solve is one small matmul:
    TPU-cheap and nullspace-safe via pinv."""
    n = p.nx * p.ny
    A = np.zeros((n, n))
    for k in range(n):
        e = np.zeros((p.ny + 2, p.nx + 2))
        e[1 + k // p.nx, 1 + k % p.nx] = 1.0
        A[:, k] = _apply_np(p, e)[1 : p.ny + 1, 1 : p.nx + 1].ravel()
    return np.linalg.pinv(A, rcond=1e-12)


def build_hierarchy(problem: PoissonProblem, cfg: MGConfig, dtype=jnp.float32
                    ) -> tuple[list[_Level], jnp.ndarray]:
    """Returns (levels, coarsest pseudo-inverse)."""
    probs = [problem]
    while (probs[-1].nx % 2 == 0 and probs[-1].ny % 2 == 0
           and probs[-1].nx // 2 >= cfg.min_coarse and probs[-1].ny // 2 >= cfg.min_coarse):
        probs.append(coarsen_problem(probs[-1]))
    pinv = jnp.asarray(_dense_pinv(probs[-1]), dtype)
    return [_build_level(p, dtype) for p in probs], pinv


def make_multigrid_poisson(
    problem: PoissonProblem,
    cfg: MGConfig,
    dtype=jnp.float32,
    n_interior: int | None = None,
    exact_level0: tuple[Callable, Callable] | None = None,
    exact_level0_fused: tuple[Callable, Callable] | None = None,
    use_pallas: bool | str = "auto",
    aligned_io: bool = False,
    pallas_interpret: bool = False,
    quad_level0: tuple[Callable, Callable] | None = None,
    quad_first_rc: bool = False,
) -> Callable[[jnp.ndarray, jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Returns solve(p_warm, b) -> (p, cycles, residual_inf).

    ``quad_first_rc`` (requires ``quad_level0``, pin_mean=False): the
    caller's fused carry kernel already ran the FIRST cycle's pre-smooth +
    residual + restriction (kernels.quad
    make_quad_corr_predictor_source_fused_pre); solve's signature becomes
    ``solve(p1, b, rc0, max_b=None)`` and the tolerance loop's first
    iteration starts at the coarse stage with ``rc0`` (cycles >= 2 use the
    regular pre kernel).

    ``aligned_io``: solve() takes/returns the finest-level arrays in the
    Mosaic-aligned layout (round_up(ny+2,8) x round_up(nx+2,128), zeros
    beyond the logical grid) so a caller that keeps the whole flow state
    aligned pays no per-call pad/slice layout copies. Requires the Pallas
    smoother path (separable problem, no exact_level0, no pin_mean);
    ``pallas_interpret`` runs the kernels in interpreter mode (CPU tests).

    Matches the SOR solver call contract in cfd_tpu.poisson.sor so cases can
    swap solvers freely. ``cycles`` counts V-cycles (not sweeps).

    ``exact_level0``: optional (smooth_pairs(p, b, n), residual(p, b))
    overrides for the finest level — the defect-correction pattern used by
    the masked-geometry solver: the fine level smooths and measures
    convergence with the EXACT operator (ghost refresh incl. solid-cell
    averaging), while the coarse hierarchy uses the weighted approximation
    (Neumann through solids). Fixed point = exact solution, since the update
    is residual-driven.

    ``exact_level0_fused``: optional (pre_field(p, b) -> (p, r_field),
    post_res(p, b) -> (p, res_inf)) Pallas fusions of the exact level-0
    pre-smooth+restriction-input and post-smooth+tolerance-check (e.g.
    kernels.step_smoother for the reference step geometry); they take the
    place of the separable path's fused kernels under exact_level0.

    ``use_pallas``: fuse each pre/post smoothing block into one Pallas
    kernel per level (kernels.rb_smoother) — measured 2x the XLA path per
    pair at 2048^2. "auto" enables it for float32 separable problems on a
    TPU backend; it is bitwise-identical to the XLA path.

    ``quad_level0``: optional (pre(p4, b4) -> (p4, rc),
    post(p4, b4, ec) -> (p4, res_inf)) — the finest level lives in the
    2x2 block-parity layout (kernels.quad) and solve() takes/returns p in
    that (4, Hq8, Wqa) shape. pre fuses smooth+residual+restriction, post
    fuses prolongation+smooth+tolerance residual; coarse levels run the
    standard aligned Pallas path (their shapes coincide with the quad
    plane shape for a factor-2 coarsening). Requires aligned_io.
    """
    levels, coarse_pinv = build_hierarchy(problem, cfg, dtype)
    n_int = n_interior or (problem.nx * problem.ny)
    bot = levels[-1]
    bot_ny, bot_nx = bot.shape[0] - 2, bot.shape[1] - 2

    if use_pallas == "auto":
        # the platform computations actually land on: jax_default_device wins
        # over the default backend (tests pin it to host CPU while the axon
        # TPU plugin stays the default backend)
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        use_pallas = (np.dtype(dtype) == np.float32
                      and platform == "tpu"
                      and all(lv.separable for lv in levels))
    # pin_mean composes with the fused-residual (aligned/quad) paths only
    # for a PURE-Neumann operator: there the constant is exactly the
    # nullspace, A(p - mean) == A(p) on the interior, and the residual max
    # fused into the post-smooth kernel stays valid after the mean shift.
    # (The cavity flavor's eps_s quirk couples row 1 to the zero ghost, so
    # its residual is NOT shift-invariant — but it never uses pin_mean.)
    ones_int = _interior_mask(problem.nx, problem.ny).astype(np.float64)
    pure_neumann = float(np.abs(_apply_np(problem, ones_int)).max()) == 0.0
    # Mixed-precision coarse hierarchy (MGConfig.coarse_dtype): the
    # correction path (rc, every coarse level, ec) stored reduced-precision
    # while level 0 and the tolerance residual stay f32 — see the MGConfig
    # field docstring for why this cannot move the convergence floor.
    coarse_dt = None
    if cfg.coarse_dtype is not None:
        if cfg.coarse_dtype not in ("bfloat16", "bf16"):
            raise ValueError(f"unsupported coarse_dtype {cfg.coarse_dtype!r}"
                             " (only 'bfloat16')")
        if np.dtype(dtype) != np.float32:
            raise ValueError("coarse_dtype requires a float32 solve (f64 is"
                             " the validation path and stays full precision)")
        if not aligned_io:
            raise ValueError("coarse_dtype requires the aligned/quad f32 "
                             "Pallas path (aligned_io=True)")
        if cfg.tail_from is not None:
            raise ValueError("coarse_dtype is incompatible with the fused "
                             "coarse tail (tail_from) — the tail keeps its "
                             "own in-VMEM f32 hierarchy")
        coarse_dt = jnp.bfloat16
    if cfg.corr_opt and exact_level0 is None:
        raise ValueError("corr_opt is a masked defect-correction knob — "
                         "separable hierarchies coarsen consistently "
                         "(coarsen_problem edge_fix) and do not take it")
    if aligned_io:
        if (not use_pallas or exact_level0 is not None
                or (cfg.pin_mean and not pure_neumann)):
            raise ValueError("aligned_io requires the plain Pallas-smoothed "
                             "separable path (pin_mean only for pure-Neumann"
                             " problems)")
        # rebuild EVERY level aligned: all transfers and smoothers then run
        # on aligned arrays with no pad/slice layout copies anywhere in the
        # V-cycle (the small-level size increase is negligible). Coarse
        # levels rebuild in coarse_dt when set (16-row sublane alignment).
        probs = [problem]
        while len(probs) < len(levels):
            probs.append(coarsen_problem(probs[-1]))
        levels = [_build_level(p, dtype if k == 0 else (coarse_dt or dtype),
                               aligned=True) for k, p in enumerate(probs)]
        bot = levels[-1]
        bot_ny, bot_nx = bot.ny, bot.nx
    if quad_level0 is not None and not aligned_io:
        raise ValueError("quad_level0 requires aligned_io coarse levels")
    # fused-coarse-tail activation decided up front so the per-level
    # smoother closures below are only built for levels the vcycle can
    # actually reach (k < tail_from)
    tail_from = None
    if (cfg.tail_from is not None and use_pallas
            and 1 <= cfg.tail_from <= len(levels) - 2):
        tail_from = cfg.tail_from
    reachable = len(levels) if tail_from is None else tail_from
    pallas_pairs = {}
    pallas_post0_res = None
    if use_pallas:
        from cfd_tpu.kernels.rb_smoother import rb_pairs_for_level

        for k, lv in enumerate(levels[:reachable]):
            if k == 0 and quad_level0 is not None:
                continue  # finest level runs the fused quad kernels
            pallas_pairs[k] = {
                n: rb_pairs_for_level(lv, cfg.omega, n,
                                      interpret=pallas_interpret,
                                      aligned_io=aligned_io,
                                      dtype=(coarse_dt or jnp.float32)
                                      if k > 0 else jnp.float32)
                for n in {cfg.pre_sweeps, cfg.post_sweeps}
            }
        if exact_level0 is None and quad_level0 is None and (
                not cfg.pin_mean or pure_neumann):
            # fold the tolerance-check residual into the level-0 post-smooth
            # kernel (saves a full HBM pass + reduce per cycle; with
            # pin_mean the fused value is valid exactly when the constant is
            # the nullspace — the pure_neumann check above)
            pallas_post0_res = rb_pairs_for_level(
                levels[0], cfg.omega, cfg.post_sweeps, with_residual=True,
                interpret=pallas_interpret, aligned_io=aligned_io)
    pallas_pre0_field = None
    if use_pallas and exact_level0 is None and quad_level0 is None:
        # pre-smooth + signed residual FIELD in one kernel: the V-cycle's
        # restriction input without a separate whole-array XLA residual pass
        pallas_pre0_field = rb_pairs_for_level(
            levels[0], cfg.omega, cfg.pre_sweeps, with_residual_field=True,
            interpret=pallas_interpret, aligned_io=aligned_io)
    # same fusion for every COARSE level's pre-smooth (k >= 1): one kernel
    # per level replaces smooth_pair + the whole-array XLA residual pass
    pallas_pre_field = {}
    if use_pallas:
        for k in range(1, min(reachable, len(levels) - 1)):
            pallas_pre_field[k] = rb_pairs_for_level(
                levels[k], cfg.omega, cfg.pre_sweeps,
                with_residual_field=True, interpret=pallas_interpret,
                aligned_io=aligned_io, dtype=coarse_dt or jnp.float32)
    # fused coarse tail: ONE kernel for every level >= tail_from (launch/
    # glue-bound region; see kernels.mg_tail). Same math as the recursion
    # it replaces up to f32 contraction order in the transfer matmuls.
    fused_tail = None
    if tail_from is not None:
        from cfd_tpu.kernels.mg_tail import make_mg_tail

        fused_tail = make_mg_tail(
            levels[tail_from:], cfg.omega, cfg.pre_sweeps,
            cfg.post_sweeps, np.asarray(coarse_pinv, np.float32),
            interpret=pallas_interpret)
    if exact_level0_fused is not None:
        pallas_pre0_field, pallas_post0_res = exact_level0_fused

    def smooth_pair(level, p, b, n, level_idx=None):
        if level_idx is not None and level_idx in pallas_pairs:
            return pallas_pairs[level_idx][n](p, b)
        interior, red, black = _inline_masks(level)
        inv = _inv_diag(level, interior)

        def body(_, p):
            p = _smooth(level, p, b, cfg.omega, red, inv)
            return _smooth(level, p, b, cfg.omega, black, inv)

        return jax.lax.fori_loop(0, n, body, p)

    def coarse_solve(b):
        vec = b[1 : bot_ny + 1, 1 : bot_nx + 1].reshape(-1)
        e = (coarse_pinv.astype(b.dtype) @ vec).reshape(bot_ny, bot_nx)
        out = jnp.zeros(bot.shape, dtype=b.dtype)
        return out.at[1 : bot_ny + 1, 1 : bot_nx + 1].set(e)

    top = levels[0]
    if exact_level0 is not None:
        smooth0, residual0 = exact_level0
    else:
        smooth0 = lambda p, b, n: smooth_pair(top, p, b, n, level_idx=0)
        residual0 = lambda p, b: _residual(top, p, b)

    def quad_coarse_and_post(p, b, rc):
        """Coarse correction + fused post for the quad level 0, given the
        restricted residual (from pre_quad, or the fused carry kernel when
        quad_first_rc)."""
        post_quad = quad_level0[1]
        rc_shape = rc.shape
        if coarse_dt is not None:
            # bf16 level 1 is 16-row aligned — pad the quad kernel's
            # 8-aligned rc out and slice ec back (one fused cast+pad
            # pass each way; the quad kernels themselves stay f32)
            H1, W1 = levels[1].shape
            rc = jnp.pad(rc, ((0, H1 - rc_shape[0]),
                              (0, W1 - rc_shape[1]))).astype(coarse_dt)
        ec = vcycle(1, jnp.zeros(levels[1].shape, dtype=rc.dtype), rc)
        if coarse_dt is not None:
            ec = ec[:rc_shape[0], :rc_shape[1]].astype(b.dtype)
        return post_quad(p, b, ec)

    def vcycle(k: int, p, b):
        level = levels[k]
        if fused_tail is not None and k == tail_from:
            return fused_tail(b)  # p is zeros at every k >= 1 call site
        if k == len(levels) - 1:
            return coarse_solve(b)
        if k == 0 and quad_level0 is not None:
            pre_quad, post_quad = quad_level0
            p, rc = pre_quad(p, b)
            return quad_coarse_and_post(p, b, rc)  # (p, residual_inf) fused
        if k == 0:
            if pallas_pre0_field is not None:
                p, r = pallas_pre0_field(p, b)
            else:
                p = smooth0(p, b, cfg.pre_sweeps)
                r = residual0(p, b)
        elif k in pallas_pre_field:
            p, r = pallas_pre_field[k](p, b)
        else:
            p = smooth_pair(level, p, b, cfg.pre_sweeps, level_idx=k)
            r = _residual(level, p, b)
        rc = _restrict(level, levels[k + 1], r)
        if coarse_dt is not None and k == 0:
            rc = rc.astype(coarse_dt)  # enter the bf16 correction path
        ec = vcycle(k + 1, jnp.zeros(levels[k + 1].shape, dtype=rc.dtype), rc)
        if cfg.corr_opt and k == 0:
            # exact/weighted defect-correction seam: line-search the
            # correction amplitude (see the MGConfig.corr_opt docstring)
            ec = _corr_alpha(levels[1], rc, ec) * ec
        # bf16 ec promotes back to f32 in the add at k == 0
        p = p + _prolong(levels[k + 1], level, ec)
        if k == 0:
            if pallas_post0_res is not None:
                return pallas_post0_res(p, b)  # (p, residual_inf) fused
            return smooth0(p, b, cfg.post_sweeps)
        return smooth_pair(level, p, b, cfg.post_sweeps, level_idx=k)

    def solve(p_warm, b, max_b=None):
        """``max_b``: optionally precomputed max|b| (e.g. fused into the
        source-build kernel) — skips a whole-array reduce."""
        dtype_ = b.dtype
        if max_b is None:
            max_b = jnp.max(jnp.abs(b))
        tol = jnp.maximum(cfg.tol_factor * jnp.where(max_b > 0, max_b, jnp.ones_like(max_b)),
                          jnp.asarray(cfg.abs_tol, dtype_))
        if quad_level0 is not None:
            # quad planes are 0 outside the interior by construction (the
            # corrector/converters mask), so the warm start needs no mask
            p0 = p_warm
        else:
            top_interior, _, _ = _inline_masks(top)
            p0 = jnp.where(top_interior, p_warm, jnp.zeros_like(p_warm)) \
                if exact_level0 is None else p_warm

        def cond(carry):
            _, res, prev, it = carry
            return (res > tol) & (it < cfg.max_cycles) & (res < cfg.stall_ratio * prev)

        def body(carry):
            p, res, _, it = carry
            out = vcycle(0, p, b)
            if pallas_post0_res is not None or quad_level0 is not None:
                p, new_res = out
                if cfg.pin_mean:  # pure-Neumann (checked above): the fused
                    mean = jnp.sum(p) / n_int  # residual is shift-invariant
                    if quad_level0 is not None:
                        q = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0)
                        jj = 2 * jax.lax.broadcasted_iota(
                            jnp.int32, p.shape, 1) + (q >> 1)
                        ii = 2 * jax.lax.broadcasted_iota(
                            jnp.int32, p.shape, 2) + (q & 1)
                        cell = ((jj >= 1) & (jj <= problem.ny)
                                & (ii >= 1) & (ii <= problem.nx))
                        p = jnp.where(cell, p - mean, p)
                    else:
                        ti, _, _ = _inline_masks(top)
                        p = jnp.where(ti, p - mean, p)
            else:
                p = out
                if cfg.pin_mean:
                    mean = jnp.sum(p) / n_int  # p is 0 outside interior
                    p = jnp.where(top_interior, p - mean, p)
                new_res = jnp.max(jnp.abs(residual0(p, b)))
            return p, new_res.astype(dtype_), res, it + 1

        # Finite sentinel, NOT finfo(dtype).max: TPU emulates float64 with
        # float32 pairs, so 1.8e308 stores as inf and the stall check
        # (res < stall_ratio * prev) evaluates inf < inf = False — the
        # while_loop would exit after ZERO cycles (caught by full-trace
        # comparison vs the golden step run).
        big = jnp.asarray(1e30, dtype_)
        init = (p0, big / 2, big, jnp.asarray(0, jnp.int32))
        p, res, _, iters = jax.lax.while_loop(cond, body, init)
        return p, iters, res

    if quad_first_rc:
        if quad_level0 is None or cfg.pin_mean:
            raise ValueError("quad_first_rc requires quad_level0 and "
                             "pin_mean=False (the fused carry kernel owns "
                             "the first pre-smooth)")

        def solve_rc(p1, b, rc0, max_b=None):
            """First-cycle pre-smooth + restriction already done by the
            caller's fused carry kernel: cycle 1 starts at the coarse
            stage with ``rc0``; cycles >= 2 run the regular pre kernel."""
            dtype_ = b.dtype
            if max_b is None:
                max_b = jnp.max(jnp.abs(b))
            tol = jnp.maximum(
                cfg.tol_factor * jnp.where(max_b > 0, max_b,
                                           jnp.ones_like(max_b)),
                jnp.asarray(cfg.abs_tol, dtype_))
            pre_quad = quad_level0[0]

            def cond(carry):
                _, res, prev, it = carry
                return ((res > tol) & (it < cfg.max_cycles)
                        & (res < cfg.stall_ratio * prev))

            def body(carry):
                p, res, _, it = carry
                p, rc = jax.lax.cond(it == 0,
                                     lambda p: (p, rc0),
                                     lambda p: pre_quad(p, b), p)
                p, new_res = quad_coarse_and_post(p, b, rc)
                return p, new_res.astype(dtype_), res, it + 1

            big = jnp.asarray(1e30, dtype_)
            init = (p1, big / 2, big, jnp.asarray(0, jnp.int32))
            p, res, _, iters = jax.lax.while_loop(cond, body, init)
            return p, iters, res

        return solve_rc

    return solve


def masked_channel_problem(grid, dx: float, dy: float) -> PoissonProblem:
    """Weighted operator for masked geometry with channel-style domain BCs:
    fluid-fluid couplings 1, couplings through solid cells 0 (Neumann across
    internal walls, the elimination of backwards_step-01.cpp:708-739 up to
    convex-corner diagonal terms), inlet/wall Neumann, outlet Dirichlet-0.
    Used as the COARSE-hierarchy operator under exact fine-level smoothing
    (see make_masked_multigrid_poisson)."""
    f = grid.fluid.astype(np.float64)
    nx, ny = grid.nx, grid.ny
    wE = f * np.roll(f, -1, axis=1)
    wW = f * np.roll(f, 1, axis=1)
    wN = f * np.roll(f, -1, axis=0)
    wS = f * np.roll(f, 1, axis=0)
    wE[1 : ny + 1, nx] = grid.fluid[1 : ny + 1, nx]  # outlet Dirichlet-0 ghost
    return PoissonProblem(nx, ny, dx, dy, wE, wW, wN, wS)


def step_rect_params(grid) -> tuple[int, int] | None:
    """If the grid's solid raster is exactly the reference's backward-step
    rectangle ``solid = {i <= step_i and j > inlet_j_max}``
    (backwards_step-01.cpp:499-520), return (step_i, inlet_j_max); else
    None. Enables the iota-derived Pallas fine-level smoother."""
    nx, ny = grid.nx, grid.ny
    interior = grid.fluid[1 : ny + 1, 1 : nx + 1]
    solid = ~interior
    if not solid.any():
        return None
    jj, ii = np.nonzero(solid)
    step_i = int(ii.max()) + 1  # back to 1-based padded indexing
    inlet_j_max = int(jj.min())  # first solid row is inlet_j_max + 1
    jj1 = np.arange(1, ny + 1)[:, None]
    ii1 = np.arange(1, nx + 1)[None, :]
    expected = (ii1 <= step_i) & (jj1 > inlet_j_max)
    if (solid == expected).all():
        return step_i, inlet_j_max
    return None


def make_masked_multigrid_poisson(grid, coeffs, cfg: MGConfig, ghosts,
                                  dtype=jnp.float32,
                                  smoother_mode: str = "auto"):
    """Defect-correction multigrid for masked geometry (the reference's
    backward-facing step): the finest level smooths with the exact
    reference operator — plain 5-point sweeps over fluid cells with the
    ghost functor (domain ghosts + solid-cell fluid-neighbor averaging,
    backwards_step-01.cpp:685-739) refreshed every pair — and measures the
    exact residual; coarser levels correct with the weighted approximation.
    Converges to the same fixed point as the masked SOR solver.

    ``smoother_mode`` ("auto" | "off" | "interpret"): for float32 runs on
    TPU whose raster is the reference's step rectangle, "auto" replaces the
    XLA fine-level smoothing with the fused Pallas exact smoother
    (kernels.step_smoother) — bitwise-identical iterations, one HBM round
    trip per smoothing block instead of hundreds of small fusions."""
    nx, ny = grid.nx, grid.ny
    idx2, idy2 = coeffs.idx2, coeffs.idy2
    denom = 2.0 * (idx2 + idy2)
    fluid = jnp.asarray(grid.cell_mask)
    jj = np.arange(ny + 2)[:, None]
    ii = np.arange(nx + 2)[None, :]
    cb = jnp.asarray((ii + jj) % 2 == 0)
    red = cb & fluid
    black = (~cb) & fluid
    omega = cfg.omega

    def half(p, b, mask):
        gs = (idx2 * (_sh(p, 0, 1) + _sh(p, 0, -1))
              + idy2 * (_sh(p, 1, 0) + _sh(p, -1, 0)) - b) / denom
        upd = (1.0 - omega) * p + omega * gs
        return jnp.where(mask, upd.astype(p.dtype), p)

    def smooth0(p, b, n):
        def body(_, p):
            p = ghosts(p)
            p = half(p, b, red)
            p = half(p, b, black)
            return p

        return ghosts(jax.lax.fori_loop(0, n, body, p))

    def residual0(p, b):
        p = ghosts(p)
        lap = (_sh(p, 0, 1) - 2.0 * p + _sh(p, 0, -1)) * idx2 + (
            _sh(p, 1, 0) - 2.0 * p + _sh(p, -1, 0)) * idy2
        return jnp.where(fluid, b - lap, jnp.zeros_like(b))

    fused = None
    if smoother_mode != "off" and np.dtype(dtype) == np.float32:
        dev = jax.config.jax_default_device
        platform = dev.platform if dev is not None else jax.default_backend()
        interp = smoother_mode == "interpret"
        rect = step_rect_params(grid)
        if rect is not None and (interp or platform == "tpu"):
            from cfd_tpu.kernels.step_smoother import make_step_masked_pairs

            step_i, inlet_j_max = rect
            kw = dict(shape=grid.shape, step_i=step_i,
                      inlet_j_max=inlet_j_max, idx2=idx2, idy2=idy2,
                      omega=omega, interpret=interp)
            fused = (
                make_step_masked_pairs(n_pairs=cfg.pre_sweeps,
                                       with_residual_field=True, **kw),
                make_step_masked_pairs(n_pairs=cfg.post_sweeps,
                                       with_residual=True, **kw),
            )

    prob = masked_channel_problem(grid, coeffs.dx, coeffs.dy)
    return make_multigrid_poisson(prob, cfg, dtype, n_interior=grid.n_fluid,
                                  exact_level0=(smooth0, residual0),
                                  exact_level0_fused=fused)


def make_masked_quad_multigrid_poisson(grid, coeffs, cfg: MGConfig,
                                       dtype=jnp.float32,
                                       interpret: bool = False):
    """Quad-layout defect-correction multigrid for the reference's step
    rectangle: the finest level runs the fused quad exact-smoother kernels
    (kernels.step_quad — ghosts + dense red/black planes + residual +
    restriction/prolongation in one HBM round trip each), the coarse
    hierarchy the weighted masked approximation on ALIGNED levels
    (whole-array XLA; 2D weights). solve(p4_warm, b4) -> (p4, cycles, res)
    takes/returns the finest pressure in the quad (4, Hq8, Wqa) layout.

    Raises ValueError when the raster is not the reference rectangle or the
    aligned level-1 shape does not coincide with the quad plane shape."""
    from cfd_tpu.kernels.quad import quad_dims
    from cfd_tpu.kernels.step_quad import (
        make_quad_step_post_prolong_smooth,
        make_quad_step_pre_smooth_restrict,
    )

    if cfg.coarse_dtype is not None:
        raise ValueError("coarse_dtype is not supported on the masked "
                         "(defect-correction) hierarchy — separable "
                         "aligned/quad paths only")
    rect = step_rect_params(grid)
    if rect is None:
        raise ValueError("quad masked multigrid requires the reference's "
                         "step rectangle raster")
    if np.dtype(dtype) != np.float32:
        raise ValueError("the quad path is float32")
    step_i, inlet_j = rect
    nx, ny = grid.nx, grid.ny
    idx2, idy2 = coeffs.idx2, coeffs.idy2

    probs = [masked_channel_problem(grid, coeffs.dx, coeffs.dy)]
    while (probs[-1].nx % 2 == 0 and probs[-1].ny % 2 == 0
           and probs[-1].nx // 2 >= cfg.min_coarse
           and probs[-1].ny // 2 >= cfg.min_coarse):
        probs.append(coarsen_problem(probs[-1]))
    if len(probs) < 2:
        raise ValueError("grid too small for the quad masked hierarchy")
    levels = [_build_level(p, dtype, aligned=True, allow_full=True)
              for p in probs[1:]]
    Hq, Wq, Hq8, Wqa = quad_dims(grid.shape)
    if levels[0].shape != (Hq8, Wqa):
        raise ValueError(f"aligned coarse shape {levels[0].shape} != quad "
                         f"plane shape {(Hq8, Wqa)}")
    pinv = jnp.asarray(_dense_pinv(probs[-1]), dtype)
    bot = levels[-1]
    bot_ny, bot_nx = bot.ny, bot.nx

    pre = make_quad_step_pre_smooth_restrict(
        grid.shape, step_i, inlet_j, idx2, idy2, cfg.omega, cfg.pre_sweeps,
        (Hq8, Wqa), interpret=interpret)
    post = make_quad_step_post_prolong_smooth(
        grid.shape, step_i, inlet_j, idx2, idy2, cfg.omega, cfg.post_sweeps,
        (Hq8, Wqa), interpret=interpret)

    # fused coarse tail (kernels.mg_tail): cfg.tail_from is a GLOBAL level
    # index — levels[0] here is global level 1 (the quad kernels are the
    # global level 0), so tail_from=1 fuses this ENTIRE hierarchy into one
    # kernel call between the quad pre and post kernels.
    fused_tail, tail_k = None, None
    if cfg.tail_from is not None:
        start = cfg.tail_from - 1
        if 0 <= start <= len(levels) - 2:
            from cfd_tpu.kernels.mg_tail import make_mg_tail

            fused_tail, tail_k = make_mg_tail(
                levels[start:], cfg.omega, cfg.pre_sweeps, cfg.post_sweeps,
                np.asarray(pinv, np.float32), interpret=interpret), start

    # coarse smoothing: fused full-weight (2D) Pallas pairs per level — one
    # kernel per smoothing block instead of dozens of small whole-array XLA
    # fusions (the kernels.rb_smoother full_w mode; bitwise-identical to
    # the XLA masked composition); only for levels the fused tail (if any)
    # leaves reachable
    from cfd_tpu.kernels.rb_smoother import rb_pairs_for_level

    reachable = len(levels) - 1 if tail_k is None else tail_k
    pallas_pre_field = {}
    pallas_post = {}
    for k in range(reachable):
        pallas_pre_field[k] = rb_pairs_for_level(
            levels[k], cfg.omega, cfg.pre_sweeps, with_residual_field=True,
            interpret=interpret, aligned_io=True)
        pallas_post[k] = rb_pairs_for_level(
            levels[k], cfg.omega, cfg.post_sweeps, interpret=interpret,
            aligned_io=True)

    def coarse_solve(b):
        vec = b[1 : bot_ny + 1, 1 : bot_nx + 1].reshape(-1)
        e = (pinv.astype(b.dtype) @ vec).reshape(bot_ny, bot_nx)
        out = jnp.zeros(bot.shape, dtype=b.dtype)
        return out.at[1 : bot_ny + 1, 1 : bot_nx + 1].set(e)

    def cvcycle(k, p, b):
        level = levels[k]
        if fused_tail is not None and k == tail_k:
            return fused_tail(b)  # p is zeros at every call site
        if k == len(levels) - 1:
            return coarse_solve(b)
        p, r = pallas_pre_field[k](p, b)
        rc = _restrict(level, levels[k + 1], r)
        ec = cvcycle(k + 1, jnp.zeros(levels[k + 1].shape, dtype=rc.dtype), rc)
        p = p + _prolong(levels[k + 1], level, ec)
        return pallas_post[k](p, b)

    def solve(p_warm, b, max_b=None):
        dtype_ = b.dtype
        if max_b is None:
            max_b = jnp.max(jnp.abs(b))  # b is 0 outside fluid by construction
        tol = jnp.maximum(
            cfg.tol_factor * jnp.where(max_b > 0, max_b, jnp.ones_like(max_b)),
            jnp.asarray(cfg.abs_tol, dtype_))

        def cond(carry):
            _, res, prev, it = carry
            return (res > tol) & (it < cfg.max_cycles) & (res < cfg.stall_ratio * prev)

        def body(carry):
            p, res, _, it = carry
            p, rc = pre(p, b)
            ec = cvcycle(0, jnp.zeros(levels[0].shape, dtype=rc.dtype), rc)
            if cfg.corr_opt:
                # exact/weighted defect-correction seam (levels[0] here is
                # GLOBAL level 1): line-search the correction amplitude —
                # see the MGConfig.corr_opt docstring
                ec = _corr_alpha(levels[0], rc, ec) * ec
            # the post kernel's in-kernel 1->0 prolongation is mask-blind;
            # Neumann-extend the correction into solid cells here (the
            # k>=1 transitions go through _prolong, which self-fills)
            p, new_res = post(p, b, _solid_fill(levels[0], ec))
            return p, new_res.astype(dtype_), res, it + 1

        big = jnp.asarray(1e30, dtype_)
        init = (p_warm, big / 2, big, jnp.asarray(0, jnp.int32))
        p, res, _, iters = jax.lax.while_loop(cond, body, init)
        return p, iters, res

    return solve
