"""Fused multigrid coarse tail: the ENTIRE V-cycle below a chosen level in
ONE Pallas call.

Motivation (measured, BASELINE.md round 3): below the finest one or two
levels the V-cycle is launch/glue-bound, not bandwidth-bound — each coarse
level costs a pre kernel + a post kernel + XLA restrict/prolong/zeros-init
dispatches on arrays of a few MB or less (7 levels x ~4 dispatches at the
backwards-step scale).  This kernel keeps every level below ``tail_from``
resident in VMEM and runs the whole descent + coarsest pseudo-inverse solve
+ ascent as one program: ``tail(b) -> e`` with exactly the semantics of the
recursive ``vcycle(k, zeros, b)`` it replaces (poisson/multigrid.py).

TPU-legality notes (every op is roll / iota-mask / matmul — nothing else):

* Restriction and prolongation change the LANE dimension by a factor 2.
  Mosaic has no strided lane access of any kind (CLAUDE.md), so the lane
  halving/doubling is expressed as small constant matmuls on the MXU:
  full-weighting ``rc = (Rr @ r) @ Rc`` and bilinear 9-3-3-1 prolongation
  ``ef = Pr @ ec @ Pc`` (the 2D transfer kernels are separable products of
  [0.75, 0.25] row/col mixes, edge clamps folded into the matrices).  The
  matrices are banded (2 nonzeros per row/col) and tiny at coarse-level
  sizes; FLOP cost is negligible below ~1024-wide levels.
* The coarsest dense pseudo-inverse (nullspace-safe exact solve,
  multigrid._dense_pinv) cannot flatten the (ny_b, nx_b) interior in-kernel
  (lane-granularity gather).  It is decomposed into ny_b^2 lane-space
  matmuls: e[j', :] += roll(b, j'-j, rows) @ M[j', j] where
  M[j', j][l, l'] = pinv[(j'-1) nx_b + l'-1, (j-1) nx_b + l-1].
* Smoothing is the standard masked red/black half-sweep pair on whole
  VMEM-resident arrays (parity from iotas, weights as separable (1, W) /
  (H, 1) vectors or full 2D arrays for masked geometry) — identical math
  to multigrid._smooth.

Float32 only (the performance path).  Equivalence to the per-level path is
asserted in tests/test_mg_tail.py (interpret mode vs. the XLA vcycle tail).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _dot(a, b):
    """f32 matmul at HIGHEST precision: the transfers these replace
    (reduce_window restriction, stack+reshape prolongation) are exact-f32
    adds; default TPU matmul precision is single-pass bf16 and would feed
    ~1e-3-relative rounding into the coarse corrections."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _transfer_matrices(fine, coarse):
    """(Rr, Rc, Pr, Pc) f32 numpy matrices between two ALIGNED levels.

    Restriction (multigrid._restrict): coarse interior (Jc, Ic) = mean of
    fine children rows (2Jc-1, 2Jc) x cols (2Ic-1, 2Ic); zero outside the
    coarse interior.  Prolongation (multigrid._prolong): bilinear 9-3-3-1 =
    (0.75/0.25 row mix) x (0.75/0.25 col mix) with edge-clamped coarse
    ghosts; zero outside the fine interior."""
    Hf, Wf = fine.shape
    Hc, Wc = coarse.shape
    nyc, nxc = coarse.ny, coarse.nx
    nyf, nxf = fine.ny, fine.nx
    assert nyf == 2 * nyc and nxf == 2 * nxc, (fine.shape, coarse.shape)

    Rr = np.zeros((Hc, Hf), np.float32)
    Rc = np.zeros((Wf, Wc), np.float32)
    for Jc in range(1, nyc + 1):
        Rr[Jc, 2 * Jc - 1] = Rr[Jc, 2 * Jc] = 0.5
    for Ic in range(1, nxc + 1):
        Rc[2 * Ic - 1, Ic] = Rc[2 * Ic, Ic] = 0.5

    clamp = lambda v, lo, hi: min(max(v, lo), hi)
    Pr = np.zeros((Hf, Hc), np.float32)
    Pc = np.zeros((Wc, Wf), np.float32)
    for Jc in range(1, nyc + 1):
        Pr[2 * Jc - 1, Jc] += 0.75  # lo child: 3/4 own + 1/4 south
        Pr[2 * Jc - 1, clamp(Jc - 1, 1, nyc)] += 0.25
        Pr[2 * Jc, Jc] += 0.75     # hi child: 3/4 own + 1/4 north
        Pr[2 * Jc, clamp(Jc + 1, 1, nyc)] += 0.25
    for Ic in range(1, nxc + 1):
        Pc[Ic, 2 * Ic - 1] += 0.75
        Pc[clamp(Ic - 1, 1, nxc), 2 * Ic - 1] += 0.25
        Pc[Ic, 2 * Ic] += 0.75
        Pc[clamp(Ic + 1, 1, nxc), 2 * Ic] += 0.25
    return Rr, Rc, Pr, Pc


def _pinv_lane_blocks(pinv: np.ndarray, bot) -> list[np.ndarray]:
    """ny_b^2 lane-space (Wb, Wb) blocks of the coarsest dense
    pseudo-inverse, ordered (jp-1)*ny_b + (j-1) (see module docstring)."""
    nyb, nxb = bot.ny, bot.nx
    _, Wb = bot.shape
    out = []
    for jp in range(1, nyb + 1):
        for j in range(1, nyb + 1):
            blk = pinv[(jp - 1) * nxb:jp * nxb, (j - 1) * nxb:j * nxb]
            M = np.zeros((Wb, Wb), np.float32)
            # M[l, l'] = pinv[row (jp, l'), col (j, l)]
            M[1:nxb + 1, 1:nxb + 1] = blk.T
            out.append(M)
    return out


def _weight_arrays(lv):
    """Per-level weight constants as numpy arrays (separable vectors or
    full 2D), in the order they are passed to the kernel."""
    if lv.separable:
        H, W = lv.shape
        return [np.asarray(lv.wE, np.float32).reshape(1, W),
                np.asarray(lv.wW, np.float32).reshape(1, W),
                np.asarray(lv.wN, np.float32).reshape(H, 1),
                np.asarray(lv.wS, np.float32).reshape(H, 1)]
    return [np.asarray(lv.wE, np.float32), np.asarray(lv.wW, np.float32),
            np.asarray(lv.wN, np.float32), np.asarray(lv.wS, np.float32)]


def _lv_masks_invdiag(lv, wE, wW, wN, wS):
    """(interior, red, black, inv_diag) from iotas + the weight refs —
    the in-kernel twin of multigrid._inline_masks/_inv_diag."""
    H, W = lv.shape
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (jj >= 1) & (jj <= lv.ny) & (ii >= 1) & (ii <= lv.nx)
    denom = lv.idx2 * (wE + wW) + lv.idy2 * (wN + wS)
    denom = jnp.broadcast_to(denom, (H, W))
    if not lv.separable:
        interior = interior & (denom > 0)
    even = ((jj + ii) % 2) == 0
    inv_diag = jnp.where(interior,
                         1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
    return interior, interior & even, interior & ~even, inv_diag


def _smooth_pairs(lv, p, b, n_pairs, omega, wE, wW, wN, wS,
                  red, black, inv_diag):
    """n_pairs red-then-black half-sweeps (multigrid._smooth semantics).
    Rolls wrap into aligned dead rows/cols, which stay zero by the interior
    masking, so wraparound never contaminates the interior."""
    def half(p, upd):
        pE = jnp.roll(p, -1, axis=1)
        pW = jnp.roll(p, 1, axis=1)
        pN = jnp.roll(p, -1, axis=0)
        pS = jnp.roll(p, 1, axis=0)
        gs = (lv.idx2 * (wE * pE + wW * pW)
              + lv.idy2 * (wN * pN + wS * pS) - b) * inv_diag
        return jnp.where(upd, p + omega * (gs - p), p)

    for _ in range(n_pairs):
        p = half(p, red)
        p = half(p, black)
    return p


def _solid_fill(lv, e, wE, wW, wN, wS):
    """In-kernel twin of multigrid._solid_fill: Neumann-extend a masked
    level's correction into solid cells (average of fluid 4-neighbors)
    before the mask-blind bilinear prolongation matmuls.  Fixes the
    compounding near-wall under-correction that was the barely-contracting
    masked mode (see multigrid._solid_fill for the measured factors).
    Rolls wrap into dead/ghost cells whose fluid indicator is 0, so
    wraparound never contaminates the fill."""
    H, W = lv.shape
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    geom = (jj >= 1) & (jj <= lv.ny) & (ii >= 1) & (ii <= lv.nx)
    denom = lv.idx2 * (wE + wW) + lv.idy2 * (wN + wS)
    fluid = geom & (jnp.broadcast_to(denom, (H, W)) > 0)
    f = fluid.astype(e.dtype)
    ef = e * f
    num = (jnp.roll(ef, -1, axis=1) + jnp.roll(ef, 1, axis=1)
           + jnp.roll(ef, -1, axis=0) + jnp.roll(ef, 1, axis=0))
    den = (jnp.roll(f, -1, axis=1) + jnp.roll(f, 1, axis=1)
           + jnp.roll(f, -1, axis=0) + jnp.roll(f, 1, axis=0))
    fill = num / jnp.maximum(den, jnp.ones_like(den))
    return jnp.where(geom & ~fluid & (den > 0), fill.astype(e.dtype), e)


def _residual(lv, p, b, interior, wE, wW, wN, wS):
    pE = jnp.roll(p, -1, axis=1)
    pW = jnp.roll(p, 1, axis=1)
    pN = jnp.roll(p, -1, axis=0)
    pS = jnp.roll(p, 1, axis=0)
    a = (lv.idx2 * (wE * (pE - p) + wW * (pW - p))
         + lv.idy2 * (wN * (pN - p) + wS * (pS - p)))
    return jnp.where(interior, b - a, jnp.zeros_like(b))


def build_tail_consts(levels, pinv: np.ndarray, dtype=np.float32):
    """(consts, w_idx, t_idx, m_idx) for ``run_tail_vcycle``: per-level
    weight arrays, inter-level transfer matrices, coarsest pinv lane
    blocks — the full VMEM-resident constant set of a fused coarse tail.
    Shared by make_mg_tail and kernels.whole_solve.

    ``dtype``: storage dtype of the constants (float32, or ml_dtypes
    bfloat16 for the mixed-precision whole-solve hierarchy — halves their
    VMEM footprint; the transfer-matrix entries 0.25/0.5/0.75 are exactly
    representable in bfloat16 and the MXU accumulates in f32, so the
    transfers stay as accurate as the f32 ladder; weight/pinv rounding
    only perturbs the correction path)."""
    if len(levels) < 2:
        raise ValueError("mg tail needs at least two levels (one coarsening)")
    bot = levels[-1]
    if bot.ny > 12:
        raise ValueError(f"coarsest ny={bot.ny} too large for the lane-block "
                         "pinv decomposition (quadratic matmul count)")
    consts: list[np.ndarray] = []
    w_idx = []
    for lv in levels:
        w_idx.append(len(consts))
        consts.extend(_weight_arrays(lv))
    t_idx = []
    for fine, coarse in zip(levels[:-1], levels[1:]):
        t_idx.append(len(consts))
        consts.extend(_transfer_matrices(fine, coarse))
    m_idx = len(consts)
    consts.extend(_pinv_lane_blocks(np.asarray(pinv, np.float32), bot))
    if np.dtype(dtype) != np.float32:
        consts = [c.astype(dtype) for c in consts]
    return consts, w_idx, t_idx, m_idx


def run_tail_vcycle(levels, b0, getc, w_idx, t_idx, m_idx,
                    omega: float, pre_sweeps: int, post_sweeps: int,
                    store_dtype=None):
    """The fused tail's V-cycle body on VALUES: ``vcycle(zeros, b0) -> e``
    over ``levels`` with constants fetched via ``getc(i)`` (a ref-load in
    kernel context). Pure jnp — callable from any Pallas kernel whose
    levels fit in VMEM.

    ``store_dtype`` (e.g. jnp.bfloat16): keep the long-lived per-level
    arrays — the restricted sources ``b[k]`` and the pre-smoothed iterates
    ``ps[k]``, which stay live across the whole descent+ascent — in this
    dtype, upcasting to f32 for each level's arithmetic. Halves the
    V-cycle's resident VMEM (the enabler for the whole-solve kernel at the
    2048^2 headline size). The rounding only perturbs the CORRECTION path
    (the caller's finest level and tolerance residual stay f32), so it
    shifts the contraction rate, never the convergence floor — the same
    iterative-refinement argument as MGConfig.coarse_dtype. None = exact
    f32 (bitwise-identical to the pre-round-5 body). The returned
    correction is always f32."""
    omega = float(omega)
    K = len(levels)
    bot = levels[-1]
    nyb = bot.ny
    store = (lambda x: x) if store_dtype is None else \
        (lambda x: x.astype(store_dtype))
    f32 = (lambda x: x) if store_dtype is None else \
        (lambda x: x.astype(jnp.float32))

    def weights(k):
        # weight constants may be stored reduced-precision; arithmetic
        # (denominators, smoothing) always runs f32
        return tuple(f32(getc(w_idx[k] + i)) for i in range(4))

    b = [None] * K
    b[0] = store(b0)
    ps = [None] * K
    # descent: pre-smooth from zeros, residual, restrict
    for k in range(K - 1):
        lv = levels[k]
        wE, wW, wN, wS = weights(k)
        interior, red, black, inv_diag = _lv_masks_invdiag(
            lv, wE, wW, wN, wS)
        bk = f32(b[k])
        p = _smooth_pairs(lv, jnp.zeros_like(bk), bk, pre_sweeps,
                          omega, wE, wW, wN, wS, red, black, inv_diag)
        r = _residual(lv, p, bk, interior, wE, wW, wN, wS)
        Rr, Rc = f32(getc(t_idx[k])), f32(getc(t_idx[k] + 1))
        b[k + 1] = store(_dot(_dot(Rr, r), Rc))
        ps[k] = store(p)

    # coarsest: dense pseudo-inverse via lane-space blocks
    bb = f32(b[K - 1])
    Hb, Wb = bot.shape
    rows_b = jax.lax.broadcasted_iota(jnp.int32, (Hb, Wb), 0)
    e = jnp.zeros_like(bb)
    for jp in range(1, nyb + 1):
        for j in range(1, nyb + 1):
            Mi = f32(getc(m_idx + (jp - 1) * nyb + (j - 1)))
            # Mosaic rejects the zero-size slice jnp.roll(x, 0) emits
            # (same guard as kernels.projection._roll)
            rolled = bb if jp == j else jnp.roll(bb, jp - j, axis=0)
            e = jnp.where(rows_b == jp, e + _dot(rolled, Mi), e)

    # ascent: prolong, correct, post-smooth (e stays f32 level-to-level —
    # only the stored descent arrays pay the reduced precision)
    for k in range(K - 2, -1, -1):
        lv = levels[k]
        wE, wW, wN, wS = weights(k)
        interior, red, black, inv_diag = _lv_masks_invdiag(
            lv, wE, wW, wN, wS)
        if not levels[k + 1].separable:
            e = _solid_fill(levels[k + 1], e, *weights(k + 1))
        Pr, Pc = f32(getc(t_idx[k] + 2)), f32(getc(t_idx[k] + 3))
        ef = _dot(_dot(Pr, e), Pc)
        p = f32(ps[k]) + jnp.where(interior, ef, jnp.zeros_like(ef))
        e = _smooth_pairs(lv, p, f32(b[k]), post_sweeps, omega,
                          wE, wW, wN, wS, red, black, inv_diag)
    return e


def tail_consts_bytes(consts) -> int:
    """VMEM footprint of a tail const list (lane/sublane padding
    accounted, per each const's own dtype)."""
    return sum(_ref_bytes(c.shape, np.dtype(c.dtype).itemsize)
               for c in consts)


def _ref_bytes(shape, itemsize: int = 4):
    """VMEM bytes of a ref: native tiles are (8, 128) for 4-byte and
    (16, 128) for 2-byte dtypes."""
    g = 16 if itemsize == 2 else 8
    if len(shape) == 2:
        H, W = shape
        return _round_up(H, g) * _round_up(W, 128) * itemsize
    n, H, W = shape
    return n * _round_up(H, g) * _round_up(W, 128) * itemsize


def make_mg_tail(levels, omega: float, pre_sweeps: int, post_sweeps: int,
                 pinv: np.ndarray, interpret: bool = False):
    """Returns ``tail(b) -> e``: one Pallas call running the V-cycle over
    ``levels`` (aligned _Level list, finest first, coarsest solved with the
    dense ``pinv``) from a zero initial iterate — the drop-in replacement
    for ``vcycle(k, zeros, b)`` at the level whose _Level is ``levels[0]``.

    All level arrays, weights and transfer matrices live in VMEM for the
    whole call; total footprint is validated against a hard cap (raise
    ``tail_from`` if it trips)."""
    consts, w_idx, t_idx, m_idx = build_tail_consts(levels, pinv)

    # VMEM budget: 3 live arrays per level (p, b, r/e) + consts, with lane
    # padding of skinny refs accounted (Mosaic pads (H, 1) to (H, 128)).
    arrays = sum(3 * _ref_bytes(lv.shape) for lv in levels)
    cbytes = tail_consts_bytes(consts)
    est = arrays + cbytes
    vmem_limit = int(1.7 * est + 16e6)
    if vmem_limit > 115e6:
        raise ValueError(
            f"mg tail VMEM estimate {est / 1e6:.0f} MB too large for "
            f"{levels[0].shape} — start the fused tail one level deeper")

    def kernel(b0_ref, *refs):
        out_ref = refs[-1]
        cref = refs[:-1]
        out_ref[...] = run_tail_vcycle(
            levels, b0_ref[...], lambda i: cref[i][...], w_idx, t_idx,
            m_idx, omega, pre_sweeps, post_sweeps)

    from jax.experimental.pallas import tpu as pltpu

    const_arrays = [jnp.asarray(c) for c in consts]
    H0, W0 = levels[0].shape
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H0, W0), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=False, vmem_limit_bytes=int(vmem_limit)),
        interpret=interpret,
    )

    @jax.jit
    def tail(b):
        return call(b, *const_arrays)

    return tail
