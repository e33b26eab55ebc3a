"""Pallas TPU kernel: fused red-black smoothing sweeps for the multigrid
pressure solver.

The TPU analog of the reference's -O2 C++ inner loop (SURVEY.md section
2.2): one kernel performs ``n_pairs`` red+black Gauss-Seidel pairs over a
row-tiled grid entirely in VMEM — p and b are streamed from HBM ONCE per
kernel instead of once per half-sweep (the XLA whole-array path reads and
writes p per half-sweep, plus mask/select traffic), and the per-kernel
launch overhead is paid once per 2*n_pairs sweeps instead of per sweep.

Tiling: 1D over rows. A tile that outputs rows [r0, r0+T) of the padded
array needs a slab of T + 2*halo rows (each half-sweep consumes one halo row
per side); slabs overlap, so inputs are DMA'd manually from HBM refs
(`memory_space=ANY`) with clamped dynamic offsets. Mosaic requires dynamic
row offsets divisible by the f32 sublane tiling (8), so the wrapper pads the
row count to a multiple of 8 and the halo is rounded up to 8; the padding
rows sit beyond the physical ghost row and are masked out of every update.

Separable weights only (every rectangle problem + its coarsenings): the
boundary couplings enter as broadcastable row/column vectors kept in VMEM,
and parity/interior masks come from iotas on the global row index.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def make_rb_pairs(shape: tuple[int, int], wE: np.ndarray, wW: np.ndarray,
                  wN: np.ndarray, wS: np.ndarray, idx2: float, idy2: float,
                  omega: float, n_pairs: int, tile_rows: int = 64,
                  interpret: bool = False, with_residual: bool = False,
                  with_residual_field: bool = False,
                  aligned_io: bool = False, ny: int | None = None,
                  nx: int | None = None, dtype=jnp.float32):
    """Build pairs(p, b) -> p after ``n_pairs`` red+black sweeps.

    Args:
      shape: padded (H, W) = (ny+2, nx+2).
      wE, wW: (W,) east/west coupling vectors (0 outside interior columns).
      wN, wS: (H,) north/south coupling vectors.
      interpret: run in interpreter mode (CPU tests).
      with_residual: also return max|b - A p| of the smoothed state — fused
        into the same kernel (each tile owns disjoint output rows whose +-1
        neighbors are valid in its slab), saving a full extra HBM pass per
        tolerance check.
      aligned_io: inputs/outputs are already in the Mosaic-aligned
        (round_up(H,8), round_up(W,128)) layout with zeros beyond the
        logical padded array — skips the per-call jnp.pad / slice (a
        measured ~0.2 ms/step of pure layout copies at 2048^2 when the
        whole flow state is carried aligned).
      dtype: HBM/VMEM storage dtype of p, b (and the residual field). The
        sweep ARITHMETIC always runs float32 — a 2-byte dtype (bfloat16,
        the mixed-precision coarse hierarchy of MGConfig.coarse_dtype)
        halves the kernel's HBM traffic and is converted to f32 after the
        slab DMA / back to storage before the write-out. Storage rounding
        between kernels only perturbs the multigrid CORRECTION path (the
        caller keeps the finest level f32), so it shifts the contraction
        rate, not the convergence floor. 2-byte tiles are (16, 128): all
        sublane offsets/tiles round to 16 instead of 8.
    """
    H, Wp = shape
    # explicit interior dims support ALIGNED shapes whose trailing rows/cols
    # are dead zeros beyond the logical (ny+2, nx+2) grid
    ny = H - 2 if ny is None else ny
    nx = Wp - 2 if nx is None else nx
    # Mosaic alignment: dynamic row offsets/slices need sublane multiples
    # (8 for 4-byte, 16 for 2-byte dtypes), the lane dimension needs 128
    # multiples — pad both; padding rows/cols sit beyond the ghost ring and
    # are masked out of every update.
    g = 16 if np.dtype(dtype).itemsize == 2 else 8
    H8 = _round_up(H, g)
    W = _round_up(Wp, 128)
    # Each half-sweep consumes one slab row per side; the fused residual
    # additionally reads the +-1 neighbors of a tile's own rows, so it needs
    # one MORE valid row than the sweeps consumed (2*n_pairs < halo strictly;
    # with n_pairs=4 the plain round_up gave halo == 2*n_pairs = 8 and the
    # edge rows read stale neighbors).
    # with_residual_field: also emit the signed residual FIELD b - A p of
    # the smoothed state (feeds restriction without a separate XLA pass —
    # the V-cycle's pre-smooth + residual in one HBM trip). Same +-1
    # neighbor requirement as the fused max-residual.
    assert not (with_residual and with_residual_field)
    any_res = with_residual or with_residual_field
    halo = _round_up(2 * n_pairs + (1 if any_res else 0), g)
    assert not any_res or 2 * n_pairs < halo
    # scoped-VMEM budget (16 MB) covers slabs + live temporaries: ~48 bytes
    # per slab cell measured for the smoother body — shrink tiles on wide
    # grids (4096^2+) instead of OOMing at compile time
    slab_cap = int(15.5e6 // (48 * W))
    t_cap = max(g, ((slab_cap - 2 * halo) // g) * g)
    T = min(_round_up(tile_rows, g), t_cap, H8)
    if T + 2 * halo >= H8:
        T = H8  # small level: one whole-array tile
    slab = min(T + 2 * halo, H8)
    n_tiles = -(-H8 // T)  # last tile clamps (overlap writes identical rows)

    # FULL (2D) coupling-weight mode for non-separable (masked-geometry)
    # levels: the four weights are whole (H, W) arrays kept in VMEM and
    # row-sliced per slab — the masked coarse hierarchy's levels are small
    # (<= 1/4 of the fine grid), so the extra VMEM is a few MB at most.
    full_w = np.asarray(wE).ndim == 2

    def _pad2(w):
        w = np.asarray(w)
        return np.pad(w, ((0, H8 - w.shape[0]), (0, W - w.shape[1])))

    if full_w:
        wE_v = jnp.asarray(_pad2(wE), jnp.float32)
        wW_v = jnp.asarray(_pad2(wW), jnp.float32)
        wN_v = jnp.asarray(_pad2(wN), jnp.float32)
        wS_v = jnp.asarray(_pad2(wS), jnp.float32)
    else:
        we_np = np.zeros(W)
        we_np[:Wp] = np.asarray(wE)
        ww_np = np.zeros(W)
        ww_np[:Wp] = np.asarray(wW)
        wE_v = jnp.asarray(we_np, jnp.float32).reshape(1, W)
        wW_v = jnp.asarray(ww_np, jnp.float32).reshape(1, W)
        wn_np = np.zeros(H8)
        wn_np[:H] = np.asarray(wN)
        ws_np = np.zeros(H8)
        ws_np[:H] = np.asarray(wS)
        wN_v = jnp.asarray(wn_np, jnp.float32).reshape(H8, 1)
        wS_v = jnp.asarray(ws_np, jnp.float32).reshape(H8, 1)

    def kernel(p_hbm, b_hbm, we_ref, ww_ref, wn_ref, ws_ref, *out_and_scratch):
        r_hbm = r_s = res_ref = None
        if with_residual:
            out_hbm, res_ref, p_s, b_s, sems = out_and_scratch
        elif with_residual_field:
            out_hbm, r_hbm, p_s, b_s, r_s, sems = out_and_scratch
        else:
            out_hbm, p_s, b_s, sems = out_and_scratch
        i = pl.program_id(0)

        # output rows [r0, r0+T); the last tile clamps to H8-T and overlaps
        # its predecessor (identical recomputed rows). All offsets are
        # multiples of 8 (T and H8 are).
        def coords(t):
            r0 = pl.multiple_of(jnp.minimum(t * T, H8 - T).astype(jnp.int32), g)
            s = pl.multiple_of(jnp.clip(r0 - halo, 0, H8 - slab).astype(jnp.int32), g)
            return r0, s

        r0, s = coords(i)
        # Double-buffered input DMA: grid steps run sequentially, so start
        # the NEXT tile's slab copies before waiting on this tile's — the
        # transfers overlap this tile's compute.
        slot = jax.lax.rem(i.astype(jnp.int32), jnp.int32(2))
        nxt = jax.lax.rem((i + 1).astype(jnp.int32), jnp.int32(2))

        def start_in(t, sl):
            _, st = coords(t)
            pltpu.make_async_copy(p_hbm.at[pl.ds(st, slab), :], p_s.at[sl],
                                  sems.at[sl, 0]).start()
            pltpu.make_async_copy(b_hbm.at[pl.ds(st, slab), :], b_s.at[sl],
                                  sems.at[sl, 1]).start()

        @pl.when(i == 0)
        def _():
            start_in(0, slot)

        @pl.when(i + 1 < n_tiles)
        def _():
            start_in(i + 1, nxt)

        pltpu.make_async_copy(p_hbm.at[pl.ds(s, slab), :], p_s.at[slot],
                              sems.at[slot, 0]).wait()
        pltpu.make_async_copy(b_hbm.at[pl.ds(s, slab), :], b_s.at[slot],
                              sems.at[slot, 1]).wait()

        grow = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        interior = (grow >= 1) & (grow <= ny) & (gcol >= 1) & (gcol <= nx)
        even = ((grow + gcol) % 2) == 0

        if full_w:
            we = we_ref[pl.ds(s, slab), :]
            ww = ww_ref[pl.ds(s, slab), :]
        else:
            we = we_ref[:]
            ww = ww_ref[:]
        wn = wn_ref[pl.ds(s, slab), :]
        ws = ws_ref[pl.ds(s, slab), :]
        denom = idx2 * (we + ww) + idy2 * (wn + ws)
        if full_w:
            # fully-decoupled (solid) cells never update and stay 0, the
            # masked _inline_masks convention (poisson.multigrid)
            interior = interior & (denom > 0)
        inv = jnp.where(interior, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
        # storage may be 2-byte (see ``dtype``); ALL sweep arithmetic is f32
        b = b_s[slot].astype(jnp.float32)

        def half(p, mask):
            pE = jnp.roll(p, -1, axis=1)
            pW = jnp.roll(p, 1, axis=1)
            pN = jnp.roll(p, -1, axis=0)
            pS = jnp.roll(p, 1, axis=0)
            gs = (idx2 * (we * pE + ww * pW) + idy2 * (wn * pN + ws * pS) - b) * inv
            upd = p + omega * (gs - p)
            return jnp.where(mask, upd, p)

        p = p_s[slot].astype(jnp.float32)
        # The valid band shrinks by one slab row per half-sweep — except
        # where the slab reaches a physical domain edge: ghost/padding rows
        # are never updated, so the dependency chain terminates there.
        local = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        at_bottom = s == 0
        at_top = s + slab >= ny + 1  # slab reaches the top ghost row (rows
        # beyond ny+1 are never updated, so the dependency chain ends there)

        def band(lo):
            lo_eff = jnp.where(at_bottom, 0, lo)
            hi_eff = jnp.where(at_top, slab, slab - lo)
            return (local >= lo_eff) & (local < hi_eff)

        for k in range(n_pairs):
            lo = 2 * k + 1
            p = half(p, interior & even & band(lo))
            p = half(p, interior & ~even & band(lo + 1))
        if with_residual or with_residual_field:
            # residual of the smoothed state over this tile's own rows
            # (rows r0..r0+T-1 and their +-1 neighbors are valid: halo >= 8
            # while n_pairs consumes only 2*n_pairs rows)
            pE = jnp.roll(p, -1, axis=1)
            pW = jnp.roll(p, 1, axis=1)
            pN = jnp.roll(p, -1, axis=0)
            pS = jnp.roll(p, 1, axis=0)
            ap = (idx2 * (we * (pE - p) + ww * (pW - p))
                  + idy2 * (wn * (pN - p) + ws * (pS - p)))
            if with_residual:
                own = interior & (grow >= r0) & (grow < r0 + T)
                r = jnp.where(own, jnp.abs(b - ap), jnp.zeros_like(b))
                tile_max = jnp.max(r)
                # running max across the (sequential) grid into one SMEM scalar

                @pl.when(i == 0)
                def _():
                    res_ref[0, 0] = tile_max

                @pl.when(i > 0)
                def _():
                    res_ref[0, 0] = jnp.maximum(res_ref[0, 0], tile_max)
            else:
                r_s[slot] = jnp.where(interior, b - ap,
                                      jnp.zeros_like(b)).astype(dtype)
        p_s[slot] = p.astype(dtype)  # write back into the slab scratch;
        # DMA a ref slice out
        off = pl.multiple_of((r0 - s).astype(jnp.int32), g)
        out = pltpu.make_async_copy(p_s.at[slot, pl.ds(off, T), :],
                                    out_hbm.at[pl.ds(r0, T), :], sems.at[slot, 2])
        out.start()
        if with_residual_field:
            out_r = pltpu.make_async_copy(r_s.at[slot, pl.ds(off, T), :],
                                          r_hbm.at[pl.ds(r0, T), :],
                                          sems.at[slot, 3])
            out_r.start()
            out_r.wait()
        out.wait()

    out_shape = jax.ShapeDtypeStruct((H8, W), dtype)
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((2, slab, W), dtype),
        pltpu.VMEM((2, slab, W), dtype),
    ]
    n_sems = 3
    if with_residual:
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs = (out_specs,
                     pl.BlockSpec(memory_space=pltpu.SMEM))
    elif with_residual_field:
        out_shape = (out_shape, jax.ShapeDtypeStruct((H8, W), dtype))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2, slab, W), dtype))
        n_sems = 4
    fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((2, n_sems))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )

    @jax.jit
    def pairs(p, b):
        if aligned_io:
            p8, b8 = p, b
        else:
            p8 = jnp.pad(p.astype(dtype), ((0, H8 - H), (0, W - Wp)))
            b8 = jnp.pad(b.astype(dtype), ((0, H8 - H), (0, W - Wp)))
        if with_residual:
            out, res = fn(p8, b8, wE_v, wW_v, wN_v, wS_v)
            return (out, res[0, 0]) if aligned_io else (out[:H, :Wp], res[0, 0])
        if with_residual_field:
            out, r = fn(p8, b8, wE_v, wW_v, wN_v, wS_v)
            return (out, r) if aligned_io else (out[:H, :Wp], r[:H, :Wp])
        out = fn(p8, b8, wE_v, wW_v, wN_v, wS_v)
        return out if aligned_io else out[:H, :Wp]

    return pairs


def rb_pairs_for_level(level, omega: float, n_pairs: int, interpret: bool = False,
                       with_residual: bool = False,
                       with_residual_field: bool = False,
                       aligned_io: bool = False, tile_rows: int = 128,
                       dtype=jnp.float32):
    """Adapter from a multigrid ``_Level`` (separable) to the kernel.

    tile_rows=128 halves the overlapping-slab redundancy vs 64 (halo 8 rows
    per side) while staying within the 16 MB scoped-VMEM budget for the
    2-in/2-out residual-field variant (4 double-buffered 144-row slabs).

    ``dtype``: storage dtype of the level's arrays (bfloat16 for the
    mixed-precision coarse hierarchy); weights are read back to f64 numpy
    for the kernel's f32 VMEM constants regardless."""
    if not level.separable:
        # full-weight (masked) mode: the aligned level carries whole 2D
        # coupling arrays
        return make_rb_pairs(
            (level.shape[0], level.shape[1]),
            np.asarray(level.wE, np.float64), np.asarray(level.wW, np.float64),
            np.asarray(level.wN, np.float64), np.asarray(level.wS, np.float64),
            level.idx2, level.idy2, omega, n_pairs, tile_rows=tile_rows,
            interpret=interpret, with_residual=with_residual,
            with_residual_field=with_residual_field, aligned_io=aligned_io,
            ny=level.ny if level.ny >= 0 else None,
            nx=level.nx if level.nx >= 0 else None, dtype=dtype)
    H, W = level.shape
    return make_rb_pairs(
        (H, W),
        np.asarray(level.wE, np.float64).reshape(W),
        np.asarray(level.wW, np.float64).reshape(W),
        np.asarray(level.wN, np.float64).reshape(H),
        np.asarray(level.wS, np.float64).reshape(H),
        level.idx2, level.idy2, omega, n_pairs, tile_rows=tile_rows,
        interpret=interpret,
        with_residual=with_residual, with_residual_field=with_residual_field,
        aligned_io=aligned_io,
        ny=level.ny if level.ny >= 0 else None,
        nx=level.nx if level.nx >= 0 else None, dtype=dtype)
