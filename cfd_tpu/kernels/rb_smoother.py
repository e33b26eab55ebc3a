"""Pallas TPU kernel: fused red-black smoothing sweeps for the multigrid
pressure solver.

The TPU analog of the reference's -O2 C++ inner loop (SURVEY.md section
2.2): one kernel performs ``n_pairs`` red+black Gauss-Seidel pairs over a
row-tiled grid entirely in VMEM — p and b are streamed from HBM ONCE per
kernel instead of once per half-sweep (the XLA whole-array path reads and
writes p per half-sweep, plus mask/select traffic), and the per-kernel
launch overhead is paid once per 2*n_pairs sweeps instead of per sweep.

Tiling: 1D over rows. A tile that outputs rows [r0, r0+T) of the padded
array needs a slab of T + 4*n_pairs rows (each half-sweep consumes one halo
row per side); slabs overlap, so inputs are DMA'd manually from HBM refs
(`memory_space=ANY`) with clamped dynamic offsets. Tiles near the bottom
clamp their output window and overlap the previous tile; overlapping rows
compute identical values from identical global data, so the duplicate
writes are benign.

Separable weights only (every rectangle problem + its coarsenings): the
boundary couplings enter as broadcastable row/column vectors kept in VMEM,
and parity/interior masks come from iotas on the global row index.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def make_rb_pairs(shape: tuple[int, int], wE: np.ndarray, wW: np.ndarray,
                  wN: np.ndarray, wS: np.ndarray, idx2: float, idy2: float,
                  omega: float, n_pairs: int, tile_rows: int = 256,
                  interpret: bool = False):
    """Build pairs(p, b) -> p after ``n_pairs`` red+black sweeps.

    Args:
      shape: padded (H, W) = (ny+2, nx+2).
      wE, wW: (W,) east/west coupling vectors (0 outside interior columns).
      wN, wS: (H,) north/south coupling vectors.
      interpret: run in interpreter mode (CPU tests).
    """
    H, W = shape
    ny, nx = H - 2, W - 2
    halo = 2 * n_pairs
    T = min(tile_rows, H)
    slab = T + 2 * halo
    if slab >= H:
        # small level: single whole-array tile
        T = H
        slab = H
    n_tiles = _cdiv(H, T)

    wE_v = jnp.asarray(wE, jnp.float32).reshape(1, W)
    wW_v = jnp.asarray(wW, jnp.float32).reshape(1, W)
    wN_v = jnp.asarray(wN, jnp.float32).reshape(H, 1)
    wS_v = jnp.asarray(wS, jnp.float32).reshape(H, 1)

    def kernel(p_hbm, b_hbm, we_ref, ww_ref, wn_ref, ws_ref, out_hbm,
               p_s, b_s, o_s, sems):
        i = pl.program_id(0)
        # int32 throughout (x64 mode must not promote index arithmetic)
        r0 = jnp.minimum(i * T, H - T).astype(jnp.int32)  # output rows [r0, r0+T)
        s = jnp.clip(r0 - halo, 0, H - slab).astype(jnp.int32)  # slab rows

        in_p = pltpu.make_async_copy(p_hbm.at[pl.ds(s, slab), :], p_s, sems.at[0])
        in_b = pltpu.make_async_copy(b_hbm.at[pl.ds(s, slab), :], b_s, sems.at[1])
        in_p.start()
        in_b.start()
        in_p.wait()
        in_b.wait()

        grow = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        row_ok = (grow >= 1) & (grow <= ny)
        col_ok = (gcol >= 1) & (gcol <= nx)
        interior = row_ok & col_ok
        even = ((grow + gcol) % 2) == 0

        we = we_ref[:]
        ww = ww_ref[:]
        # gather the slab's rows of the (H,1) column vectors
        wn = wn_ref[pl.ds(s, slab), :]
        ws = ws_ref[pl.ds(s, slab), :]
        denom = idx2 * (we + ww) + idy2 * (wn + ws)
        inv = jnp.where(interior, 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0)
        b = b_s[:]

        def half(p, mask):
            pE = jnp.roll(p, -1, axis=1)
            pW = jnp.roll(p, 1, axis=1)
            pN = jnp.roll(p, -1, axis=0)
            pS = jnp.roll(p, 1, axis=0)
            gs = (idx2 * (we * pE + ww * pW) + idy2 * (wn * pN + ws * pS) - b) * inv
            upd = p + omega * (gs - p)
            return jnp.where(mask, upd, p)

        p = p_s[:]
        # The valid band shrinks by one slab row per half-sweep — except at
        # a physical domain edge, where the dependency chain terminates at
        # never-updated ghost rows, so no shrink is needed on that side.
        local = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        at_bottom = s == 0
        at_top = s + slab == H

        def band(lo):
            lo_eff = jnp.where(at_bottom, 0, lo)
            hi_eff = jnp.where(at_top, slab, slab - lo)
            return (local >= lo_eff) & (local < hi_eff)

        for k in range(n_pairs):
            lo = 2 * k + 1
            p = half(p, interior & even & band(lo))
            p = half(p, interior & ~even & band(lo + 1))
        o_s[:] = jax.lax.dynamic_slice(p, (r0 - s, jnp.int32(0)), (T, W))

        out = pltpu.make_async_copy(o_s, out_hbm.at[pl.ds(r0, T), :], sems.at[2])
        out.start()
        out.wait()

    fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((slab, W), jnp.float32),
            pltpu.VMEM((slab, W), jnp.float32),
            pltpu.VMEM((T, W), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )

    @jax.jit
    def pairs(p, b):
        return fn(p.astype(jnp.float32), b.astype(jnp.float32),
                  wE_v, wW_v, wN_v, wS_v)

    return pairs


def rb_pairs_for_level(level, omega: float, n_pairs: int, interpret: bool = False):
    """Adapter from a multigrid ``_Level`` (separable) to the kernel."""
    if not level.separable:
        raise ValueError("pallas rb smoother requires a separable level")
    H, W = level.shape
    return make_rb_pairs(
        (H, W),
        np.asarray(level.wE).reshape(W),
        np.asarray(level.wW).reshape(W),
        np.asarray(level.wN).reshape(H),
        np.asarray(level.wS).reshape(H),
        level.idx2, level.idy2, omega, n_pairs, interpret=interpret)
