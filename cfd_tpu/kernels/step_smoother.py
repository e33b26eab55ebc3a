"""Pallas TPU kernel: fused EXACT masked smoothing for the backward-facing
step's defect-correction multigrid (fine level).

The masked solver (poisson.multigrid.make_masked_multigrid_poisson) smooths
the finest level with the exact reference operator: per red-black pair it
refreshes the pressure ghosts — channel domain ghosts plus solid-cell
pressure = mean of fluid neighbors (backwards_step-01.cpp:685-740) — then
sweeps the plain 5-point stencil over fluid cells (backwards_step-01.cpp:
872-930). The XLA formulation of that loop lowers to hundreds of small
fusions and dynamic-update-slices per V-cycle (profiled ~1 ms/step of glue
at 2048x256); this kernel runs ``n_pairs`` full ghost+red+black iterations
per HBM round trip of (p, b), exactly like kernels.rb_smoother does for the
separable rectangle levels.

Geometry is the reference's single solid rectangle
``solid = {i <= step_i and j > inlet_j_max}`` (backwards_step-01.cpp:
499-520), so every mask — fluid cells, parity, and the solid-interface
neighbor weights (east face of the solid column, bottom row of the solid
block, the corner with both) — derives from iotas on the global indices; no
mask arrays stream from HBM. Arbitrary rasters stay on the XLA path.

Matches the XLA composition to f32 roundoff (asserted in
tests/test_kernels.py in interpret mode; same masks, same op order — the
only divergence is multiply+add contraction inside the jitted kernel):
``smooth`` matches ``smooth0`` (loop then final ghosts),
``with_residual_field`` additionally emits ``residual0(smooth0(p), b)``
(ghosts re-applied, then ``where(fluid, b - lap, 0)``), and
``with_residual`` emits its max-abs instead — the V-cycle's pre-smooth +
restriction input and post-smooth + tolerance check each collapse to one
kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def make_step_masked_pairs(shape: tuple[int, int], step_i: int,
                           inlet_j_max: int, idx2: float, idy2: float,
                           omega: float, n_pairs: int, tile_rows: int = 128,
                           interpret: bool = False,
                           with_residual: bool = False,
                           with_residual_field: bool = False):
    """Build pairs(p, b) -> p | (p, res_max) | (p, r_field).

    ``shape``: padded logical (ny+2, nx+2). One ghost+red+black iteration per
    pair, with a trailing ghost refresh (the exact ``smooth0`` composition).
    """
    assert not (with_residual and with_residual_field)
    any_res = with_residual or with_residual_field
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    H8 = _round_up(H, 8)
    W = _round_up(Wp, 128)
    denom = 2.0 * (idx2 + idy2)

    # Valid-band consumption per slab: each ghost refresh reads +-1 rows of
    # the rows it rewrites, and each half-sweep reads +-1 rows -> 3 rows per
    # pair, +1 for the trailing ghosts, +2 more for the fused residual
    # (ghosts again, then the 5-point apply). Strict inequality keeps the
    # residual's own-row neighbors inside the valid band.
    shrink = 3 * n_pairs + 1 + (2 if any_res else 0)
    halo = _round_up(shrink + 1, 8)
    slab_cap = int(15.5e6 // (56 * W))
    t_cap = max(8, ((slab_cap - 2 * halo) // 8) * 8)
    T = min(_round_up(tile_rows, 8), t_cap, H8)
    if T + 2 * halo >= H8:
        T = H8
    slab = min(T + 2 * halo, H8)
    n_tiles = -(-H8 // T)

    def kernel(p_hbm, b_hbm, *out_and_scratch):
        r_hbm = r_s = res_ref = None
        if with_residual:
            out_hbm, res_ref, p_s, b_s, sems = out_and_scratch
        elif with_residual_field:
            out_hbm, r_hbm, p_s, b_s, r_s, sems = out_and_scratch
        else:
            out_hbm, p_s, b_s, sems = out_and_scratch
        i = pl.program_id(0)

        def coords(t):
            r0 = pl.multiple_of(jnp.minimum(t * T, H8 - T).astype(jnp.int32), 8)
            s = pl.multiple_of(jnp.clip(r0 - halo, 0, H8 - slab).astype(jnp.int32), 8)
            return r0, s

        r0, s = coords(i)
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
        row_in = (grow >= 1) & (grow <= ny)
        col_in = (gcol >= 1) & (gcol <= nx)
        solid = (gcol <= step_i) & (grow > inlet_j_max)
        fluid = row_in & col_in & ~solid
        even = ((grow + gcol) % 2) == 0
        # solid-interface neighbor weights with the reference's exact
        # predicates (backwards_step-01.cpp:712-731): east needs i < i_max,
        # south needs j > 1; west/north neighbors are never fluid for this
        # geometry (no fluid left of or above the solid block).
        eastw = row_in & col_in & solid & (gcol == step_i) & (gcol < nx)
        southw = row_in & col_in & solid & (grow == inlet_j_max + 1) & (grow > 1)
        cnt = eastw.astype(jnp.float32) + southw.astype(jnp.float32)
        has_nb = cnt > 0
        inv_cnt = jnp.where(has_nb, 1.0 / jnp.where(has_nb, cnt, 1.0), 0.0)

        zero = jnp.zeros((slab, W), jnp.float32)
        b = b_s[slot]

        def ghosts(p):
            # channel domain ghosts (channel-01.cpp:531-541 semantics)
            pE = jnp.roll(p, -1, axis=1)
            p = jnp.where((gcol == 0) & row_in, pE, p)
            p = jnp.where((gcol == nx + 1) & row_in, zero, p)
            pN = jnp.roll(p, -1, axis=0)
            pS = jnp.roll(p, 1, axis=0)
            p = jnp.where((grow == 0) & col_in, pN, p)
            p = jnp.where((grow == ny + 1) & col_in, pS, p)
            # solid-cell pressure = mean of fluid neighbors
            pE = jnp.roll(p, -1, axis=1)
            pS = jnp.roll(p, 1, axis=0)
            avg = (jnp.where(eastw, pE, zero) + jnp.where(southw, pS, zero)) * inv_cnt
            return jnp.where(has_nb, avg, p)

        def half(p, mask):
            pE = jnp.roll(p, -1, axis=1)
            pW = jnp.roll(p, 1, axis=1)
            pN = jnp.roll(p, -1, axis=0)
            pS = jnp.roll(p, 1, axis=0)
            # divide (not reciprocal-multiply) to stay bitwise-equal to the
            # XLA masked half (poisson.multigrid.make_masked_multigrid_poisson)
            gs = (idx2 * (pE + pW) + idy2 * (pN + pS) - b) / denom
            upd = (1.0 - omega) * p + omega * gs
            return jnp.where(mask, upd, p)

        p = p_s[slot]
        local = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        at_bottom = s == 0
        at_top = s + slab >= ny + 2  # slab reaches past the top ghost row

        def band(lo):
            lo_eff = jnp.where(at_bottom, 0, lo)
            hi_eff = jnp.where(at_top, slab, slab - lo)
            return (local >= lo_eff) & (local < hi_eff)

        k = 0
        for _ in range(n_pairs):
            k += 1
            p = jnp.where(band(k), ghosts(p), p)
            k += 1
            p = half(p, fluid & even & band(k))
            k += 1
            p = half(p, fluid & ~even & band(k))
        k += 1
        p = jnp.where(band(k), ghosts(p), p)
        if any_res:
            pg = jnp.where(band(k + 1), ghosts(p), p)
            pE = jnp.roll(pg, -1, axis=1)
            pW = jnp.roll(pg, 1, axis=1)
            pN = jnp.roll(pg, -1, axis=0)
            pS = jnp.roll(pg, 1, axis=0)
            lap = (pE - 2.0 * pg + pW) * idx2 + (pN - 2.0 * pg + pS) * idy2
            r = jnp.where(fluid, b - lap, zero)
            if with_residual:
                own = (grow >= r0) & (grow < r0 + T)
                tile_max = jnp.max(jnp.where(own, jnp.abs(r), zero))

                @pl.when(i == 0)
                def _():
                    res_ref[0, 0] = tile_max

                @pl.when(i > 0)
                def _():
                    res_ref[0, 0] = jnp.maximum(res_ref[0, 0], tile_max)
            else:
                r_s[slot] = r
        p_s[slot] = p
        off = pl.multiple_of((r0 - s).astype(jnp.int32), 8)
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

    out_shape = jax.ShapeDtypeStruct((H8, W), jnp.float32)
    out_specs = pl.BlockSpec(memory_space=pl.ANY)
    scratch = [
        pltpu.VMEM((2, slab, W), jnp.float32),
        pltpu.VMEM((2, slab, W), jnp.float32),
    ]
    n_sems = 3
    if with_residual:
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), jnp.float32))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pltpu.SMEM))
    elif with_residual_field:
        out_shape = (out_shape, jax.ShapeDtypeStruct((H8, W), jnp.float32))
        out_specs = (out_specs, pl.BlockSpec(memory_space=pl.ANY))
        scratch.append(pltpu.VMEM((2, slab, W), jnp.float32))
        n_sems = 4
    fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((2, n_sems))],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )

    @jax.jit
    def pairs(p, b):
        p8 = jnp.pad(p.astype(jnp.float32), ((0, H8 - H), (0, W - Wp)))
        b8 = jnp.pad(b.astype(jnp.float32), ((0, H8 - H), (0, W - Wp)))
        if with_residual:
            out, res = fn(p8, b8)
            return out[:H, :Wp], res[0, 0]
        if with_residual_field:
            out, r = fn(p8, b8)
            return out[:H, :Wp], r[:H, :Wp]
        return fn(p8, b8)[:H, :Wp]

    return pairs
