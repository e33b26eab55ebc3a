"""Pallas TPU kernels: fused projection-step stages for rectangle grids.

SURVEY.md section 2.2 native-kernel families 1, 2, 4, 5 in two kernels:

* ``make_predictor_source`` — cavity ghost BCs + MAC predictor (advection +
  diffusion + Forward Euler, cavity-01.cpp:548-603) + Poisson source
  b = (rho/dt) div(u*) (cavity-01.cpp:622-630) in ONE VMEM pass: u and v
  stream from HBM once and us, vs, b stream out once, where the XLA path
  reads u,v for the predictor and re-reads us,vs for the source.
* ``make_corrector`` — pressure-gradient projection (cavity-01.cpp:695-711)
  + cavity ghost BCs rebuilt from the corrected interior: reads us, vs, p
  (+ p_prev) once, writes u2, v2 (+ the next warm-start guess). The carried
  u/v are NOT inputs — see the slim-ghost convention in its docstring.

Same tiling/DMA structure as kernels.rb_smoother: 1D row tiles, overlapping
slabs DMA'd from HBM refs with clamped offsets (multiples of 8), double-
buffered input copies overlapping compute, iota-derived masks (no mask
arrays). Cavity BC rows/columns are applied in-kernel from global-row
iotas, so the BC'd fields are never materialized in HBM.

Bitwise semantics match ops.stencil.predictor / poisson_source /
pressure_correction with bc.lid_cavity_bc (asserted in tests/test_kernels.py
in interpret mode), except the correctors' slim-ghost convention (ghost
entries rebuilt from the corrected interior instead of carrying the
step-start BC values — trajectory-neutral, see make_corrector).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll(a, dj, di):
    """shifted[j, i] = a[j+dj, i+di] on the slab (wraparound rows/cols are
    masked out by the iota conditions of every consumer). Zero shifts are
    skipped: Mosaic rejects the zero-size slice jnp.roll emits for them."""
    if dj:
        a = jnp.roll(a, -dj, axis=0)
    if di:
        a = jnp.roll(a, -di, axis=1)
    return a


def _make_slab_kernel(shape, n_in: int, n_out: int, compute, tile_rows: int,
                      interpret: bool, halo: int = 8,
                      aligned_io: bool = False, scalar_reduce: str | None = None):
    """Shared skeleton: stream ``n_in`` HBM arrays through overlapping row
    slabs, run ``compute(i_tile, slab_start, inputs) -> outputs`` (lists of
    (slab, W) arrays), write back each tile's own rows of ``n_out`` outputs.

    ``scalar_reduce`` ("max" | "sum"): compute returns one extra (slab, W)
    array reduced across tiles into an extra (1, 1) SMEM output (e.g.
    max|b| for the Poisson tolerance, sum(b) for mean removal — without
    re-reading b). The reduction band excludes rows the clamped last tile
    recomputes, so "sum" never double-counts.
    """
    scalar_max = scalar_reduce is not None  # one extra SMEM output
    H, Wp = shape
    H8 = _round_up(H, 8)
    W = _round_up(Wp, 128)
    # Mosaic's scoped-VMEM accounting (16 MB) covers the slab buffers AND the
    # kernel body's live temporaries — measured ~82 bytes per slab cell for
    # these stencil bodies. Shrink the tile adaptively so wide grids
    # (4096^2+) stay inside the budget instead of failing at compile time.
    slab_cap = int(15.0e6 // (82 * W))
    t_cap = max(8, ((slab_cap - 2 * halo) // 8) * 8)
    T = min(_round_up(tile_rows, 8), t_cap, H8)
    if T + 2 * halo >= H8:
        T = H8
    slab = min(T + 2 * halo, H8)
    n_tiles = -(-H8 // T)

    n_hbm_out = n_out + (1 if scalar_max else 0)

    def kernel(*refs):
        in_hbm = refs[:n_in]
        out_hbm = refs[n_in : n_in + n_out]
        smax_ref = refs[n_in + n_out] if scalar_max else None
        k0 = n_in + n_hbm_out
        in_s = refs[k0 : k0 + n_in]
        out_s = refs[k0 + n_in : k0 + n_in + n_out]
        sems = refs[-1]
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
            for k in range(n_in):
                pltpu.make_async_copy(in_hbm[k].at[pl.ds(st, slab), :],
                                      in_s[k].at[sl], sems.at[sl, k]).start()

        @pl.when(i == 0)
        def _():
            start_in(0, slot)

        @pl.when(i + 1 < n_tiles)
        def _():
            start_in(i + 1, nxt)

        for k in range(n_in):
            pltpu.make_async_copy(in_hbm[k].at[pl.ds(s, slab), :],
                                  in_s[k].at[slot], sems.at[slot, k]).wait()

        outs = compute(s, [in_s[k][slot] for k in range(n_in)])
        if scalar_max:
            *outs, red_arr = outs
            grow = s + jax.lax.broadcasted_iota(jnp.int32, red_arr.shape, 0)
            # unique band: the clamped last tile overlaps its predecessor's
            # rows — start after the previous tile's end so "sum" counts
            # each row exactly once ("max" is idempotent but shares this)
            prev_r0 = jnp.minimum((i - 1) * T, H8 - T).astype(jnp.int32)
            start = jnp.where(i > 0, prev_r0 + T, 0)
            own = (grow >= jnp.maximum(r0, start)) & (grow < r0 + T)
            masked = jnp.where(own, red_arr, jnp.zeros_like(red_arr))
            tile_val = jnp.max(masked) if scalar_reduce == "max" else jnp.sum(masked)

            @pl.when(i == 0)
            def _():
                smax_ref[0, 0] = tile_val

            @pl.when(i > 0)
            def _():
                if scalar_reduce == "max":
                    smax_ref[0, 0] = jnp.maximum(smax_ref[0, 0], tile_val)
                else:
                    smax_ref[0, 0] = smax_ref[0, 0] + tile_val
        off = pl.multiple_of((r0 - s).astype(jnp.int32), 8)
        copies = []
        for k in range(n_out):
            out_s[k][slot] = outs[k]
            cp = pltpu.make_async_copy(out_s[k].at[slot, pl.ds(off, T), :],
                                       out_hbm[k].at[pl.ds(r0, T), :],
                                       sems.at[slot, n_in + k])
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_out
    out_shape = [jax.ShapeDtypeStruct((H8, W), jnp.float32)] * n_out
    if scalar_max:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.float32))
    fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_in,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=(
            [pltpu.VMEM((2, slab, W), jnp.float32) for _ in range(n_in)]
            + [pltpu.VMEM((2, slab, W), jnp.float32) for _ in range(n_out)]
            + [pltpu.SemaphoreType.DMA((2, n_in + n_out))]
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False),
    )

    def call(*arrays):
        if aligned_io:
            # caller keeps the state in the (H8, W) aligned layout with
            # zeros beyond the logical grid: no pad/slice layout copies
            outs = fn(*arrays)
            if scalar_max:
                return tuple(outs[:-1]) + (outs[-1][0, 0],)
            return outs
        padded = [jnp.pad(a.astype(jnp.float32), ((0, H8 - H), (0, W - Wp)))
                  for a in arrays]
        outs = fn(*padded)
        sliced = tuple(o[:H, :Wp] for o in outs[:n_out])
        if scalar_max:
            return sliced + (outs[-1][0, 0],)
        return sliced

    return call, (H8, W, slab)


def _cavity_bc_slab(u, v, s, ny, nx, lid, slab, W):
    """Cavity ghost BCs (cavity-01.cpp:523-543) on a slab whose first row is
    global row ``s``: lid u-ghost at j=ny+1, antisymmetric south u-ghost at
    j=0, antisymmetric v side ghosts at i=0 / i=nx+1."""
    grow = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
    # exact index ranges of bc.lid_cavity_bc: u-ghost rows over columns
    # 0..nx, v-ghost columns over rows 0..ny (the corner cells the reference
    # never writes stay untouched)
    u = jnp.where((grow == ny + 1) & (gcol <= nx),
                  2.0 * lid - _roll(u, -1, 0), u)
    u = jnp.where((grow == 0) & (gcol <= nx), -_roll(u, 1, 0), u)
    v = jnp.where((gcol == 0) & (grow <= ny), -_roll(v, 0, 1), v)
    v = jnp.where((gcol == nx + 1) & (grow <= ny), -_roll(v, 0, -1), v)
    return u, v, grow, gcol


def make_predictor_source(shape, coeffs, lid_velocity: float = 1.0,
                          tile_rows: int = 64, interpret: bool = False,
                          aligned_io: bool = False, emit_max_b: bool = False):
    # tile_rows stays 64: the predictor body keeps ~10 slab-sized
    # temporaries live, and Mosaic's scoped-VMEM accounting (16 MB) counts
    # them — 128-row slabs OOM at compile time.
    """pairs (u, v) -> (us, vs, b[, max|b|]) for the cavity rectangle case.

    ``shape`` = padded (ny+2, nx+2); coeffs supplies dx/dy/dt/viscosity/
    density (host scalars, baked into the kernel). ``emit_max_b`` also
    returns the scalar max|b| (the Poisson tolerance base) without a
    separate whole-array reduce pass.
    """
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    nu, dt = coeffs.viscosity, coeffs.dt
    idx, idy = coeffs.idx, coeffs.idy
    idx2, idy2 = coeffs.idx2, coeffs.idy2
    rho_dt = coeffs.density / dt
    lid = lid_velocity

    def compute(s, ins):
        u, v = ins
        slab, W = u.shape
        u, v, grow, gcol = _cavity_bc_slab(u, v, s, ny, nx, lid, slab, W)

        uE, uW, uN, uS = _roll(u, 0, 1), _roll(u, 0, -1), _roll(u, 1, 0), _roll(u, -1, 0)
        vE, vW, vN, vS = _roll(v, 0, 1), _roll(v, 0, -1), _roll(v, 1, 0), _roll(v, -1, 0)

        lap_u = (uE - 2.0 * u + uW) * idx2 + (uN - 2.0 * u + uS) * idy2
        u_e = 0.5 * (u + uE)
        u_w = 0.5 * (uW + u)
        conv_ux = (u_e * u_e - u_w * u_w) * idx
        v_n = 0.5 * (v + vE)
        v_s = 0.5 * (vS + _roll(v, -1, 1))
        u_n = 0.5 * (uN + u)
        u_s = 0.5 * (uS + u)
        conv_uy = (v_n * u_n - v_s * u_s) * idy
        u_star = u + dt * (nu * lap_u - conv_ux - conv_uy)

        lap_v = (vE - 2.0 * v + vW) * idx2 + (vN - 2.0 * v + vS) * idy2
        v_nn = 0.5 * (v + vN)
        v_ss = 0.5 * (vS + v)
        conv_vy = (v_nn * v_nn - v_ss * v_ss) * idy
        u_e2 = 0.5 * (u + uN)
        u_w2 = 0.5 * (uW + _roll(u, 1, -1))
        v_e2 = 0.5 * (v + vE)
        v_w2 = 0.5 * (vW + v)
        conv_vx = (u_e2 * v_e2 - u_w2 * v_w2) * idx
        v_star = v + dt * (nu * lap_v - conv_vy - conv_vx)

        u_valid = (grow >= 1) & (grow <= ny) & (gcol >= 1) & (gcol <= nx - 1)
        v_valid = (grow >= 1) & (grow <= ny - 1) & (gcol >= 1) & (gcol <= nx)
        zero = jnp.zeros_like(u)
        us = jnp.where(u_valid, u_star, zero)
        vs = jnp.where(v_valid, v_star, zero)

        cell = (grow >= 1) & (grow <= ny) & (gcol >= 1) & (gcol <= nx)
        div = (us - _roll(us, 0, -1)) * idx + (vs - _roll(vs, -1, 0)) * idy
        b = jnp.where(cell, rho_dt * div, zero)
        if emit_max_b:
            return [us, vs, b, jnp.abs(b)]
        return [us, vs, b]

    call, _ = _make_slab_kernel(shape, n_in=2, n_out=3, compute=compute,
                                tile_rows=tile_rows, interpret=interpret,
                                aligned_io=aligned_io,
                                scalar_reduce="max" if emit_max_b else None)
    return call


def make_corrector(shape, coeffs, lid_velocity: float = 1.0,
                   tile_rows: int = 64, interpret: bool = False,
                   aligned_io: bool = False, emit_guess: bool = False):
    """(us, vs, p[, p_prev]) -> (u2, v2[, guess]): the rho-multiplied
    cavity projection (cavity-01.cpp:695-711), then the cavity ghost BCs
    applied to the CORRECTED interior.

    Ghost convention (a deliberate, measured deviation from the reference's
    byte layout): the reference leaves invalid faces holding the values the
    step-start BC wrote from the PRE-correction interior; here ghosts are
    rebuilt from the post-correction interior, so the carried ``u``/``v``
    never have to be streamed through the kernel (2 fewer HBM input passes,
    ~8% of the step's corrector traffic at 2048^2). The trajectory is
    unchanged: the next step's fused predictor re-derives every ghost from
    the interior anyway (``_cavity_bc_slab``), wall-normal faces stay 0 in
    both conventions, and stats/VTK/checkpoint consumers read only interior
    cells and wall faces (tests/test_kernels.py pins the equivalence).

    ``emit_guess``: also emit the NEXT step's extrapolated Poisson warm
    start guess = 2 p - p_prev in the same pass (the kernel already reads
    the fresh p; this removes a separate whole-array XLA pass per step)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    cu = coeffs.dt / coeffs.dx * coeffs.density
    cv = coeffs.dt / coeffs.dy * coeffs.density
    lid = lid_velocity

    def compute(s, ins):
        if emit_guess:
            us, vs, p, p_prev = ins
        else:
            us, vs, p = ins
        slab, W = us.shape
        grow = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        u_new = us - cu * (_roll(p, 0, 1) - p)
        v_new = vs - cv * (_roll(p, 1, 0) - p)
        u_valid = (grow >= 1) & (grow <= ny) & (gcol >= 1) & (gcol <= nx - 1)
        v_valid = (grow >= 1) & (grow <= ny - 1) & (gcol >= 1) & (gcol <= nx)
        zero = jnp.zeros_like(us)
        u2 = jnp.where(u_valid, u_new, zero)
        v2 = jnp.where(v_valid, v_new, zero)
        u2, v2, _, _ = _cavity_bc_slab(u2, v2, s, ny, nx, lid, slab, W)
        outs = [u2, v2]
        if emit_guess:
            outs.append(2.0 * p - p_prev)
        return outs

    n_in, n_out = (4, 3) if emit_guess else (3, 2)
    call, _ = _make_slab_kernel(shape, n_in=n_in, n_out=n_out, compute=compute,
                                tile_rows=tile_rows, interpret=interpret,
                                aligned_io=aligned_io)
    return call


def _channel_bc_slab(u, v, s, ny, nx, uin, slab, W):
    """Channel inflow/outflow ghost BCs (channel-01.cpp:513-529) on a slab,
    in the reference's exact update order (the ghost rows read the already-
    updated inlet/outlet columns): inlet u/v, outlet zero-gradient u/v,
    bottom wall v + u-ghost, top wall v + u-ghost."""
    grow = s + jax.lax.broadcasted_iota(jnp.int32, u.shape, 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, u.shape, 1)
    u = jnp.where((gcol == 0) & (grow >= 1) & (grow <= ny),
                  jnp.full_like(u, uin), u)
    v = jnp.where((gcol == 0) & (grow <= ny), jnp.zeros_like(v), v)
    u = jnp.where((gcol == nx) & (grow >= 1) & (grow <= ny), _roll(u, 0, -1), u)
    v = jnp.where((gcol == nx + 1) & (grow <= ny), _roll(v, 0, -1), v)
    v = jnp.where((grow == 0) & (gcol >= 1) & (gcol <= nx), jnp.zeros_like(v), v)
    u = jnp.where((grow == 0) & (gcol <= nx), -_roll(u, 1, 0), u)
    v = jnp.where((grow == ny) & (gcol >= 1) & (gcol <= nx), jnp.zeros_like(v), v)
    u = jnp.where((grow == ny + 1) & (gcol <= nx), -_roll(u, -1, 0), u)
    return u, v, grow, gcol


def _predictor_slab(u, v, coeffs):
    """Shared MAC predictor math on a slab (cavity-01.cpp:548-603 /
    channel-01.cpp:546-603, anisotropic)."""
    nu, dt = coeffs.viscosity, coeffs.dt
    idx, idy = coeffs.idx, coeffs.idy
    idx2, idy2 = coeffs.idx2, coeffs.idy2
    uE, uW, uN, uS = _roll(u, 0, 1), _roll(u, 0, -1), _roll(u, 1, 0), _roll(u, -1, 0)
    vE, vW, vN, vS = _roll(v, 0, 1), _roll(v, 0, -1), _roll(v, 1, 0), _roll(v, -1, 0)
    lap_u = (uE - 2.0 * u + uW) * idx2 + (uN - 2.0 * u + uS) * idy2
    u_e = 0.5 * (u + uE)
    u_w = 0.5 * (uW + u)
    conv_ux = (u_e * u_e - u_w * u_w) * idx
    v_n = 0.5 * (v + vE)
    v_s = 0.5 * (vS + _roll(v, -1, 1))
    u_n = 0.5 * (uN + u)
    u_s = 0.5 * (uS + u)
    conv_uy = (v_n * u_n - v_s * u_s) * idy
    u_star = u + dt * (nu * lap_u - conv_ux - conv_uy)
    lap_v = (vE - 2.0 * v + vW) * idx2 + (vN - 2.0 * v + vS) * idy2
    v_nn = 0.5 * (v + vN)
    v_ss = 0.5 * (vS + v)
    conv_vy = (v_nn * v_nn - v_ss * v_ss) * idy
    u_e2 = 0.5 * (u + uN)
    u_w2 = 0.5 * (uW + _roll(u, 1, -1))
    v_e2 = 0.5 * (v + vE)
    v_w2 = 0.5 * (vW + v)
    conv_vx = (u_e2 * v_e2 - u_w2 * v_w2) * idx
    v_star = v + dt * (nu * lap_v - conv_vy - conv_vx)
    return u_star, v_star


def make_channel_predictor_source(shape, coeffs, inlet_velocity: float = 1.0,
                                  tile_rows: int = 64, interpret: bool = False,
                                  aligned_io: bool = False):
    """(u, v) -> (us, vs, b_raw, sum_b) for the channel ordering
    (channel-01.cpp:365-376): predictor on the BC'd carried state, channel
    BCs applied to the TENTATIVE fields, raw source b = (rho/dt) div(u*)
    plus its interior sum (the caller subtracts the mean, the channel
    compatibility trick channel-01.cpp:620-628, as one cheap fused op)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    idx, idy = coeffs.idx, coeffs.idy
    rho_dt = coeffs.density / coeffs.dt
    uin = inlet_velocity

    def compute(s, ins):
        u, v = ins
        slab, W = u.shape
        grow = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        u_star, v_star = _predictor_slab(u, v, coeffs)
        u_valid = (grow >= 1) & (grow <= ny) & (gcol >= 1) & (gcol <= nx - 1)
        v_valid = (grow >= 1) & (grow <= ny - 1) & (gcol >= 1) & (gcol <= nx)
        zero = jnp.zeros_like(u)
        us = jnp.where(u_valid, u_star, zero)
        vs = jnp.where(v_valid, v_star, zero)
        us, vs, grow, gcol = _channel_bc_slab(us, vs, s, ny, nx, uin, slab, W)
        cell = (grow >= 1) & (grow <= ny) & (gcol >= 1) & (gcol <= nx)
        div = (us - _roll(us, 0, -1)) * idx + (vs - _roll(vs, -1, 0)) * idy
        b = jnp.where(cell, rho_dt * div, zero)
        return [us, vs, b, b]  # last entry feeds the scalar sum

    call, _ = _make_slab_kernel(shape, n_in=2, n_out=3, compute=compute,
                                tile_rows=tile_rows, interpret=interpret,
                                aligned_io=aligned_io, scalar_reduce="sum")
    return call


def make_channel_corrector(shape, coeffs, inlet_velocity: float = 1.0,
                           tile_rows: int = 64, interpret: bool = False,
                           aligned_io: bool = False, emit_guess: bool = True):
    """(us, vs, p[, p_prev]) -> (u2, v2[, guess]): rho-DIVIDED projection
    (channel-01.cpp:693-702) on valid faces, then channel BCs on the
    corrected fields (channel-01.cpp:385-386), plus the next step's
    extrapolated warm-start guess.

    Invalid faces go to 0 before the BC pass instead of keeping the carried
    state (same slim-ghost convention as ``make_corrector``): every entry
    the reference actually carries is either rewritten by the channel BCs
    from the corrected interior here, or is identically 0 for the whole run
    (wall-normal faces, the never-written v top ghost row, corner cells) —
    so the carried u/v never stream through the kernel."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    cu = coeffs.dt / (coeffs.density * coeffs.dx)
    cv = coeffs.dt / (coeffs.density * coeffs.dy)
    uin = inlet_velocity

    def compute(s, ins):
        if emit_guess:
            us, vs, p, p_prev = ins
        else:
            us, vs, p = ins
        slab, W = us.shape
        grow = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        u_new = us - cu * (_roll(p, 0, 1) - p)
        v_new = vs - cv * (_roll(p, 1, 0) - p)
        u_valid = (grow >= 1) & (grow <= ny) & (gcol >= 1) & (gcol <= nx - 1)
        v_valid = (grow >= 1) & (grow <= ny - 1) & (gcol >= 1) & (gcol <= nx)
        zero = jnp.zeros_like(us)
        u2 = jnp.where(u_valid, u_new, zero)
        v2 = jnp.where(v_valid, v_new, zero)
        u2, v2, _, _ = _channel_bc_slab(u2, v2, s, ny, nx, uin, slab, W)
        outs = [u2, v2]
        if emit_guess:
            outs.append(2.0 * p - p_prev)
        return outs

    n_in, n_out = (4, 3) if emit_guess else (3, 2)
    call, _ = _make_slab_kernel(shape, n_in=n_in, n_out=n_out, compute=compute,
                                tile_rows=tile_rows, interpret=interpret,
                                aligned_io=aligned_io)
    return call
