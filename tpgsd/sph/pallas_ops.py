"""Pallas TPU kernels for the SPH pair-interaction hot loops.

Design (TPU-first, not a translation of any reference code):

The cell grid is x-major (``c = ix*ny*nz + iy*nz + iz``), so the 27
neighbor cells of a *contiguous block* of cells fall into 9 contiguous
windows (one per (dx, dy) pair, covering dz in {-1,0,1}).  Each kernel
program therefore:

1. DMAs 9 contiguous ``[B+2, K]``-cell windows of the SoA field arrays
   from HBM into VMEM - replacing the random-gather ``dense_x[nbr]`` of
   the jnp path with pure sequential DMA traffic,
2. computes all 27 offset interactions as ``[B, K, K]`` broadcasted
   elementwise blocks on the VPU (the pair FLOPs have contraction depth
   3, so the VPU - not the MXU - is the right unit), accumulating
   density / acceleration in VMEM,
3. writes one ``[B, K]`` output block.

Geometry validity (does cell ``c + offset`` wrap around a grid face?) is
recomputed in-kernel from the cell coordinates - branch-free integer
arithmetic instead of the jnp path's sentinel-row neighbor table.

Layout: fields are passed SoA as ``[F, C_padded, K]`` so the lane
(last) dimension is the cell capacity K - pad K to a multiple of 128
for full lane utilization (default capacity 64 = half lanes, still far
better than the AoS ``[..., 3]`` layout's 3/128).

Zero padding of ``P = ny*nz + nz + 1`` cells on both sides of the cell
axis absorbs all negative/overflow window starts; padded cells carry
mask 0 and never contribute.

STATUS (measured on v5e with FORCED completion - block_until_ready is
unreliable on tunneled runtimes; round-3 numbers include the MXU
factorization of the pair contractions - see _accel_kernel_packed's
docstring - plus the search-free cell build and the octet-row SoA
layout in tpgsd.sph.cells, on top of round 2's occupancy skip flags,
one-DMA-per-window mask plane, block 16, and scatter-free cell layout):

* 100k dam break, `capacity="auto"` (48, ragged f=2 packing):
  **pallas 34.9 ms/step vs jnp 50.4 - 1.44x** (round 2: 46.5 vs 57.6).
  1M particles: **375.4 ms/step vs jnp 638.5 - 1.70x** (round 2:
  507.8); per-particle scaling efficiency 1M/100k = 93% - the
  profiled super-linear term was XLA-side layout machinery (thin
  gathers + a searchsorted while-loop), NOT the kernels, which scale
  exactly linearly (222 ns and 104 ns per particle at both sizes).
* MXU matmuls inside the pair kernels MUST use
  ``precision=HIGHEST``: the Mosaic default truncates inputs to bf16,
  which costs ~3 digits (measured 6.6e-2 relative error vs 2.7e-5 at
  HIGHEST; an XLA-side jnp einsum cross-check silently agrees with the
  wrong result because it defaults to bf16 too).  ``Precision.HIGH``
  does not lower.
* block 16 wins at every size measured; 24+ stalls the Mosaic compile
  (and a killed client leaves the terminal-side compile helper wedged
  on the stalled job - do not retry on a live tunnel).
* the deeper packings (f >= 4) are PROVEN with the MXU-factorized
  kernels (1.46x at K=32/100k, 1.89x at K=24/6.4k, parity 1e-5);
  `supported()` admits 24 <= K <= 64.  K=16 (f=8) stalls the compile
  and sits below any realistic 3-D occupancy, so it stays off.
* the TWO-TIER SPILL layout (main tier K=32 sized to the typical
  occupancy + equal spill tier for the rare dense cells, see
  ``density_spill``/``accel_spill``) beats the single-tier auto K=48:
  100k dam break **21.5 ms/step (1.68x)**, 1M **261.6 ms (1.50x)**,
  12.5k 2.96 ms (1.36x) from the lattice start (spill tier empty);
  at the late-run sloshing state (spill occupied, ~20% of windows
  dirty, fluid spread over the whole domain so both paths lose their
  empty-block skips) still 68.1 -> 46.8 ms (1.45x).  Parity vs
  single-tier 2K: 2e-7 rho / 3e-6 v.  Composes with ``wrap_axes``
  (both tiers ride the same pre-shifted ghost halo).
* the viscosity divide runs as the VPU's APPROXIMATE reciprocal
  (``pl.reciprocal(den, approx=True)``, ~1e-5 rel err on the
  eps-regularized O(alpha) artificial term): 1M single-tier 391.3 ->
  **371.7 ms** (-5%), 1M spill 261.6 -> **249.9 ms**, 100k spill
  21.5 -> 21.0; step-level parity vs the jnp path 9e-6 relative (v).

Both kernels are fully unrolled with static window slices - fori_loop /
dynamic-slice variants measured 3-5x slower.  The accel body needs
~44 MB of VMEM scoped stack (`vmem_limit_bytes` raised accordingly);
v5e carries 128 MB of VMEM per core.  Ref slicing inside kernels must
use non-negative static indices - negative indices crash the Mosaic
LLO lowering (lower_to_llo.cc Check d >> 32 == 0).
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import WendlandC2

DEFAULT_BLOCK = 16


def _round_up(v, m):
    return -(-v // m) * m


def _geometry(grid, block):
    """Static geometry: padding, window offsets, block count.

    TPU DMA alignment: sliced copies must be lane-aligned (last dim a
    multiple of 128) and sublane-aligned (second-to-last dim slices at
    multiples of 8).  The lane axis (cell capacity K) is zero-padded to
    128; window starts are rounded down to 8-cell boundaries with a
    static per-window ``extra`` offset consumed by the in-kernel slices
    (the start of window w is ``i*B + pad + wstart_w``, and with B a
    multiple of 8 its residue mod 8 is static per window).
    """
    if block % 8 != 0:
        raise ValueError("pallas block must be a multiple of 8")
    nx, ny, nz = grid.dims
    c = grid.n_cells
    pad = ny * nz + nz + 1  # max |offset| = +-(ny*nz + nz + 1)
    nblocks = -(-c // block)
    # window start offsets relative to the block's first (padded) cell:
    # for (dx, dy), cells [c0 + dx*ny*nz + dy*nz - 1, ... + B + 1)
    wstarts = [
        dx * ny * nz + dy * nz - 1 for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ]
    # aligned window starts (relative to the padded array) and the
    # static in-window offsets; one uniform padded window length
    extras = [(pad + ws) % 8 for ws in wstarts]
    astarts = [pad + ws - e for ws, e in zip(wstarts, extras)]
    wlen = _round_up(block + 2 + 7, 8)
    cp = pad + nblocks * block + pad + wlen  # slack for aligned windows
    kp = _round_up(grid.capacity, 128)
    return nx, ny, nz, c, pad, nblocks, cp, astarts, extras, wlen, kp


def _pad_cells_to(arr, c, pad, cp, kp):
    """Zero-pad ``[..., C, K]`` to ``[..., cp, kp]``."""
    trail = cp - pad - c
    lane = kp - arr.shape[-1]
    widths = [(0, 0)] * (arr.ndim - 2) + [(pad, trail), (0, lane)]
    return jnp.pad(arr[..., :c, :], widths)


def _soa(dense, c, pad, cp, kp):
    """``[C(+1), K, F]`` AoS -> ``[F, Cp, Kp]`` SoA, zero-padded."""
    soa = jnp.moveaxis(dense[:c], -1, 0)  # [F, C, K]
    return _pad_cells_to(soa, c, pad, cp, kp)


def _cell_coords(c0, block, ny, nz):
    """Per-block-cell (ix, iy, iz), shape ``[B, 1]`` each (2-D for TPU)."""
    cid = c0 + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    ix = cid // (ny * nz)
    rem = cid - ix * (ny * nz)
    iy = rem // nz
    iz = rem - iy * nz
    return ix, iy, iz


def _offset_valid(ix, iy, iz, dx, dy, dz, nx, ny, nz):
    """``[B, 1]`` float validity of neighbor offset (dx,dy,dz)."""
    ok = (
        (ix + dx >= 0)
        & (ix + dx < nx)
        & (iy + dy >= 0)
        & (iy + dy < ny)
        & (iz + dz >= 0)
        & (iz + dz < nz)
    )
    return ok.astype(jnp.float32)


def _start_window_dmas(src, dst, sem, sem_base, base, astarts, wlen):
    """Start one DMA per (dx, dy) window: ``src[..., start:start+wlen, :]``
    into ``dst[w]``; starts are 8-aligned (``base`` is a multiple of 8,
    ``astarts`` are pre-aligned).  Returns the copies for waiting."""
    copies = []
    for w, astart in enumerate(astarts):
        start = pl.multiple_of(base + astart, 8)
        if src.ndim == 3:
            cp_ = pltpu.make_async_copy(
                src.at[:, pl.ds(start, wlen), :], dst.at[w], sem.at[sem_base + w]
            )
        else:
            cp_ = pltpu.make_async_copy(
                src.at[pl.ds(start, wlen), :], dst.at[w], sem.at[sem_base + w]
            )
        cp_.start()
        copies.append(cp_)
    return copies


def _density_kernel(
    flags_ref, xm_hbm, rho_ref, xw, sems, *, grid, params, kernel, block
):
    nx, ny, nz = grid.dims
    _, _, _, _, pad, _, _, astarts, extras, wlen, kp = _geometry(grid, block)
    # WendlandC2 fast path + MXU reduction (see _density_kernel_packed)
    inv2h = 0.5 / params.h
    invh2 = 2.0 / params.h
    mfold = params.mass * (
        kernel._sigma(params.h, params.dim) if kernel is WendlandC2 else 1.0
    )

    i = pl.program_id(0)
    base = i * block  # multiple of 8; astarts carry the pad

    # occupancy-driven sparsity (see _block_flags / the packed kernels)
    @pl.when(flags_ref[i] & 1 == 0)
    def _empty():
        rho_ref[:] = jnp.zeros((block, kp), jnp.float32)

    @pl.when(flags_ref[i] & 1 != 0)
    def _occupied():
        # mask rides as the last field plane: ONE DMA per window
        for c_ in _start_window_dmas(xm_hbm, xw, sems, 0, base, astarts, wlen):
            c_.wait()

        ix, iy, iz = _cell_coords(i * block, block, ny, nz)

        # center block = middle window (dx=0, dy=0), dz=0 slice
        e4 = extras[4]
        xc = xw[4, :3, e4 + 1 : e4 + 1 + block]  # [3, B, Kp]
        mc = xw[4, 3, e4 + 1 : e4 + 1 + block]  # [B, Kp]

        # fully unrolled 27-offset pair loop with static window slices:
        # the density body is small enough for the VMEM scoped stack, and
        # the unrolled form measures ~3x faster than a fori_loop over
        # scratch (matching the XLA-fused jnp path)
        rho_ref[:] = jnp.zeros((block, kp), jnp.float32)
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        for w, (dx, dy) in enumerate(offs):
            e = extras[w]

            @pl.when((flags_ref[i] >> (1 + w)) & 1 != 0)
            def _window(w=w, dx=dx, dy=dy, e=e):
                acc = jnp.zeros((block, 1, kp), jnp.float32)
                for dz in (-1, 0, 1):
                    yb = xw[w, :3, e + 1 + dz : e + 1 + dz + block]  # [3,B,Kp]
                    ym = xw[w, 3, e + 1 + dz : e + 1 + dz + block]  # [B, Kp]
                    valid = _offset_valid(ix, iy, iz, dx, dy, dz, nx, ny, nz)
                    pm = ym * valid  # [B, Kp]
                    ddx = xc[0][:, :, None] - yb[0][:, None, :]  # [B, Kp, Kp]
                    ddy = xc[1][:, :, None] - yb[1][:, None, :]
                    ddz = xc[2][:, :, None] - yb[2][:, None, :]
                    r = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                    if kernel is WendlandC2:
                        t = jnp.maximum(1.0 - inv2h * r, 0.0)
                        t2 = t * t
                        wv = (t2 * t2) * (invh2 * r + 1.0)
                    else:
                        wv = kernel.w(r, params.h, dim=params.dim)
                    acc = acc + jax.lax.dot_general(
                        pm[:, None, :], wv, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 1, Kp]
                rho_ref[:] += acc[:, 0]
        rho_ref[:] = mfold * rho_ref[:] * mc


def _accel_kernel(
    flags_ref, f_hbm, ax_ref, ay_ref, az_ref, fw, sems,
    *, grid, params, kernel, block
):
    """Acceleration over all 27 offsets: fully unrolled pair loop with
    static window slices (fori/dynamic-slice variants measured 3-5x
    slower), occupancy-flag-gated like the density kernel.

    Same MXU factorization as :func:`_accel_kernel_packed` (see its
    docstring): vdotx via a K=6 cross matmul, the output reduction as
    ``xc*S0 - S1`` with the mask folded into the reduction matrix,
    constants folded at prep time, block-local coordinates.

    f_hbm: ``[9, Cp, Kp]`` SoA fields (x,y,z, vx,vy,vz, rho,
    cfold*p/rho^2, mask) - the mask rides as the last plane so each
    window is ONE DMA.
    """
    nx, ny, nz = grid.dims
    _, _, _, _, pad, _, _, astarts, extras, wlen, kp = _geometry(grid, block)
    h2eps = params.eps * params.h * params.h
    cfold, cv = _accel_folds(params, kernel)
    inv2h = 0.5 / params.h

    i = pl.program_id(0)
    base = i * block

    @pl.when(flags_ref[i] & 1 == 0)
    def _empty():
        zero = jnp.zeros((block, kp), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero

    @pl.when(flags_ref[i] & 1 != 0)
    def _occupied():
        for c_ in _start_window_dmas(f_hbm, fw, sems, 0, base, astarts, wlen):
            c_.wait()

        ix, iy, iz = _cell_coords(i * block, block, ny, nz)

        # block-local origin: first cell's x/y corner, domain z-midpoint
        c00 = i * block
        ix0 = c00 // (ny * nz)
        rem0 = c00 - ix0 * (ny * nz)
        tx = grid.lo[0] + grid.cell_size * ix0.astype(jnp.float32)
        ty = grid.lo[1] + grid.cell_size * (rem0 // nz).astype(jnp.float32)
        tz = grid.lo[2] + grid.cell_size * (0.5 * nz)

        e4 = extras[4]
        cen = fw[4, :8, e4 + 1 : e4 + 1 + block]  # [8, B, Kp]
        mc = fw[4, 8, e4 + 1 : e4 + 1 + block]

        xcl = (cen[0] - tx, cen[1] - ty, cen[2] - tz)
        rho_c = cen[6]
        ptc = cen[7]  # pre-scaled cfold*p/rho^2
        ccc = cen[3] * xcl[0] + cen[4] * xcl[1] + cen[5] * xcl[2]
        a6 = jnp.stack(
            [xcl[0], xcl[1], xcl[2], cen[3], cen[4], cen[5]], axis=1
        )  # [B, 6, Kp]

        zero = jnp.zeros((block, kp), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero
        for w in range(9):
            dx, dy = w // 3 - 1, w % 3 - 1
            e = extras[w]

            @pl.when((flags_ref[i] >> (1 + w)) & 1 != 0)
            def _window(w=w, dx=dx, dy=dy, e=e):
                sacc = jnp.zeros((block, 4, kp), jnp.float32)
                for dz in (-1, 0, 1):
                    nb = fw[w, :8, e + 1 + dz : e + 1 + dz + block]  # [8,B,Kp]
                    ym = fw[w, 8, e + 1 + dz : e + 1 + dz + block]
                    valid = _offset_valid(ix, iy, iz, dx, dy, dz, nx, ny, nz)
                    pm = ym * valid  # [B, Kp]

                    xnl0 = nb[0] - tx
                    xnl1 = nb[1] - ty
                    xnl2 = nb[2] - tz
                    ccn = nb[3] * xnl0 + nb[4] * xnl1 + nb[5] * xnl2
                    b6 = jnp.stack(
                        [nb[3], nb[4], nb[5], xnl0, xnl1, xnl2], axis=1
                    )
                    cross = jax.lax.dot_general(
                        a6, b6, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, Kp, Kp]

                    ddx = xcl[0][:, :, None] - xnl0[:, None, :]
                    ddy = xcl[1][:, :, None] - xnl1[:, None, :]
                    ddz = xcl[2][:, :, None] - xnl2[:, None, :]
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    r = jnp.sqrt(r2)
                    if kernel is WendlandC2:
                        t = jnp.maximum(1.0 - inv2h * r, 0.0)
                        t3 = t * t * t
                    else:
                        t3 = -kernel.dw_over_r(r, params.h, dim=params.dim)

                    vdotx = ccc[:, :, None] + ccn[:, None, :] - cross
                    press = ptc[:, :, None] + nb[7][:, None, :]
                    den = (r2 + h2eps) * (rho_c[:, :, None] + nb[6][:, None, :])
                    # the viscosity divide runs as the VPU's approximate reciprocal
                    # (~1e-5 rel err on an O(alpha) artificial term whose
                    # denominator is itself eps-regularized; den > 0 always).
                    # Skipping the Newton refinement measures on the
                    # pair-math critical path - see the STATUS block.
                    scale = (
                        press
                        + cv * jnp.minimum(vdotx, 0.0)
                        * pl.reciprocal(den, approx=True)
                    ) * t3

                    n4 = jnp.stack(
                        [pm, pm * xnl0, pm * xnl1, pm * xnl2], axis=1
                    )  # [B, 4, Kp]
                    sacc = sacc + jax.lax.dot_general(
                        n4, scale, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 4, Kp]
                ax_ref[:] += xcl[0] * sacc[:, 0] - sacc[:, 1]
                ay_ref[:] += xcl[1] * sacc[:, 0] - sacc[:, 2]
                az_ref[:] += xcl[2] * sacc[:, 0] - sacc[:, 3]

        ax_ref[:] = ax_ref[:] * mc
        ay_ref[:] = ay_ref[:] * mc
        az_ref[:] = az_ref[:] * mc


def _accel_drho_kernel(
    flags_ref, f_hbm, ax_ref, ay_ref, az_ref, dr_ref, fw, sems,
    *, grid, params, kernel, block, delta_sph
):
    """Fused momentum + continuity pair pass: :func:`_accel_kernel`
    plus a drho/dt output, the Pallas form of
    ``tpgsd.sph.step._accel_drho_blocks`` (continuity-density mode).

    The continuity equation shares every pair term the momentum
    equation computes: ``drho_i/dt = m sum_j dwr vdotx`` reuses the
    kernel's ``t3`` and the MXU-factorized ``vdotx``, so the extra cost
    is ONE more [B, Kp, Kp] pair matrix and one matvec reduction per
    window slice.  ``delta_sph > 0`` folds the Molteni-Colagrossi
    diffusion term into the same pair matrix (``2 delta h c0`` relative
    to the continuity constant; the shared ``m dw_const`` scales the
    reduced output once).  Neighbor rho is floored at ``0.1 rho0``
    before its approximate reciprocal so zero-padded cells stay finite
    (they are masked out of the reduction anyway).
    """
    nx, ny, nz = grid.dims
    _, _, _, _, pad, _, _, astarts, extras, wlen, kp = _geometry(grid, block)
    h2eps = params.eps * params.h * params.h
    cfold, cv = _accel_folds(params, kernel)
    inv2h = 0.5 / params.h
    # drho = m dwr vdotx + dcoef (rho_c-rho_n)/rho_n dwr r2/(r2+eta2);
    # with dwr = dw_const * t3 both terms share A = m*dw_const = -cfold
    # (cfold folds |dw_const|*m for WendlandC2 and m for generic
    # kernels whose t3 is already -dw_over_r), so the pair matrix is
    # t3*(vdotx + ddfold*...) and A scales the reduced sum once
    adrho = -cfold
    # the jnp path's dcoef = 2 delta h c0 m; the shared m*dw_const is
    # adrho, so only 2 delta h c0 remains inside the pair bracket
    ddfold = 2.0 * delta_sph * params.h * params.c0
    eta2 = (0.1 * params.h) ** 2
    rho_floor = 0.1 * params.rho0

    i = pl.program_id(0)
    base = i * block

    @pl.when(flags_ref[i] & 1 == 0)
    def _empty():
        zero = jnp.zeros((block, kp), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero
        dr_ref[:] = zero

    @pl.when(flags_ref[i] & 1 != 0)
    def _occupied():
        for c_ in _start_window_dmas(f_hbm, fw, sems, 0, base, astarts, wlen):
            c_.wait()

        ix, iy, iz = _cell_coords(i * block, block, ny, nz)

        c00 = i * block
        ix0 = c00 // (ny * nz)
        rem0 = c00 - ix0 * (ny * nz)
        tx = grid.lo[0] + grid.cell_size * ix0.astype(jnp.float32)
        ty = grid.lo[1] + grid.cell_size * (rem0 // nz).astype(jnp.float32)
        tz = grid.lo[2] + grid.cell_size * (0.5 * nz)

        e4 = extras[4]
        cen = fw[4, :8, e4 + 1 : e4 + 1 + block]  # [8, B, Kp]
        mc = fw[4, 8, e4 + 1 : e4 + 1 + block]

        xcl = (cen[0] - tx, cen[1] - ty, cen[2] - tz)
        rho_c = cen[6]
        ptc = cen[7]  # pre-scaled cfold*p/rho^2
        ccc = cen[3] * xcl[0] + cen[4] * xcl[1] + cen[5] * xcl[2]
        a6 = jnp.stack(
            [xcl[0], xcl[1], xcl[2], cen[3], cen[4], cen[5]], axis=1
        )  # [B, 6, Kp]

        zero = jnp.zeros((block, kp), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero
        dr_ref[:] = zero
        for w in range(9):
            dx, dy = w // 3 - 1, w % 3 - 1
            e = extras[w]

            @pl.when((flags_ref[i] >> (1 + w)) & 1 != 0)
            def _window(w=w, dx=dx, dy=dy, e=e):
                sacc = jnp.zeros((block, 4, kp), jnp.float32)
                sdr = jnp.zeros((block, 1, kp), jnp.float32)
                for dz in (-1, 0, 1):
                    nb = fw[w, :8, e + 1 + dz : e + 1 + dz + block]  # [8,B,Kp]
                    ym = fw[w, 8, e + 1 + dz : e + 1 + dz + block]
                    valid = _offset_valid(ix, iy, iz, dx, dy, dz, nx, ny, nz)
                    pm = ym * valid  # [B, Kp]

                    xnl0 = nb[0] - tx
                    xnl1 = nb[1] - ty
                    xnl2 = nb[2] - tz
                    ccn = nb[3] * xnl0 + nb[4] * xnl1 + nb[5] * xnl2
                    b6 = jnp.stack(
                        [nb[3], nb[4], nb[5], xnl0, xnl1, xnl2], axis=1
                    )
                    cross = jax.lax.dot_general(
                        a6, b6, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, Kp, Kp]

                    ddx = xcl[0][:, :, None] - xnl0[:, None, :]
                    ddy = xcl[1][:, :, None] - xnl1[:, None, :]
                    ddz = xcl[2][:, :, None] - xnl2[:, None, :]
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    r = jnp.sqrt(r2)
                    if kernel is WendlandC2:
                        t = jnp.maximum(1.0 - inv2h * r, 0.0)
                        t3 = t * t * t
                    else:
                        t3 = -kernel.dw_over_r(r, params.h, dim=params.dim)

                    vdotx = ccc[:, :, None] + ccn[:, None, :] - cross
                    press = ptc[:, :, None] + nb[7][:, None, :]
                    den = (r2 + h2eps) * (rho_c[:, :, None] + nb[6][:, None, :])
                    scale = (
                        press
                        + cv * jnp.minimum(vdotx, 0.0)
                        * pl.reciprocal(den, approx=True)
                    ) * t3

                    # continuity pair matrix: vdotx (+ delta-SPH
                    # diffusion) under the shared t3
                    if delta_sph > 0.0:
                        rho_n = jnp.maximum(nb[6], rho_floor)
                        diff = (
                            ddfold
                            * (rho_c[:, :, None] - rho_n[:, None, :])
                            * pl.reciprocal(rho_n, approx=True)[:, None, :]
                            * r2
                            * pl.reciprocal(r2 + eta2, approx=True)
                        )
                        scale2 = t3 * (vdotx + diff)
                    else:
                        scale2 = t3 * vdotx

                    n4 = jnp.stack(
                        [pm, pm * xnl0, pm * xnl1, pm * xnl2], axis=1
                    )  # [B, 4, Kp]
                    sacc = sacc + jax.lax.dot_general(
                        n4, scale, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 4, Kp]
                    # 1-row batched matmul (same MXU form as the
                    # momentum reduction): a [B,Kp,Kp]x[B,Kp] matvec
                    # lowers to vector.multi_reduction, which Mosaic
                    # rejects
                    sdr = sdr + jax.lax.dot_general(
                        pm[:, None, :], scale2, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 1, Kp]
                ax_ref[:] += xcl[0] * sacc[:, 0] - sacc[:, 1]
                ay_ref[:] += xcl[1] * sacc[:, 0] - sacc[:, 2]
                az_ref[:] += xcl[2] * sacc[:, 0] - sacc[:, 3]
                dr_ref[:] += sdr[:, 0]

        ax_ref[:] = ax_ref[:] * mc
        ay_ref[:] = ay_ref[:] * mc
        az_ref[:] = az_ref[:] * mc
        dr_ref[:] = dr_ref[:] * (mc * adrho)


# ---------------------------------------------------------------------------
# Packed sub-128 variant: f = 128 // K z-adjacent cells share one 128-lane row
#
# At capacity K < 128 the plain kernels pad the lane axis K -> 128 and waste
# (128/K)^2 - 1 of the pair math.  Here the dense [C, K] layout is repacked to
# [C/f, 128] rows of f consecutive-z cells (nz zero-padded to a multiple of f
# so a row never crosses a z-column boundary: every cell in a row shares
# (ix, iy), iz differs by the lane's half index h = lane // K).
#
# The pair-validity mask then factorizes cheaply.  For window (dx, dy) the
# packed row offset is off'/f + (j - 1), j in {0,1,2}, and the candidate
# z-offset between center lane half hc and neighbor lane half hn is
# dz = f*(j-1) + hn - hc.  Two observations make the mask ~2 multiplies:
#
# * dz depends only on (j, hn - hc)  =>  "dz in {-1,0,1}" is a STATIC
#   [128, 128] band matrix D_j (three distinct matrices, c0 = f*(j-1)).
# * the neighbor z coordinate iz_base + hc + dz = iz_base + c0 + hn is
#   independent of hc  =>  z-bounds validity is a [B, 128] mask on the
#   neighbor side only; the x/y carry checks are per-row [B, 1] scalars
#   (shared by the whole row since (ix, iy) are row-uniform).
#
# Per (dx,dy) the unpacked kernel runs 3 slices at 1/f^2 lane utilization;
# the packed kernel runs 3 slices covering f cells each at (3f + f^2 - ...)
# >= 1/2 utilization for f=2 - a ~f x reduction in pair math per cell.
# ---------------------------------------------------------------------------


def _packed_geometry(grid, block):
    """Static geometry of the packed layout (see module comment above).

    Works for ANY capacity K <= 64: f = 128 // K cells share a row; when
    f*K < 128 (K not dividing 128, e.g. the occupancy-matched sizes 48 /
    40 / 24) the remaining lanes are zero-mask padding - the row is
    "ragged" but every mask/validity term already kills dead lanes.
    """
    if block % 8 != 0:
        raise ValueError("pallas block must be a multiple of 8")
    k = grid.capacity
    if k > 64:
        raise ValueError("packed path needs capacity <= 64, got %d" % k)
    f = 128 // k
    nx, ny, nz = grid.dims
    nzp = _round_up(nz, f)
    rows = nx * ny * nzp // f
    nblocks = -(-rows // block)
    # packed-row window starts: off' = dx*ny*nzp + dy*nzp is always a
    # multiple of f, so each (dx, dy) needs rows off'/f - 1 .. off'/f + 1
    rls = [
        (dx * ny * nzp + dy * nzp) // f - 1
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ]
    pad_r = (ny * nzp + nzp) // f + 2
    extras = [(pad_r + rl) % 8 for rl in rls]
    astarts = [pad_r + rl - e for rl, e in zip(rls, extras)]
    wlen = _round_up(block + 2 + 7, 8)
    cp_r = pad_r + nblocks * block + pad_r + wlen
    return f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen


def _pack_dense(arr, grid, f, nzp, pad_r, cp_r):
    """``[..., C(+1), K]`` -> packed padded ``[..., cp_r, 128]``.

    Ragged rows (f*K < 128) zero-pad the trailing lanes.
    """
    nx, ny, nz = grid.dims
    k = grid.capacity
    c = grid.n_cells
    lead = arr.shape[:-2]
    a = arr[..., :c, :].reshape(lead + (nx, ny, nz, k))
    if nzp != nz:
        widths = [(0, 0)] * len(lead) + [(0, 0), (0, 0), (0, nzp - nz), (0, 0)]
        a = jnp.pad(a, widths)
    rows = nx * ny * nzp // f
    a = a.reshape(lead + (rows, f * k))
    trail = cp_r - pad_r - rows
    widths = [(0, 0)] * len(lead) + [(pad_r, trail), (0, 128 - f * k)]
    return jnp.pad(a, widths)


def _unpack_rows(out, grid, f, nzp, rows):
    """Packed ``[>=rows, 128]`` kernel output -> ``[n_cells, K]``."""
    nx, ny, nz = grid.dims
    k = grid.capacity
    a = out[:rows, : f * k].reshape(nx, ny, nzp, k)[:, :, :nz]
    return a.reshape(grid.n_cells, k)


def _lane_half_vectors(k):
    """In-kernel [1,128] / band-builder pieces (Pallas kernels may not
    capture host array constants, so these are built from iotas)."""
    a_n = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // k  # [1,128]
    hc = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // k
    hn = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // k
    return a_n, hn - hc


def _band_matrix(c0, dh):
    """[128,128] float32: 1 where c0 + h(ln) - h(lc) in {-1,0,1}."""
    return (jnp.abs(c0 + dh) <= 1).astype(jnp.float32)


def _packed_slices(buf, w, e, block, f, k, izb, a_n, dh, nzp):
    """Yield (fields, mask, D, zn) pair-slices for window ``w``.

    ``buf`` is the window scratch ``[9, P+1, wlen, 128]`` whose LAST
    plane is the mask - mask rides the same DMA as the fields (one copy
    per window instead of two; the issue/wait overhead of the second
    stream measures, the bytes don't).

    ``D`` is the static lane-quadrant validity (None = all-valid);
    ``zn`` the [B, 128] neighbor z coordinate to bounds-check.

    Two slices per window at EVERY packing depth f:

    * the middle row (j=1), where the valid (hc, hn) quadrants are the
      |hn - hc| <= 1 band (all of them when f == 2);
    * one composite of the two outer rows.  A row boundary is only ever
      crossed by the extreme halves - for j=0 (offset -f) the single
      valid quadrant is (hc=0, hn=f-1), for j=2 (offset +f) it is
      (hc=f-1, hn=0) - so lanes [0:K) take the j=2 row's first half and
      lanes [K:) the j=0 row's tail, cutting 27 slices to 18.  This
      merge is the difference between losing and beating the XLA path
      at capacity 64, and it generalizes verbatim to f >= 4.
    """
    # middle row: dz = hn - hc, so validity is the static |dh| <= 1 band
    # (plane indices are explicit non-negative statics - negative ref
    # indices crash the Mosaic LLO lowering)
    nf = buf.shape[1] - 1  # field planes; plane nf is the mask
    D_mid = None if f == 2 else _band_matrix(0, dh)
    yield (
        buf[w, 0:nf, e + 1 : e + 1 + block],
        buf[w, nf, e + 1 : e + 1 + block],
        D_mid,
        izb + a_n,
    )
    # composite of the two outer rows (see docstring); the half-splice is
    # an elementwise lane SELECT (lanes < K from the j=2 row, the rest
    # from the j=0 row) - no lane shuffling, so any K lowers on Mosaic
    hi = buf[w, 0:nf, e + 2 : e + 2 + block]
    lo = buf[w, 0:nf, e : e + block]
    first_half = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) < k
    comp = jnp.where(first_half[None], hi, lo)
    m_comp = jnp.where(
        first_half,
        buf[w, nf, e + 2 : e + 2 + block],
        buf[w, nf, e : e + block],
    )
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // k
    lane_n = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // k
    D = (
        ((lane_c == f - 1) & (lane_n == 0))
        | ((lane_c == 0) & (lane_n == f - 1))
    ).astype(jnp.float32)
    zn = izb + jnp.where(a_n == 0, f, -1)
    yield comp, m_comp, D, zn


def _accel_folds(params, kernel):
    """Trace-time constant folding for the factorized accel kernels.

    ``scale = -mass*(press+pi)*dw_over_r`` becomes ``cfold*(press+pi)*g``
    with every constant folded into ``cfold`` (and, transitively, into
    the pre-scaled pterm plane and the viscosity constant ``cv``).  For
    WendlandC2, ``g = t^3`` (its dw_over_r IS ``-(5 sigma/h^2) t^3``)
    so the kernel constant folds too; generic kernels evaluate
    ``g = -dw_over_r`` in-kernel and fold only ``mass``.
    """
    if kernel is WendlandC2:
        cfold = 5.0 * params.mass * kernel._sigma(params.h, params.dim) / (
            params.h * params.h
        )
    else:
        cfold = params.mass
    # C*pi = cv * min(vdotx,0) / ((r2+h2eps)(rho_c+rho_n)); rho_bar's
    # 0.5 and the leading cfold are folded in
    cv = -2.0 * params.alpha * params.c0 * params.h * cfold
    return cfold, cv


def _density_kernel_packed(
    flags_ref, xm_hbm, rho_ref, xw, sems,
    *, grid, params, kernel, block, f, nzp
):
    nx, ny, nz = grid.dims
    k = grid.capacity
    _, _, _, pad_r, _, _, astarts, extras, wlen = _packed_geometry(grid, block)
    # WendlandC2 fast path: w = sigma t^4 (2q+1) with t = max(1-q/2, 0);
    # sigma folds into the final mass multiply, q terms into r coeffs
    inv2h = 0.5 / params.h
    invh2 = 2.0 / params.h
    mfold = params.mass * (
        kernel._sigma(params.h, params.dim) if kernel is WendlandC2 else 1.0
    )

    i = pl.program_id(0)
    base = i * block

    # occupancy-driven sparsity (scalar-prefetched flags, see _block_flags):
    # a block with no live center particles writes zeros and skips its DMAs
    # and pair math entirely; an occupied block still skips the pair math
    # of any all-empty neighbor window.  Free surfaces leave large parts
    # of real SPH domains empty - the static XLA path cannot exploit that.
    @pl.when(flags_ref[i] & 1 == 0)
    def _empty():
        rho_ref[:] = jnp.zeros((block, 128), jnp.float32)

    @pl.when(flags_ref[i] & 1 != 0)
    def _occupied():
        # mask rides as the last field plane: ONE DMA per window
        for c_ in _start_window_dmas(xm_hbm, xw, sems, 0, base, astarts, wlen):
            c_.wait()

        # row-uniform coords: every cell in packed row r shares (ix, iy);
        # iz of lane l is izb + l // K
        row = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        cell0 = f * row
        ix = cell0 // (ny * nzp)
        rem = cell0 - ix * (ny * nzp)
        iy = rem // nzp
        izb = rem - iy * nzp  # [B, 1], multiple of f

        a_n, dh = _lane_half_vectors(k)

        # center row: window 4 (off'=0, r_lo=-1), j=1
        e4 = extras[4]
        xc = xw[4, :3, e4 + 1 : e4 + 1 + block]  # [3, B, 128]
        mc = xw[4, 3, e4 + 1 : e4 + 1 + block]  # [B, 128]

        rho_ref[:] = jnp.zeros((block, 128), jnp.float32)
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        for w, (dx, dy) in enumerate(offs):
            e = extras[w]

            @pl.when((flags_ref[i] >> (1 + w)) & 1 != 0)
            def _window(w=w, dx=dx, dy=dy, e=e):
                xy_ok = (
                    (ix + dx >= 0)
                    & (ix + dx < nx)
                    & (iy + dy >= 0)
                    & (iy + dy < ny)
                ).astype(jnp.float32)  # [B, 1]
                acc = jnp.zeros((block, 1, 128), jnp.float32)
                for yb, ym, D, zn in _packed_slices(
                    xw, w, e, block, f, k, izb, a_n, dh, nzp
                ):
                    z_ok = ((zn >= 0) & (zn < nzp)).astype(jnp.float32)
                    pm = ym * z_ok * xy_ok  # [B, 128]
                    ddx = xc[0][:, :, None] - yb[0][:, None, :]  # [B, 128, 128]
                    ddy = xc[1][:, :, None] - yb[1][:, None, :]
                    ddz = xc[2][:, :, None] - yb[2][:, None, :]
                    r = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                    if kernel is WendlandC2:
                        # w = sigma t^4 (2q+1): sigma folds into the
                        # final mass multiply (see below)
                        t = jnp.maximum(1.0 - inv2h * r, 0.0)
                        t2 = t * t
                        wv = (t2 * t2) * (invh2 * r + 1.0)
                    else:
                        wv = kernel.w(r, params.h, dim=params.dim)
                    if D is not None:
                        wv = wv * D[None, :, :]
                    # rho_i = sum_n pm[n] wv[i,n]: the mask-broadcast
                    # multiply AND the cross-lane reduction ride the MXU
                    acc = acc + jax.lax.dot_general(
                        pm[:, None, :], wv, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 1, 128]
                rho_ref[:] += acc[:, 0]

        rho_ref[:] = mfold * rho_ref[:] * mc


def _accel_kernel_packed(
    flags_ref, f_hbm, ax_ref, ay_ref, az_ref, fw, sems,
    *, grid, params, kernel, block, f, nzp
):
    """Factorized pair math: MXU matmuls carry the contractions, the VPU
    only runs the irreducible per-pair transcendentals.

    Three per-pair contractions are hoisted onto the (otherwise idle)
    MXU as batched ``dot_general`` in planes-major layout:

    * ``vdotx = (vc-vn).(xc-xn)`` expands to ``CCc + CCn - CROSS`` with
      ``CROSS = xc.vn + vc.xn`` - ONE K=6 matmul per slice instead of
      3 subs + a 3-term dot per pair,
    * the output reduction ``acc_i = sum_n s(xc-xn)`` factorizes as
      ``xc*S0 - S1`` with ``[S0|S1] = [pm|pm*xn] @ s^T`` - ONE K=128
      matmul per slice instead of 3 muls + 3 cross-lane reductions
      (the mask ``pm`` folds into the reduction matrix, so the
      mask-broadcast multiply disappears too).

    ``r2`` stays exact (explicit diffs): the matmul form
    ``|xc|^2+|xn|^2-2xc.xn`` loses ~3 digits to cancellation at contact
    range even in block-local coordinates, and r2 sits under sqrt and in
    the viscosity denominator.  Positions ARE shifted to block-local
    coordinates (origin = the block's first cell corner) so the
    factorized vdotx/reduction cancellation stays ~|x_local| ~ a few
    cells, not the domain size.

    Constants are folded at prep time (see :func:`_accel_packed`):
    plane 7 carries ``C*p/rho^2`` with ``C = -mass*(-5 sigma/h^2)``, so
    in-kernel ``scale = (press + piC/den) * t^3`` with ``t = max(1 -
    q/2, 0)`` - no per-pair constant multiplies, no dwr polynomial
    beyond ``t^3`` (WendlandC2's dw_over_r IS ``C t^3``; other kernels
    take the generic path, see ``_accel_packed``).
    """
    nx, ny, nz = grid.dims
    k = grid.capacity
    _, _, _, pad_r, _, _, astarts, extras, wlen = _packed_geometry(grid, block)
    h2eps = params.eps * params.h * params.h
    cfold, cv = _accel_folds(params, kernel)
    inv2h = 0.5 / params.h

    i = pl.program_id(0)
    base = i * block

    # same occupancy-driven block/window sparsity as the density kernel
    @pl.when(flags_ref[i] & 1 == 0)
    def _empty():
        zero = jnp.zeros((block, 128), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero

    @pl.when(flags_ref[i] & 1 != 0)
    def _occupied():
        # mask rides as the last field plane: ONE DMA per window
        for c_ in _start_window_dmas(f_hbm, fw, sems, 0, base, astarts, wlen):
            c_.wait()

        row = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        cell0 = f * row
        ix = cell0 // (ny * nzp)
        rem = cell0 - ix * (ny * nzp)
        iy = rem // nzp
        izb = rem - iy * nzp  # [B, 1]

        a_n, dh = _lane_half_vectors(k)

        # block-local coordinate origin: x/y from the first row's cell
        # corner (blocks are x/y-compact); z pinned to the domain
        # z-midpoint (a block's rows span whole z-columns, so mid-domain
        # halves the worst-case |z_local| and with it the factorization
        # cancellation error)
        c00 = f * (i * block)
        ix0 = c00 // (ny * nzp)
        rem0 = c00 - ix0 * (ny * nzp)
        tx = grid.lo[0] + grid.cell_size * ix0.astype(jnp.float32)
        ty = grid.lo[1] + grid.cell_size * (rem0 // nzp).astype(jnp.float32)
        tz = grid.lo[2] + grid.cell_size * (0.5 * nzp)

        e4 = extras[4]
        cen = fw[4, :8, e4 + 1 : e4 + 1 + block]  # [8, B, 128]
        mc = fw[4, 8, e4 + 1 : e4 + 1 + block]

        xcl = (cen[0] - tx, cen[1] - ty, cen[2] - tz)  # local coords
        rho_c = cen[6]
        ptc = cen[7]  # pre-scaled C*p/rho^2
        ccc = cen[3] * xcl[0] + cen[4] * xcl[1] + cen[5] * xcl[2]  # vc.xc_l
        a6 = jnp.stack(
            [xcl[0], xcl[1], xcl[2], cen[3], cen[4], cen[5]], axis=1
        )  # [B, 6, 128] planes-major

        zero = jnp.zeros((block, 128), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        for w, (dx, dy) in enumerate(offs):
            e = extras[w]

            @pl.when((flags_ref[i] >> (1 + w)) & 1 != 0)
            def _window(w=w, dx=dx, dy=dy, e=e):
                xy_ok = (
                    (ix + dx >= 0)
                    & (ix + dx < nx)
                    & (iy + dy >= 0)
                    & (iy + dy < ny)
                ).astype(jnp.float32)  # [B, 1]
                sacc = jnp.zeros((block, 4, 128), jnp.float32)
                for nb, ym, D, zn in _packed_slices(
                    fw, w, e, block, f, k, izb, a_n, dh, nzp
                ):
                    z_ok = ((zn >= 0) & (zn < nzp)).astype(jnp.float32)
                    pm = ym * z_ok * xy_ok  # [B, 128]

                    xnl0 = nb[0] - tx  # [B, 128] neighbor local coords
                    xnl1 = nb[1] - ty
                    xnl2 = nb[2] - tz
                    ccn = nb[3] * xnl0 + nb[4] * xnl1 + nb[5] * xnl2
                    b6 = jnp.stack(
                        [nb[3], nb[4], nb[5], xnl0, xnl1, xnl2], axis=1
                    )  # [B, 6, 128]
                    # CROSS[i, n] = xc_l.vn + vc.xn_l  (MXU, K=6)
                    cross = jax.lax.dot_general(
                        a6, b6, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 128, 128]

                    # r2 exact (see docstring; a factorized-r2 variant
                    # measured SLOWER - the third matmul tips the MXU
                    # into the bottleneck - and 10x less accurate)
                    ddx = xcl[0][:, :, None] - xnl0[:, None, :]
                    ddy = xcl[1][:, :, None] - xnl1[:, None, :]
                    ddz = xcl[2][:, :, None] - xnl2[:, None, :]
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    r = jnp.sqrt(r2)
                    if kernel is WendlandC2:
                        # dw_over_r = -(5 sigma/h^2) t^3: the constant is
                        # folded into cfold/the pterm plane at prep time
                        t = jnp.maximum(1.0 - inv2h * r, 0.0)
                        t3 = t * t * t
                    else:
                        t3 = -kernel.dw_over_r(r, params.h, dim=params.dim)

                    vdotx = ccc[:, :, None] + ccn[:, None, :] - cross
                    press = ptc[:, :, None] + nb[7][:, None, :]
                    den = (r2 + h2eps) * (rho_c[:, :, None] + nb[6][:, None, :])
                    # the viscosity divide runs as the VPU's approximate reciprocal
                    # (~1e-5 rel err on an O(alpha) artificial term whose
                    # denominator is itself eps-regularized; den > 0 always).
                    # Skipping the Newton refinement measures on the
                    # pair-math critical path - see the STATUS block.
                    scale = (
                        press
                        + cv * jnp.minimum(vdotx, 0.0)
                        * pl.reciprocal(den, approx=True)
                    ) * t3
                    if D is not None:
                        scale = scale * D[None, :, :]

                    # reduction matrix [pm | pm*xn_l] - the mask folds in
                    n4 = jnp.stack(
                        [pm, pm * xnl0, pm * xnl1, pm * xnl2], axis=1
                    )  # [B, 4, 128]
                    # S[k,i] = sum_n n4[k,n] * scale[i,n]  (MXU, K=128)
                    sacc = sacc + jax.lax.dot_general(
                        n4, scale, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 4, 128]
                ax_ref[:] += xcl[0] * sacc[:, 0] - sacc[:, 1]
                ay_ref[:] += xcl[1] * sacc[:, 0] - sacc[:, 2]
                az_ref[:] += xcl[2] * sacc[:, 0] - sacc[:, 3]

        ax_ref[:] = ax_ref[:] * mc
        ay_ref[:] = ay_ref[:] * mc
        az_ref[:] = az_ref[:] * mc


def _accel_drho_kernel_packed(
    flags_ref, f_hbm, ax_ref, ay_ref, az_ref, dr_ref, fw, sems,
    *, grid, params, kernel, block, f, nzp, delta_sph
):
    """Packed-layout fused momentum + continuity pair pass.

    :func:`_accel_kernel_packed` with the drho/dt output of
    :func:`_accel_drho_kernel`: the continuity pair matrix
    ``t3 * (vdotx + delta-SPH diffusion)`` shares the factorized
    ``vdotx`` (CCc + CCn - CROSS), the exact ``r2``, and the ``t3``
    transcendental the momentum term already computed, so at every
    packing depth f the extra cost over the momentum-only kernel is one
    [B, 128, 128] pair matrix and one K=128 matvec reduction per slice
    - same marginal cost as in the lane-native kernel, at 1/f the rows.
    The static lane-quadrant validity ``D`` masks the continuity matrix
    exactly as it masks the momentum one.
    """
    nx, ny, nz = grid.dims
    k = grid.capacity
    _, _, _, pad_r, _, _, astarts, extras, wlen = _packed_geometry(grid, block)
    h2eps = params.eps * params.h * params.h
    cfold, cv = _accel_folds(params, kernel)
    inv2h = 0.5 / params.h
    # shared-constant folding as in _accel_drho_kernel: with
    # dwr = dw_const * t3, both continuity terms share A = m*dw_const =
    # -cfold, so the pair bracket is t3*(vdotx + ddfold*...) and A
    # scales the reduced sum once
    adrho = -cfold
    ddfold = 2.0 * delta_sph * params.h * params.c0
    eta2 = (0.1 * params.h) ** 2
    rho_floor = 0.1 * params.rho0

    i = pl.program_id(0)
    base = i * block

    @pl.when(flags_ref[i] & 1 == 0)
    def _empty():
        zero = jnp.zeros((block, 128), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero
        dr_ref[:] = zero

    @pl.when(flags_ref[i] & 1 != 0)
    def _occupied():
        for c_ in _start_window_dmas(f_hbm, fw, sems, 0, base, astarts, wlen):
            c_.wait()

        row = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        cell0 = f * row
        ix = cell0 // (ny * nzp)
        rem = cell0 - ix * (ny * nzp)
        iy = rem // nzp
        izb = rem - iy * nzp  # [B, 1]

        a_n, dh = _lane_half_vectors(k)

        c00 = f * (i * block)
        ix0 = c00 // (ny * nzp)
        rem0 = c00 - ix0 * (ny * nzp)
        tx = grid.lo[0] + grid.cell_size * ix0.astype(jnp.float32)
        ty = grid.lo[1] + grid.cell_size * (rem0 // nzp).astype(jnp.float32)
        tz = grid.lo[2] + grid.cell_size * (0.5 * nzp)

        e4 = extras[4]
        cen = fw[4, :8, e4 + 1 : e4 + 1 + block]  # [8, B, 128]
        mc = fw[4, 8, e4 + 1 : e4 + 1 + block]

        xcl = (cen[0] - tx, cen[1] - ty, cen[2] - tz)
        rho_c = cen[6]
        ptc = cen[7]  # pre-scaled cfold*p/rho^2
        ccc = cen[3] * xcl[0] + cen[4] * xcl[1] + cen[5] * xcl[2]
        a6 = jnp.stack(
            [xcl[0], xcl[1], xcl[2], cen[3], cen[4], cen[5]], axis=1
        )  # [B, 6, 128]

        zero = jnp.zeros((block, 128), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero
        dr_ref[:] = zero
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        for w, (dx, dy) in enumerate(offs):
            e = extras[w]

            @pl.when((flags_ref[i] >> (1 + w)) & 1 != 0)
            def _window(w=w, dx=dx, dy=dy, e=e):
                xy_ok = (
                    (ix + dx >= 0)
                    & (ix + dx < nx)
                    & (iy + dy >= 0)
                    & (iy + dy < ny)
                ).astype(jnp.float32)  # [B, 1]
                sacc = jnp.zeros((block, 4, 128), jnp.float32)
                sdr = jnp.zeros((block, 1, 128), jnp.float32)
                for nb, ym, D, zn in _packed_slices(
                    fw, w, e, block, f, k, izb, a_n, dh, nzp
                ):
                    z_ok = ((zn >= 0) & (zn < nzp)).astype(jnp.float32)
                    pm = ym * z_ok * xy_ok  # [B, 128]

                    xnl0 = nb[0] - tx
                    xnl1 = nb[1] - ty
                    xnl2 = nb[2] - tz
                    ccn = nb[3] * xnl0 + nb[4] * xnl1 + nb[5] * xnl2
                    b6 = jnp.stack(
                        [nb[3], nb[4], nb[5], xnl0, xnl1, xnl2], axis=1
                    )
                    cross = jax.lax.dot_general(
                        a6, b6, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 128, 128]

                    ddx = xcl[0][:, :, None] - xnl0[:, None, :]
                    ddy = xcl[1][:, :, None] - xnl1[:, None, :]
                    ddz = xcl[2][:, :, None] - xnl2[:, None, :]
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    r = jnp.sqrt(r2)
                    if kernel is WendlandC2:
                        t = jnp.maximum(1.0 - inv2h * r, 0.0)
                        t3 = t * t * t
                    else:
                        t3 = -kernel.dw_over_r(r, params.h, dim=params.dim)

                    vdotx = ccc[:, :, None] + ccn[:, None, :] - cross
                    press = ptc[:, :, None] + nb[7][:, None, :]
                    den = (r2 + h2eps) * (rho_c[:, :, None] + nb[6][:, None, :])
                    scale = (
                        press
                        + cv * jnp.minimum(vdotx, 0.0)
                        * pl.reciprocal(den, approx=True)
                    ) * t3

                    if delta_sph > 0.0:
                        rho_n = jnp.maximum(nb[6], rho_floor)
                        diff = (
                            ddfold
                            * (rho_c[:, :, None] - rho_n[:, None, :])
                            * pl.reciprocal(rho_n, approx=True)[:, None, :]
                            * r2
                            * pl.reciprocal(r2 + eta2, approx=True)
                        )
                        scale2 = t3 * (vdotx + diff)
                    else:
                        scale2 = t3 * vdotx
                    if D is not None:
                        scale = scale * D[None, :, :]
                        scale2 = scale2 * D[None, :, :]

                    n4 = jnp.stack(
                        [pm, pm * xnl0, pm * xnl1, pm * xnl2], axis=1
                    )  # [B, 4, 128]
                    sacc = sacc + jax.lax.dot_general(
                        n4, scale, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 4, 128]
                    # 1-row batched matmul (same MXU form as the
                    # momentum reduction): a [B,Kp,128]x[B,128] matvec
                    # lowers to vector.multi_reduction, which Mosaic
                    # rejects
                    sdr = sdr + jax.lax.dot_general(
                        pm[:, None, :], scale2, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )  # [B, 1, 128]
                ax_ref[:] += xcl[0] * sacc[:, 0] - sacc[:, 1]
                ay_ref[:] += xcl[1] * sacc[:, 0] - sacc[:, 2]
                az_ref[:] += xcl[2] * sacc[:, 0] - sacc[:, 3]
                dr_ref[:] += sdr[:, 0]

        ax_ref[:] = ax_ref[:] * mc
        ay_ref[:] = ay_ref[:] * mc
        az_ref[:] = az_ref[:] * mc
        dr_ref[:] = dr_ref[:] * (mc * adrho)


def _accel_drho_kernel_packed_cross(
    flags_ref, f_self, f_other, ax_ref, ay_ref, az_ref, dr_ref, fw, cw, sems,
    *, grid, params, kernel, block, f, nzp, delta_sph
):
    """Cross-tier fused momentum + continuity pair pass: centers from
    ``f_self``, neighbors from ``f_other`` - the drho counterpart of
    :func:`_accel_kernel_packed_cross`, math identical to
    :func:`_accel_drho_kernel_packed`."""
    nx, ny, nz = grid.dims
    k = grid.capacity
    _, _, _, pad_r, _, _, astarts, extras, wlen = _packed_geometry(grid, block)
    h2eps = params.eps * params.h * params.h
    cfold, cv = _accel_folds(params, kernel)
    inv2h = 0.5 / params.h
    adrho = -cfold
    ddfold = 2.0 * delta_sph * params.h * params.c0
    eta2 = (0.1 * params.h) ** 2
    rho_floor = 0.1 * params.rho0

    i = pl.program_id(0)
    base = i * block

    @pl.when(flags_ref[i] & 1 == 0)
    def _empty():
        zero = jnp.zeros((block, 128), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero
        dr_ref[:] = zero

    @pl.when(flags_ref[i] & 1 != 0)
    def _occupied():
        copies = _start_window_dmas(f_other, fw, sems, 0, base, astarts, wlen)
        ccopy = pltpu.make_async_copy(
            f_self.at[:, pl.ds(pl.multiple_of(base + astarts[4], 8), wlen), :],
            cw,
            sems.at[9],
        )
        ccopy.start()
        for c_ in copies:
            c_.wait()
        ccopy.wait()

        row = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        cell0 = f * row
        ix = cell0 // (ny * nzp)
        rem = cell0 - ix * (ny * nzp)
        iy = rem // nzp
        izb = rem - iy * nzp

        a_n, dh = _lane_half_vectors(k)

        c00 = f * (i * block)
        ix0 = c00 // (ny * nzp)
        rem0 = c00 - ix0 * (ny * nzp)
        tx = grid.lo[0] + grid.cell_size * ix0.astype(jnp.float32)
        ty = grid.lo[1] + grid.cell_size * (rem0 // nzp).astype(jnp.float32)
        tz = grid.lo[2] + grid.cell_size * (0.5 * nzp)

        e4 = extras[4]
        cen = cw[:8, e4 + 1 : e4 + 1 + block]  # [8, B, 128] self centers
        mc = cw[8, e4 + 1 : e4 + 1 + block]

        xcl = (cen[0] - tx, cen[1] - ty, cen[2] - tz)
        rho_c = cen[6]
        ptc = cen[7]
        ccc = cen[3] * xcl[0] + cen[4] * xcl[1] + cen[5] * xcl[2]
        a6 = jnp.stack(
            [xcl[0], xcl[1], xcl[2], cen[3], cen[4], cen[5]], axis=1
        )

        zero = jnp.zeros((block, 128), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero
        dr_ref[:] = zero
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        for w, (dx, dy) in enumerate(offs):
            e = extras[w]

            @pl.when((flags_ref[i] >> (1 + w)) & 1 != 0)
            def _window(w=w, dx=dx, dy=dy, e=e):
                xy_ok = (
                    (ix + dx >= 0)
                    & (ix + dx < nx)
                    & (iy + dy >= 0)
                    & (iy + dy < ny)
                ).astype(jnp.float32)
                sacc = jnp.zeros((block, 4, 128), jnp.float32)
                sdr = jnp.zeros((block, 1, 128), jnp.float32)
                for nb, ym, D, zn in _packed_slices(
                    fw, w, e, block, f, k, izb, a_n, dh, nzp
                ):
                    z_ok = ((zn >= 0) & (zn < nzp)).astype(jnp.float32)
                    pm = ym * z_ok * xy_ok

                    xnl0 = nb[0] - tx
                    xnl1 = nb[1] - ty
                    xnl2 = nb[2] - tz
                    ccn = nb[3] * xnl0 + nb[4] * xnl1 + nb[5] * xnl2
                    b6 = jnp.stack(
                        [nb[3], nb[4], nb[5], xnl0, xnl1, xnl2], axis=1
                    )
                    cross = jax.lax.dot_general(
                        a6, b6, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )

                    ddx = xcl[0][:, :, None] - xnl0[:, None, :]
                    ddy = xcl[1][:, :, None] - xnl1[:, None, :]
                    ddz = xcl[2][:, :, None] - xnl2[:, None, :]
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    r = jnp.sqrt(r2)
                    if kernel is WendlandC2:
                        t = jnp.maximum(1.0 - inv2h * r, 0.0)
                        t3 = t * t * t
                    else:
                        t3 = -kernel.dw_over_r(r, params.h, dim=params.dim)

                    vdotx = ccc[:, :, None] + ccn[:, None, :] - cross
                    press = ptc[:, :, None] + nb[7][:, None, :]
                    den = (r2 + h2eps) * (rho_c[:, :, None] + nb[6][:, None, :])
                    scale = (
                        press
                        + cv * jnp.minimum(vdotx, 0.0)
                        * pl.reciprocal(den, approx=True)
                    ) * t3

                    if delta_sph > 0.0:
                        rho_n = jnp.maximum(nb[6], rho_floor)
                        diff = (
                            ddfold
                            * (rho_c[:, :, None] - rho_n[:, None, :])
                            * pl.reciprocal(rho_n, approx=True)[:, None, :]
                            * r2
                            * pl.reciprocal(r2 + eta2, approx=True)
                        )
                        scale2 = t3 * (vdotx + diff)
                    else:
                        scale2 = t3 * vdotx
                    if D is not None:
                        scale = scale * D[None, :, :]
                        scale2 = scale2 * D[None, :, :]

                    n4 = jnp.stack(
                        [pm, pm * xnl0, pm * xnl1, pm * xnl2], axis=1
                    )
                    sacc = sacc + jax.lax.dot_general(
                        n4, scale, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    # 1-row batched matmul (see _accel_drho_kernel_packed)
                    sdr = sdr + jax.lax.dot_general(
                        pm[:, None, :], scale2, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                ax_ref[:] += xcl[0] * sacc[:, 0] - sacc[:, 1]
                ay_ref[:] += xcl[1] * sacc[:, 0] - sacc[:, 2]
                az_ref[:] += xcl[2] * sacc[:, 0] - sacc[:, 3]
                dr_ref[:] += sdr[:, 0]

        ax_ref[:] = ax_ref[:] * mc
        ay_ref[:] = ay_ref[:] * mc
        az_ref[:] = az_ref[:] * mc
        dr_ref[:] = dr_ref[:] * (mc * adrho)


def _density_kernel_packed_cross(
    flags_ref, xm_self, xm_other, rho_ref, xw, cw, sems,
    *, grid, params, kernel, block, f, nzp
):
    """Cross-tier density: centers from ``xm_self``, neighbors from
    ``xm_other`` (the two-tier spill layout - see ``density_spill``).

    Identical math to :func:`_density_kernel_packed`; the only
    structural change is a 10th DMA bringing the center row-block from
    the self buffer (window-4 geometry) while all 9 neighbor windows
    come from the other buffer.  Flag bit 0 is pre-ANDed with "any
    other-tier window occupied" at prep time, so blocks with no
    cross-tier work skip everything.
    """
    nx, ny, nz = grid.dims
    k = grid.capacity
    _, _, _, pad_r, _, _, astarts, extras, wlen = _packed_geometry(grid, block)
    inv2h = 0.5 / params.h
    invh2 = 2.0 / params.h
    mfold = params.mass * (
        kernel._sigma(params.h, params.dim) if kernel is WendlandC2 else 1.0
    )

    i = pl.program_id(0)
    base = i * block

    @pl.when(flags_ref[i] & 1 == 0)
    def _empty():
        rho_ref[:] = jnp.zeros((block, 128), jnp.float32)

    @pl.when(flags_ref[i] & 1 != 0)
    def _occupied():
        copies = _start_window_dmas(xm_other, xw, sems, 0, base, astarts, wlen)
        ccopy = pltpu.make_async_copy(
            xm_self.at[:, pl.ds(pl.multiple_of(base + astarts[4], 8), wlen), :],
            cw,
            sems.at[9],
        )
        ccopy.start()
        for c_ in copies:
            c_.wait()
        ccopy.wait()

        row = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        cell0 = f * row
        ix = cell0 // (ny * nzp)
        rem = cell0 - ix * (ny * nzp)
        iy = rem // nzp
        izb = rem - iy * nzp

        a_n, dh = _lane_half_vectors(k)

        e4 = extras[4]
        xc = cw[:3, e4 + 1 : e4 + 1 + block]  # [3, B, 128] self centers
        mc = cw[3, e4 + 1 : e4 + 1 + block]  # [B, 128]

        rho_ref[:] = jnp.zeros((block, 128), jnp.float32)
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        for w, (dx, dy) in enumerate(offs):
            e = extras[w]

            @pl.when((flags_ref[i] >> (1 + w)) & 1 != 0)
            def _window(w=w, dx=dx, dy=dy, e=e):
                xy_ok = (
                    (ix + dx >= 0)
                    & (ix + dx < nx)
                    & (iy + dy >= 0)
                    & (iy + dy < ny)
                ).astype(jnp.float32)
                acc = jnp.zeros((block, 1, 128), jnp.float32)
                for yb, ym, D, zn in _packed_slices(
                    xw, w, e, block, f, k, izb, a_n, dh, nzp
                ):
                    z_ok = ((zn >= 0) & (zn < nzp)).astype(jnp.float32)
                    pm = ym * z_ok * xy_ok
                    ddx = xc[0][:, :, None] - yb[0][:, None, :]
                    ddy = xc[1][:, :, None] - yb[1][:, None, :]
                    ddz = xc[2][:, :, None] - yb[2][:, None, :]
                    r = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
                    if kernel is WendlandC2:
                        t = jnp.maximum(1.0 - inv2h * r, 0.0)
                        t2 = t * t
                        wv = (t2 * t2) * (invh2 * r + 1.0)
                    else:
                        wv = kernel.w(r, params.h, dim=params.dim)
                    if D is not None:
                        wv = wv * D[None, :, :]
                    acc = acc + jax.lax.dot_general(
                        pm[:, None, :], wv, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                rho_ref[:] += acc[:, 0]

        rho_ref[:] = mfold * rho_ref[:] * mc


def _accel_kernel_packed_cross(
    flags_ref, f_self, f_other, ax_ref, ay_ref, az_ref, fw, cw, sems,
    *, grid, params, kernel, block, f, nzp
):
    """Cross-tier acceleration: centers from ``f_self``, neighbors from
    ``f_other`` - the accel counterpart of
    :func:`_density_kernel_packed_cross`; math identical to
    :func:`_accel_kernel_packed`."""
    nx, ny, nz = grid.dims
    k = grid.capacity
    _, _, _, pad_r, _, _, astarts, extras, wlen = _packed_geometry(grid, block)
    h2eps = params.eps * params.h * params.h
    cfold, cv = _accel_folds(params, kernel)
    inv2h = 0.5 / params.h

    i = pl.program_id(0)
    base = i * block

    @pl.when(flags_ref[i] & 1 == 0)
    def _empty():
        zero = jnp.zeros((block, 128), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero

    @pl.when(flags_ref[i] & 1 != 0)
    def _occupied():
        copies = _start_window_dmas(f_other, fw, sems, 0, base, astarts, wlen)
        ccopy = pltpu.make_async_copy(
            f_self.at[:, pl.ds(pl.multiple_of(base + astarts[4], 8), wlen), :],
            cw,
            sems.at[9],
        )
        ccopy.start()
        for c_ in copies:
            c_.wait()
        ccopy.wait()

        row = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        cell0 = f * row
        ix = cell0 // (ny * nzp)
        rem = cell0 - ix * (ny * nzp)
        iy = rem // nzp
        izb = rem - iy * nzp

        a_n, dh = _lane_half_vectors(k)

        c00 = f * (i * block)
        ix0 = c00 // (ny * nzp)
        rem0 = c00 - ix0 * (ny * nzp)
        tx = grid.lo[0] + grid.cell_size * ix0.astype(jnp.float32)
        ty = grid.lo[1] + grid.cell_size * (rem0 // nzp).astype(jnp.float32)
        tz = grid.lo[2] + grid.cell_size * (0.5 * nzp)

        e4 = extras[4]
        cen = cw[:8, e4 + 1 : e4 + 1 + block]  # [8, B, 128] self centers
        mc = cw[8, e4 + 1 : e4 + 1 + block]

        xcl = (cen[0] - tx, cen[1] - ty, cen[2] - tz)
        rho_c = cen[6]
        ptc = cen[7]
        ccc = cen[3] * xcl[0] + cen[4] * xcl[1] + cen[5] * xcl[2]
        a6 = jnp.stack(
            [xcl[0], xcl[1], xcl[2], cen[3], cen[4], cen[5]], axis=1
        )

        zero = jnp.zeros((block, 128), jnp.float32)
        ax_ref[:] = zero
        ay_ref[:] = zero
        az_ref[:] = zero
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
        for w, (dx, dy) in enumerate(offs):
            e = extras[w]

            @pl.when((flags_ref[i] >> (1 + w)) & 1 != 0)
            def _window(w=w, dx=dx, dy=dy, e=e):
                xy_ok = (
                    (ix + dx >= 0)
                    & (ix + dx < nx)
                    & (iy + dy >= 0)
                    & (iy + dy < ny)
                ).astype(jnp.float32)
                sacc = jnp.zeros((block, 4, 128), jnp.float32)
                for nb, ym, D, zn in _packed_slices(
                    fw, w, e, block, f, k, izb, a_n, dh, nzp
                ):
                    z_ok = ((zn >= 0) & (zn < nzp)).astype(jnp.float32)
                    pm = ym * z_ok * xy_ok

                    xnl0 = nb[0] - tx
                    xnl1 = nb[1] - ty
                    xnl2 = nb[2] - tz
                    ccn = nb[3] * xnl0 + nb[4] * xnl1 + nb[5] * xnl2
                    b6 = jnp.stack(
                        [nb[3], nb[4], nb[5], xnl0, xnl1, xnl2], axis=1
                    )
                    cross = jax.lax.dot_general(
                        a6, b6, (((1,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )

                    ddx = xcl[0][:, :, None] - xnl0[:, None, :]
                    ddy = xcl[1][:, :, None] - xnl1[:, None, :]
                    ddz = xcl[2][:, :, None] - xnl2[:, None, :]
                    r2 = ddx * ddx + ddy * ddy + ddz * ddz
                    r = jnp.sqrt(r2)
                    if kernel is WendlandC2:
                        t = jnp.maximum(1.0 - inv2h * r, 0.0)
                        t3 = t * t * t
                    else:
                        t3 = -kernel.dw_over_r(r, params.h, dim=params.dim)

                    vdotx = ccc[:, :, None] + ccn[:, None, :] - cross
                    press = ptc[:, :, None] + nb[7][:, None, :]
                    den = (r2 + h2eps) * (rho_c[:, :, None] + nb[6][:, None, :])
                    # the viscosity divide runs as the VPU's approximate reciprocal
                    # (~1e-5 rel err on an O(alpha) artificial term whose
                    # denominator is itself eps-regularized; den > 0 always).
                    # Skipping the Newton refinement measures on the
                    # pair-math critical path - see the STATUS block.
                    scale = (
                        press
                        + cv * jnp.minimum(vdotx, 0.0)
                        * pl.reciprocal(den, approx=True)
                    ) * t3
                    if D is not None:
                        scale = scale * D[None, :, :]

                    n4 = jnp.stack(
                        [pm, pm * xnl0, pm * xnl1, pm * xnl2], axis=1
                    )
                    sacc = sacc + jax.lax.dot_general(
                        n4, scale, (((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                ax_ref[:] += xcl[0] * sacc[:, 0] - sacc[:, 1]
                ay_ref[:] += xcl[1] * sacc[:, 0] - sacc[:, 2]
                az_ref[:] += xcl[2] * sacc[:, 0] - sacc[:, 3]

        ax_ref[:] = ax_ref[:] * mc
        ay_ref[:] = ay_ref[:] * mc
        az_ref[:] = az_ref[:] * mc


def _block_flags(m_pk, pad_r, nblocks, block, astarts, wlen):
    """``[nblocks]`` int32 occupancy BITMASKS for the kernels.

    Bit 0: any live particle in the block's CENTER rows (all-empty
    blocks produce zero output - skip everything).  Bits 1-9: any live
    particle in neighbor window w's rows (empty windows contribute
    nothing - skip their pair math).  One mask pass + a prefix sum;
    consumed via scalar prefetch so the kernel can branch before its
    DMAs.  Packed to one word per block because SMEM prefetch operands
    are lane-padded to 128 words per ROW: a ``[nblocks, 10]`` layout
    costs 512 B/block and blows the 1 MB SMEM budget at ~2000 blocks
    (observed as a compile failure at 1M particles); the bitmask costs
    4 B/block.
    """
    row_any = (jnp.sum(m_pk, axis=-1) > 0).astype(jnp.int32)
    csum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(row_any)])
    offs = np.array([pad_r] + list(astarts), np.int32)
    lens = np.array([block] + [wlen] * len(astarts), np.int32)
    # csum[i*block + c] for constant c is an arithmetic progression:
    # contiguous slice + reshape + first-column slice, all layout ops -
    # the equivalent thin gather measured 6.7 ms at 1M particles
    need = int((offs + lens).max()) + nblocks * block
    if csum.shape[0] < need:
        csum = jnp.pad(csum, (0, need - csum.shape[0]), mode="edge")

    def col(c0):
        return csum[c0 : c0 + nblocks * block].reshape(nblocks, block)[:, 0]

    bits = jnp.stack(
        [
            (col(int(c0 + ln)) - col(int(c0)) > 0).astype(jnp.int32)
            for c0, ln in zip(offs, lens)
        ],
        axis=-1,
    )
    return jnp.sum(bits << jnp.arange(10, dtype=jnp.int32)[None, :], axis=-1)


def _pack_density_fields(dense_x, mask, grid, soa, f, nzp, pad_r, cp_r):
    """Packed ``[4, cp_r, 128]`` density-kernel buffer (x + mask plane)."""
    x_soa = (
        dense_x[:, : grid.n_cells].astype(jnp.float32)
        if soa
        else jnp.moveaxis(dense_x[: grid.n_cells].astype(jnp.float32), -1, 0)
    )
    xm = jnp.concatenate(
        [x_soa, mask[: grid.n_cells].astype(jnp.float32)[None]],
        axis=0,
    )  # [4, C, K]
    return _pack_dense(xm, grid, f, nzp, pad_r, cp_r)


def _pack_accel_fields(
    dense_x, dense_v, dense_rho, dense_p, mask, grid, soa, params, kernel,
    f, nzp, pad_r, cp_r,
):
    """Packed ``[9, cp_r, 128]`` accel-kernel buffer (x, v, rho,
    pre-scaled pressure term, mask plane)."""
    c = grid.n_cells
    cfold, _ = _accel_folds(params, kernel)
    rho_f = dense_rho[:c].astype(jnp.float32)
    pt = cfold * dense_p[:c].astype(jnp.float32) / (rho_f * rho_f + 1e-30)
    if soa:
        x_soa = dense_x[:, :c].astype(jnp.float32)
        v_soa = dense_v[:, :c].astype(jnp.float32)
    else:
        x_soa = jnp.moveaxis(dense_x[:c].astype(jnp.float32), -1, 0)
        v_soa = jnp.moveaxis(dense_v[:c].astype(jnp.float32), -1, 0)
    fields = jnp.concatenate(
        [
            x_soa,
            v_soa,
            rho_f[None],
            pt[None],
            mask[:c].astype(jnp.float32)[None],
        ],
        axis=0,
    )  # [9, C, K]
    return _pack_dense(fields, grid, f, nzp, pad_r, cp_r)


def _cross_flags(flags_self, flags_other):
    """Flags for a cross-tier pass: centers live in self, neighbor
    windows in other.  Bit 0 requires BOTH a live center block and at
    least one live other-tier window (otherwise the block's cross
    contribution is identically zero and everything is skipped)."""
    windows = flags_other & 0x3FE
    center = flags_self & 1 & (windows != 0).astype(flags_self.dtype)
    return center | windows


def _density_packed(dense_x, mask, grid, params, kernel, block, interpret,
                    soa=False):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = _packed_geometry(
        grid, block
    )
    # mask rides as the 4th field plane so each window is ONE DMA
    xm_pk = _pack_density_fields(
        dense_x, mask, grid, soa, f, nzp, pad_r, cp_r
    )  # [4, cp_r, 128]
    flags = _block_flags(xm_pk[3], pad_r, nblocks, block, astarts, wlen)

    kern = functools.partial(
        _density_kernel_packed, grid=grid, params=params, kernel=kernel,
        block=block, f=f, nzp=nzp,
    )
    rho = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (block, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 4, wlen, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((9,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, xm_pk)
    return _unpack_rows(rho, grid, f, nzp, rows)


def _accel_packed(
    dense_x, dense_v, dense_rho, dense_p, mask, grid, params, kernel, block,
    interpret, soa=False,
):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = _packed_geometry(
        grid, block
    )
    # plane 7 carries the PRE-SCALED pressure term cfold*p/rho^2 (one
    # [C, K] pass here saves a per-pair divide + two constant multiplies
    # in-kernel); mask rides as the 9th plane so each window is ONE DMA
    f_pk = _pack_accel_fields(
        dense_x, dense_v, dense_rho, dense_p, mask, grid, soa, params,
        kernel, f, nzp, pad_r, cp_r,
    )

    flags = _block_flags(f_pk[8], pad_r, nblocks, block, astarts, wlen)

    kern = functools.partial(
        _accel_kernel_packed, grid=grid, params=params, kernel=kernel,
        block=block, f=f, nzp=nzp,
    )
    ax, ay, az = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple(
                pl.BlockSpec(
                    (block, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                )
                for _ in range(3)
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 9, wlen, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((9,)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32)
            for _ in range(3)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, f_pk)
    return jnp.stack(
        [
            _unpack_rows(ax, grid, f, nzp, rows),
            _unpack_rows(ay, grid, f, nzp, rows),
            _unpack_rows(az, grid, f, nzp, rows),
        ],
        axis=-1,
    )


def _accel_drho_packed(
    dense_x, dense_v, dense_rho, dense_p, mask, grid, params, kernel,
    delta_sph, block, interpret, soa=False,
):
    """Packed-layout driver for :func:`_accel_drho_kernel_packed`.

    Same field packing as :func:`_accel_packed` (the fused kernel
    consumes the identical 9 planes: x, v, rho, pre-scaled pterm,
    mask), one extra [rows, 128] output for drho/dt.
    """
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = _packed_geometry(
        grid, block
    )
    f_pk = _pack_accel_fields(
        dense_x, dense_v, dense_rho, dense_p, mask, grid, soa, params,
        kernel, f, nzp, pad_r, cp_r,
    )

    flags = _block_flags(f_pk[8], pad_r, nblocks, block, astarts, wlen)

    ax, ay, az, dr = _accel_drho_call_self(
        flags, f_pk, grid, params, kernel, delta_sph, block, interpret
    )
    return jnp.stack(
        [
            _unpack_rows(ax, grid, f, nzp, rows),
            _unpack_rows(ay, grid, f, nzp, rows),
            _unpack_rows(az, grid, f, nzp, rows),
            _unpack_rows(dr, grid, f, nzp, rows),
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Two-tier spill layout: main tier sized to the TYPICAL cell occupancy
#
# Pair math in the packed layout scales with the number of packed rows
# ~ C/f = C*K/128: halving K halves the kernel cost.  But K must hold the
# WORST cell, and real SPH worst cells run ~2.5x the mean (dam-break
# sloshing: mean 17-19, p95 25-27, max 44 - measured over 3000 steps).
# The spill layout splits each cell's slots into a main tier [0, K) and a
# spill tier [K, 2K) (tpgsd.sph.cells.build_cells_spill): the main tier is
# sized just above the p95 occupancy, and the rare excess particles live in
# the almost-everywhere-empty spill tier whose pair passes the occupancy
# flags skip.  Four flag-gated passes per quantity (AA, AB, BA, BB; the
# B-side passes cost ~nothing when no cell spills), all with the SAME
# packed geometry (both tiers share K), so the self passes reuse the
# existing kernels and the cross passes add only a 10th center DMA.
# Measured (v5e, 100k dam break): K=32+32 spill vs the single-tier auto
# K=48 - see the STATUS block.
# ---------------------------------------------------------------------------


def _density_call_self(flags, xm_pk, grid, params, kernel, block, interpret):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = (
        _packed_geometry(grid, block)
    )
    kern = functools.partial(
        _density_kernel_packed, grid=grid, params=params, kernel=kernel,
        block=block, f=f, nzp=nzp,
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (block, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 4, wlen, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((9,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, xm_pk)


def _density_call_cross(
    flags, xm_self, xm_other, grid, params, kernel, block, interpret
):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = (
        _packed_geometry(grid, block)
    )
    kern = functools.partial(
        _density_kernel_packed_cross, grid=grid, params=params, kernel=kernel,
        block=block, f=f, nzp=nzp,
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (block, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 4, wlen, 128), jnp.float32),
                pltpu.VMEM((4, wlen, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((10,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, xm_self, xm_other)


def _accel_call_self(flags, f_pk, grid, params, kernel, block, interpret):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = (
        _packed_geometry(grid, block)
    )
    kern = functools.partial(
        _accel_kernel_packed, grid=grid, params=params, kernel=kernel,
        block=block, f=f, nzp=nzp,
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple(
                pl.BlockSpec(
                    (block, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                )
                for _ in range(3)
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 9, wlen, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((9,)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32)
            for _ in range(3)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, f_pk)


def _accel_call_cross(
    flags, f_self, f_other, grid, params, kernel, block, interpret
):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = (
        _packed_geometry(grid, block)
    )
    kern = functools.partial(
        _accel_kernel_packed_cross, grid=grid, params=params, kernel=kernel,
        block=block, f=f, nzp=nzp,
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=tuple(
                pl.BlockSpec(
                    (block, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                )
                for _ in range(3)
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 9, wlen, 128), jnp.float32),
                pltpu.VMEM((9, wlen, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((10,)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32)
            for _ in range(3)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, f_self, f_other)


def _accel_drho_call_self(
    flags, f_pk, grid, params, kernel, delta_sph, block, interpret
):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = (
        _packed_geometry(grid, block)
    )
    kern = functools.partial(
        _accel_drho_kernel_packed, grid=grid, params=params, kernel=kernel,
        block=block, f=f, nzp=nzp, delta_sph=float(delta_sph),
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple(
                pl.BlockSpec(
                    (block, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                )
                for _ in range(4)
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 9, wlen, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((9,)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32)
            for _ in range(4)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, f_pk)


def _accel_drho_call_cross(
    flags, f_self, f_other, grid, params, kernel, delta_sph, block, interpret
):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = (
        _packed_geometry(grid, block)
    )
    kern = functools.partial(
        _accel_drho_kernel_packed_cross, grid=grid, params=params,
        kernel=kernel, block=block, f=f, nzp=nzp,
        delta_sph=float(delta_sph),
    )
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=tuple(
                pl.BlockSpec(
                    (block, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                )
                for _ in range(4)
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 9, wlen, 128), jnp.float32),
                pltpu.VMEM((9, wlen, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((10,)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32)
            for _ in range(4)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, f_self, f_other)


def spill_supported(grid):
    """True when the two-tier spill path applies: packed-capacity grids
    only (both tiers share the packed row geometry)."""
    k = grid.capacity
    return 24 <= k <= 64 and k % 8 == 0


def _ghost_tier(dense_x, mask, src, shift, soa):
    """Periodic ghost-halo expansion of one tier's layout (see
    :func:`_ghost_maps`); positions pre-shifted by the image offset."""
    if soa:
        gx = dense_x[:, src] + jnp.moveaxis(jnp.asarray(shift), -1, 0)[:, :, None]
    else:
        gx = dense_x[src] + shift[:, None, :]
    return gx, mask[src]


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "params", "kernel", "block", "interpret", "wrap_axes", "soa"
    ),
)
def density_spill(
    dense_x_a, mask_a, dense_x_b, mask_b, grid, params,
    kernel=WendlandC2, block=DEFAULT_BLOCK, interpret=None,
    wrap_axes=None, soa=False,
):
    """Two-tier SPH density: main tier A (slots < K) + spill tier B.

    Both tiers use ``grid.capacity`` slots (same packed geometry).
    Returns ``(rho_a, rho_b)``, each ``[n_cells, K]`` float32 - the sum
    of same-tier and cross-tier neighbor contributions, equal (up to
    reduction order) to the single-tier density at capacity ``2K``.
    ``wrap_axes`` as in :func:`density`: periodic axes arrive as a
    pre-shifted ghost-cell halo applied to BOTH tiers.
    """
    if interpret is None:
        interpret = _interpret_default()
    if wrap_axes is not None and any(wrap_axes):
        g, src, shift, interior = _ghost_maps(grid, tuple(map(bool, wrap_axes)))
        xa, ma = _ghost_tier(dense_x_a, mask_a, src, shift, soa)
        xb, mb = _ghost_tier(dense_x_b, mask_b, src, shift, soa)
        ra, rb = density_spill(
            xa, ma, xb, mb, g, params, kernel=kernel, block=block,
            interpret=interpret, soa=soa,
        )
        return ra[interior], rb[interior]
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = (
        _packed_geometry(grid, block)
    )
    xa = _pack_density_fields(dense_x_a, mask_a, grid, soa, f, nzp, pad_r, cp_r)
    xb = _pack_density_fields(dense_x_b, mask_b, grid, soa, f, nzp, pad_r, cp_r)
    fa = _block_flags(xa[3], pad_r, nblocks, block, astarts, wlen)
    fb = _block_flags(xb[3], pad_r, nblocks, block, astarts, wlen)

    args = (grid, params, kernel, block, interpret)
    rho_a = _density_call_self(fa, xa, *args) + _density_call_cross(
        _cross_flags(fa, fb), xa, xb, *args
    )
    rho_b = _density_call_self(fb, xb, *args) + _density_call_cross(
        _cross_flags(fb, fa), xb, xa, *args
    )
    return (
        _unpack_rows(rho_a, grid, f, nzp, rows),
        _unpack_rows(rho_b, grid, f, nzp, rows),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "params", "kernel", "block", "interpret", "wrap_axes", "soa"
    ),
)
def accel_spill(
    dense_x_a, dense_v_a, dense_rho_a, dense_p_a, mask_a,
    dense_x_b, dense_v_b, dense_rho_b, dense_p_b, mask_b,
    grid, params,
    kernel=WendlandC2, block=DEFAULT_BLOCK, interpret=None,
    wrap_axes=None, soa=False,
):
    """Two-tier SPH acceleration; the accel counterpart of
    :func:`density_spill`.  Returns ``(acc_a, acc_b)``, each
    ``[n_cells, K, 3]`` float32."""
    if interpret is None:
        interpret = _interpret_default()
    if wrap_axes is not None and any(wrap_axes):
        g, src, shift, interior = _ghost_maps(grid, tuple(map(bool, wrap_axes)))
        xa, ma = _ghost_tier(dense_x_a, mask_a, src, shift, soa)
        xb, mb = _ghost_tier(dense_x_b, mask_b, src, shift, soa)
        va = dense_v_a[:, src] if soa else dense_v_a[src]
        vb = dense_v_b[:, src] if soa else dense_v_b[src]
        aa, ab = accel_spill(
            xa, va, dense_rho_a[src], dense_p_a[src], ma,
            xb, vb, dense_rho_b[src], dense_p_b[src], mb,
            g, params, kernel=kernel, block=block, interpret=interpret,
            soa=soa,
        )
        return aa[interior], ab[interior]
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = (
        _packed_geometry(grid, block)
    )
    pa = _pack_accel_fields(
        dense_x_a, dense_v_a, dense_rho_a, dense_p_a, mask_a, grid, soa,
        params, kernel, f, nzp, pad_r, cp_r,
    )
    pb = _pack_accel_fields(
        dense_x_b, dense_v_b, dense_rho_b, dense_p_b, mask_b, grid, soa,
        params, kernel, f, nzp, pad_r, cp_r,
    )
    fa = _block_flags(pa[8], pad_r, nblocks, block, astarts, wlen)
    fb = _block_flags(pb[8], pad_r, nblocks, block, astarts, wlen)

    args = (grid, params, kernel, block, interpret)
    aa = _accel_call_self(fa, pa, *args)
    ab = _accel_call_cross(_cross_flags(fa, fb), pa, pb, *args)
    ba = _accel_call_cross(_cross_flags(fb, fa), pb, pa, *args)
    bb = _accel_call_self(fb, pb, *args)

    def unpack3(parts):
        return jnp.stack(
            [
                _unpack_rows(parts[0], grid, f, nzp, rows),
                _unpack_rows(parts[1], grid, f, nzp, rows),
                _unpack_rows(parts[2], grid, f, nzp, rows),
            ],
            axis=-1,
        )

    acc_a = unpack3([aa[i] + ab[i] for i in range(3)])
    acc_b = unpack3([bb[i] + ba[i] for i in range(3)])
    return acc_a, acc_b


def accel_drho_spill(
    dense_x_a, dense_v_a, dense_rho_a, dense_p_a, mask_a,
    dense_x_b, dense_v_b, dense_rho_b, dense_p_b, mask_b,
    grid, params,
    kernel=WendlandC2, delta_sph=0.1, block=DEFAULT_BLOCK, interpret=None,
    wrap_axes=None, soa=False,
):
    """Two-tier fused momentum + continuity pair pass (continuity-density
    mode on the spill layout); the drho counterpart of
    :func:`accel_spill`.  Returns ``(out4_a, out4_b)``, each
    ``[n_cells, K, 4]`` float32 with columns [acc_x, acc_y, acc_z,
    drho/dt] - four flag-gated tier passes (AA, AB, BA, BB), each ONE
    MXU sweep producing both outputs."""
    if interpret is None:
        interpret = _interpret_default()
    if wrap_axes is not None and any(wrap_axes):
        g, src, shift, interior = _ghost_maps(grid, tuple(map(bool, wrap_axes)))
        xa, ma = _ghost_tier(dense_x_a, mask_a, src, shift, soa)
        xb, mb = _ghost_tier(dense_x_b, mask_b, src, shift, soa)
        va = dense_v_a[:, src] if soa else dense_v_a[src]
        vb = dense_v_b[:, src] if soa else dense_v_b[src]
        oa, ob = accel_drho_spill(
            xa, va, dense_rho_a[src], dense_p_a[src], ma,
            xb, vb, dense_rho_b[src], dense_p_b[src], mb,
            g, params, kernel=kernel, delta_sph=delta_sph, block=block,
            interpret=interpret, soa=soa,
        )
        return oa[interior], ob[interior]
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = (
        _packed_geometry(grid, block)
    )
    pa = _pack_accel_fields(
        dense_x_a, dense_v_a, dense_rho_a, dense_p_a, mask_a, grid, soa,
        params, kernel, f, nzp, pad_r, cp_r,
    )
    pb = _pack_accel_fields(
        dense_x_b, dense_v_b, dense_rho_b, dense_p_b, mask_b, grid, soa,
        params, kernel, f, nzp, pad_r, cp_r,
    )
    fa = _block_flags(pa[8], pad_r, nblocks, block, astarts, wlen)
    fb = _block_flags(pb[8], pad_r, nblocks, block, astarts, wlen)

    args = (grid, params, kernel, delta_sph, block, interpret)
    aa = _accel_drho_call_self(fa, pa, *args)
    ab = _accel_drho_call_cross(_cross_flags(fa, fb), pa, pb, *args)
    ba = _accel_drho_call_cross(_cross_flags(fb, fa), pb, pa, *args)
    bb = _accel_drho_call_self(fb, pb, *args)

    def unpack4(parts):
        return jnp.stack(
            [_unpack_rows(p_, grid, f, nzp, rows) for p_ in parts], axis=-1
        )

    out_a = unpack4([aa[i] + ab[i] for i in range(4)])
    out_b = unpack4([bb[i] + ba[i] for i in range(4)])
    return out_a, out_b


# ---------------------------------------------------------------------------
# Periodic boundaries: pre-shifted ghost-cell halos
#
# The windowed-stencil kernels rely on the 27 neighbors of a contiguous cell
# block living in 9 contiguous windows - modular wrap at a grid face breaks
# that contiguity, so periodicity is handled OUTSIDE the kernels: the dense
# cell array grows one ghost layer per wrapped axis, each ghost cell holding a
# copy of its periodic image with positions pre-shifted by +-L.  Interior
# cells then see geometrically true neighbors everywhere (no minimum-image
# needed in-kernel, no kernel changes at all: the in-kernel bounds check is
# trivially true on wrapped axes for interior cells, and ghost rows' outputs
# are discarded).  This is the jnp path's wrapped neighbor_table
# (tpgsd/sph/cells.py) re-expressed as sequential-DMA-friendly data layout.
# Cost: one gather to build the halo + the ghost rows' pair math
# (~(n+2)^3/n^3 - 1, i.e. ~20% at 30^3 grids).
# ---------------------------------------------------------------------------


def _ghost_maps(grid, wrap_axes):
    """Trace-time ghost-halo maps for ``wrap_axes`` (3 bools).

    Returns ``(ghost_grid, src, shift, interior)``: ``src[Cg]`` is each
    ghost-grid cell's source cell id in the original grid, ``shift[Cg, 3]``
    the periodic-image position offset, ``interior[C]`` the ghost-linear
    ids of the original cells in original order.
    """
    nx, ny, nz = grid.dims
    g = grid._replace(
        dims=tuple(d + 2 * int(w) for d, w in zip(grid.dims, wrap_axes)),
        lo=tuple(
            l - grid.cell_size * int(w) for l, w in zip(grid.lo, wrap_axes)
        ),
    )
    coords, images = [], []
    for n, w in zip(grid.dims, wrap_axes):
        c = np.arange(n + 2 * int(w)) - int(w)
        images.append(np.where(c < 0, -1, np.where(c >= n, 1, 0)))
        coords.append(np.mod(c, n))
    sx, sy, sz = np.meshgrid(*coords, indexing="ij")
    mx, my, mz = np.meshgrid(*images, indexing="ij")
    src = ((sx * ny + sy) * nz + sz).astype(np.int32).ravel()
    ext = grid.cell_size * np.asarray(grid.dims, np.float64)
    shift = np.stack(
        [mx.ravel() * ext[0], my.ravel() * ext[1], mz.ravel() * ext[2]],
        axis=-1,
    ).astype(np.float32)
    interior = np.nonzero(
        ((mx == 0) & (my == 0) & (mz == 0)).ravel()
    )[0].astype(np.int32)
    return g, src, shift, interior


def _use_packed(grid):
    k = grid.capacity
    return k <= 64


def supported(grid):
    """True when the Pallas path MEASURES faster than the XLA path for
    this grid's capacity (v5e, dam-break workloads, MXU-factorized
    kernels): lane-native multiples of 128 (2.9x at 6.4k) and the
    generalized ragged packing for 24 <= K <= 64 (1.39x at K=48/100k,
    2.0x at K=64/34k, 1.46x at K=32/100k, 1.89x at K=24/6.4k - the
    round-2 "unproven f >= 4" gap is closed; parity 1e-5).  K=16
    (f=8) stalls the Mosaic compile and sits below any realistic 3-D
    occupancy (a 2h cell holds >= ~17 particles), so it stays off."""
    k = grid.capacity
    return k % 128 == 0 or (24 <= k <= 64 and k % 8 == 0)


def default_block(grid):
    """Measured-best block (v5e): 16 for both paths (with the one-DMA
    window layout and occupancy flags, 16 beats 8 at every size
    measured: 12.5k, 100k particles; 24+ stalls the Mosaic compile)."""
    return 16


def _interpret_default():
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "params", "kernel", "block", "interpret", "wrap_axes", "soa"
    ),
)
def density(
    dense_x,
    mask,
    grid,
    params,
    kernel=WendlandC2,
    block=DEFAULT_BLOCK,
    interpret=None,
    wrap_axes=None,
    soa=False,
):
    """Per-slot SPH density via the windowed-stencil Pallas kernel.

    Args:
        dense_x: ``[n_cells + 1, K, 3]`` cell-dense positions
            (from :func:`tpgsd.sph.cells.scatter_to_cells`), or with
            ``soa=True`` the ``[3, n_cells, K]`` planes-major layout
            from the faster :func:`tpgsd.sph.cells.scatter_to_cells_soa`
            (no transpose needed - the kernels consume SoA natively).
        mask: ``[n_cells + 1, K]`` bool live-slot mask.
        grid: static :class:`tpgsd.sph.cells.CellGrid`.
        wrap_axes: optional static 3-tuple of bools - wrap these axes
            periodically via a pre-shifted ghost-cell halo (matches the
            jnp path's wrapped ``neighbor_table`` + minimum image).

    Returns:
        ``[n_cells, K]`` float32 density (0 in dead slots), matching the
        jnp reference path ``tpgsd.sph.step._density_blocks``.
    """
    if interpret is None:
        interpret = _interpret_default()
    if wrap_axes is not None and any(wrap_axes):
        g, src, shift, interior = _ghost_maps(grid, tuple(map(bool, wrap_axes)))
        if soa:
            ghost_x = (
                dense_x[:, src]
                + jnp.moveaxis(jnp.asarray(shift), -1, 0)[:, :, None]
            )
        else:
            ghost_x = dense_x[src] + shift[:, None, :]
        rho_g = density(
            ghost_x,
            mask[src],
            g,
            params,
            kernel=kernel,
            block=block,
            interpret=interpret,
            soa=soa,
        )
        return rho_g[interior]
    if _use_packed(grid):
        return _density_packed(
            dense_x, mask, grid, params, kernel, block, interpret, soa=soa
        )
    nx, ny, nz, c, pad, nblocks, cp, astarts, extras, wlen, kp = _geometry(
        grid, block
    )
    k = grid.capacity

    # mask rides as the 4th SoA plane so each window is ONE DMA
    m_soa = _pad_cells_to(mask[:c].astype(jnp.float32), c, pad, cp, kp)
    x_soa = (
        _pad_cells_to(dense_x[:, :c].astype(jnp.float32), c, pad, cp, kp)
        if soa
        else _soa(dense_x.astype(jnp.float32), c, pad, cp, kp)
    )
    xm_soa = jnp.concatenate([x_soa, m_soa[None]], axis=0)  # [4, Cp, Kp]
    flags = _block_flags(m_soa, pad, nblocks, block, astarts, wlen)

    kern = functools.partial(
        _density_kernel, grid=grid, params=params, kernel=kernel, block=block
    )
    rho = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (block, kp), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 4, wlen, kp), jnp.float32),
                pltpu.SemaphoreType.DMA((9,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * block, kp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # unrolled-body scoped stack exceeds the conservative 16 MB
            # default at block >= 16; v5e has 128 MB VMEM per core
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, xm_soa)
    return rho[:c, :k]


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "params", "kernel", "block", "interpret", "wrap_axes", "soa"
    ),
)
def accel(
    dense_x,
    dense_v,
    dense_rho,
    dense_p,
    mask,
    grid,
    params,
    kernel=WendlandC2,
    block=DEFAULT_BLOCK,
    interpret=None,
    wrap_axes=None,
    soa=False,
):
    """Per-slot SPH acceleration (pressure + artificial viscosity).

    Same contract as ``tpgsd.sph.step._accel_blocks``: returns
    ``[n_cells, K, 3]`` float32.  ``wrap_axes`` as in :func:`density`;
    with ``soa=True``, ``dense_x``/``dense_v`` are the ``[3, n_cells,
    K]`` planes-major layout from ``scatter_to_cells_soa``.
    """
    if interpret is None:
        interpret = _interpret_default()
    if wrap_axes is not None and any(wrap_axes):
        g, src, shift, interior = _ghost_maps(grid, tuple(map(bool, wrap_axes)))
        if soa:
            ghost_x = (
                dense_x[:, src]
                + jnp.moveaxis(jnp.asarray(shift), -1, 0)[:, :, None]
            )
            ghost_v = dense_v[:, src]
        else:
            ghost_x = dense_x[src] + shift[:, None, :]
            ghost_v = dense_v[src]
        acc_g = accel(
            ghost_x,
            ghost_v,
            dense_rho[src],
            dense_p[src],
            mask[src],
            g,
            params,
            kernel=kernel,
            block=block,
            interpret=interpret,
            soa=soa,
        )
        return acc_g[interior]
    if _use_packed(grid):
        return _accel_packed(
            dense_x, dense_v, dense_rho, dense_p, mask, grid, params,
            kernel, block, interpret, soa=soa,
        )
    nx, ny, nz, c, pad, nblocks, cp, astarts, extras, wlen, kp = _geometry(
        grid, block
    )
    k = grid.capacity

    # plane 7 = pre-scaled cfold*p/rho^2 (see _accel_packed); mask rides
    # as the 9th SoA plane so each window is ONE DMA
    cfold, _ = _accel_folds(params, kernel)
    rho_f = dense_rho[:c].astype(jnp.float32)
    pt = cfold * dense_p[:c].astype(jnp.float32) / (rho_f * rho_f + 1e-30)
    if soa:
        x_soa = dense_x[:, :c].astype(jnp.float32)
        v_soa = dense_v[:, :c].astype(jnp.float32)
    else:
        x_soa = jnp.moveaxis(dense_x[:c].astype(jnp.float32), -1, 0)
        v_soa = jnp.moveaxis(dense_v[:c].astype(jnp.float32), -1, 0)
    fields = jnp.concatenate(
        [
            x_soa,
            v_soa,
            rho_f[None],
            pt[None],
            mask[:c].astype(jnp.float32)[None],
        ],
        axis=0,
    )  # [9, C, K]
    f_soa = _pad_cells_to(fields, c, pad, cp, kp)
    flags = _block_flags(f_soa[8], pad, nblocks, block, astarts, wlen)

    kern = functools.partial(
        _accel_kernel, grid=grid, params=params, kernel=kernel, block=block
    )
    ax, ay, az = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple(
                pl.BlockSpec(
                    (block, kp), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                )
                for _ in range(3)
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 9, wlen, kp), jnp.float32),
                pltpu.SemaphoreType.DMA((9,)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block, kp), jnp.float32)
            for _ in range(3)
        ),
        compiler_params=pltpu.CompilerParams(
            # the unrolled 9-offset body needs ~17 MB of scoped
            # stack; the default 16 MB cap is conservative
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, f_soa)
    return jnp.stack([ax[:c, :k], ay[:c, :k], az[:c, :k]], axis=-1)


def accel_drho_supported(grid):
    """True when :func:`accel_drho` has a kernel for this capacity -
    the same regimes as :func:`supported`: lane-native multiples of
    128, and the packed ragged layout for 24 <= K <= 64 (the fused
    kernel reuses the momentum kernel's packing verbatim, see
    :func:`_accel_drho_kernel_packed`)."""
    return supported(grid)


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid", "params", "kernel", "delta_sph", "block", "interpret",
        "wrap_axes", "soa",
    ),
)
def accel_drho(
    dense_x,
    dense_v,
    dense_rho,
    dense_p,
    mask,
    grid,
    params,
    kernel=WendlandC2,
    delta_sph=0.1,
    block=DEFAULT_BLOCK,
    interpret=None,
    wrap_axes=None,
    soa=False,
):
    """Fused momentum + continuity pair pass (continuity-density mode).

    Same contract as ``tpgsd.sph.step._accel_drho_blocks``: returns
    ``[n_cells, K, 4]`` float32 with columns [acc_x, acc_y, acc_z,
    drho/dt] - ONE neighbor sweep produces both, sharing every pair
    term (see :func:`_accel_drho_kernel`).  ``wrap_axes``/``soa`` as in
    :func:`accel`.  Kernels exist for the same capacity regimes as
    :func:`accel` (lane-native multiples of 128, packed 24-64); gate
    with :func:`accel_drho_supported`.
    """
    if interpret is None:
        interpret = _interpret_default()
    # dispatch mirrors accel exactly: packed rows for k <= 64, the
    # lane-padded plain kernel (kp = round_up(k, 128)) for everything
    # else - every capacity accel covers, accel_drho covers
    if wrap_axes is not None and any(wrap_axes):
        g, src, shift, interior = _ghost_maps(grid, tuple(map(bool, wrap_axes)))
        if soa:
            ghost_x = (
                dense_x[:, src]
                + jnp.moveaxis(jnp.asarray(shift), -1, 0)[:, :, None]
            )
            ghost_v = dense_v[:, src]
        else:
            ghost_x = dense_x[src] + shift[:, None, :]
            ghost_v = dense_v[src]
        out_g = accel_drho(
            ghost_x,
            ghost_v,
            dense_rho[src],
            dense_p[src],
            mask[src],
            g,
            params,
            kernel=kernel,
            delta_sph=delta_sph,
            block=block,
            interpret=interpret,
            soa=soa,
        )
        return out_g[interior]
    if _use_packed(grid):
        return _accel_drho_packed(
            dense_x, dense_v, dense_rho, dense_p, mask, grid, params,
            kernel, delta_sph, block, interpret, soa=soa,
        )
    nx, ny, nz, c, pad, nblocks, cp, astarts, extras, wlen, kp = _geometry(
        grid, block
    )
    k = grid.capacity

    cfold, _ = _accel_folds(params, kernel)
    rho_f = dense_rho[:c].astype(jnp.float32)
    pt = cfold * dense_p[:c].astype(jnp.float32) / (rho_f * rho_f + 1e-30)
    if soa:
        x_soa = dense_x[:, :c].astype(jnp.float32)
        v_soa = dense_v[:, :c].astype(jnp.float32)
    else:
        x_soa = jnp.moveaxis(dense_x[:c].astype(jnp.float32), -1, 0)
        v_soa = jnp.moveaxis(dense_v[:c].astype(jnp.float32), -1, 0)
    fields = jnp.concatenate(
        [
            x_soa,
            v_soa,
            rho_f[None],
            pt[None],
            mask[:c].astype(jnp.float32)[None],
        ],
        axis=0,
    )  # [9, C, K]
    f_soa = _pad_cells_to(fields, c, pad, cp, kp)
    flags = _block_flags(f_soa[8], pad, nblocks, block, astarts, wlen)

    kern = functools.partial(
        _accel_drho_kernel, grid=grid, params=params, kernel=kernel,
        block=block, delta_sph=float(delta_sph),
    )
    ax, ay, az, dr = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple(
                pl.BlockSpec(
                    (block, kp), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                )
                for _ in range(4)
            ),
            scratch_shapes=[
                pltpu.VMEM((9, 9, wlen, kp), jnp.float32),
                pltpu.SemaphoreType.DMA((9,)),
            ],
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block, kp), jnp.float32)
            for _ in range(4)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(flags, f_soa)
    return jnp.stack(
        [ax[:c, :k], ay[:c, :k], az[:c, :k], dr[:c, :k]], axis=-1
    )
