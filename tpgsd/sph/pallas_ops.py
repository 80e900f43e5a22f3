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
unreliable on tunneled runtimes):

* capacity 128 (lane-native): **pallas 8.9 ms/step (block 16) vs jnp
  14.9 - 1.68x faster** (6.4k-particle dam break, 50 steps).  Block
  32's unrolled body stalls the compiler; 16 is the tuned default.
* capacity 64 (packed, f=2, composite outer rows): **pallas 7.94
  ms/step (block 8) vs jnp 9.04 - 1.15x faster** (12.5k-particle dam
  break, 50 steps).  Without packing the lane padding cost 4x the
  pair math (0.4x of jnp); packing recovered 1.8x and the composite
  outer-row merge (27 -> 18 slices) the rest.
* capacities 32/16/8 pack at f = 128/K with the same kernels (the
  f=2 composite specialization applies only to 64).

Both kernels are fully unrolled with static window slices - fori_loop /
dynamic-slice variants measured 3-5x slower.  The accel body needs
~44 MB of VMEM scoped stack (`vmem_limit_bytes` raised accordingly);
v5e carries 128 MB of VMEM per core.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import WendlandC2

DEFAULT_BLOCK = 8


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
    x_hbm, m_hbm, rho_ref, xw, mw, sems, *, grid, params, kernel, block
):
    nx, ny, nz = grid.dims
    _, _, _, _, pad, _, _, astarts, extras, wlen, kp = _geometry(grid, block)

    i = pl.program_id(0)
    base = i * block  # multiple of 8; astarts carry the pad

    xcopies = _start_window_dmas(x_hbm, xw, sems, 0, base, astarts, wlen)
    mcopies = _start_window_dmas(m_hbm, mw, sems, 9, base, astarts, wlen)
    for c_ in xcopies + mcopies:
        c_.wait()

    ix, iy, iz = _cell_coords(i * block, block, ny, nz)

    # center block = middle window (dx=0, dy=0), dz=0 slice
    e4 = extras[4]
    xc = xw[4, :, e4 + 1 : e4 + 1 + block]  # [3, B, Kp]
    mc = mw[4, e4 + 1 : e4 + 1 + block]  # [B, Kp]

    # fully unrolled 27-offset pair loop with static window slices: the
    # density body is small enough for the VMEM scoped stack, and the
    # unrolled form measures ~3x faster than a fori_loop over scratch
    # (matching the XLA-fused jnp path)
    acc = jnp.zeros((block, kp), jnp.float32)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    for w, (dx, dy) in enumerate(offs):
        e = extras[w]
        for dz in (-1, 0, 1):
            yb = xw[w, :, e + 1 + dz : e + 1 + dz + block]  # [3, B, Kp]
            ym = mw[w, e + 1 + dz : e + 1 + dz + block]  # [B, Kp]
            valid = _offset_valid(ix, iy, iz, dx, dy, dz, nx, ny, nz)
            pm = ym[:, None, :] * valid[:, :, None]  # [B, 1, Kp]
            ddx = xc[0][:, :, None] - yb[0][:, None, :]  # [B, Kp, Kp]
            ddy = xc[1][:, :, None] - yb[1][:, None, :]
            ddz = xc[2][:, :, None] - yb[2][:, None, :]
            r = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            acc = acc + jnp.sum(
                kernel.w(r, params.h, dim=params.dim) * pm, axis=-1
            )
    rho_ref[:] = params.mass * acc * mc


def _accel_kernel(
    f_hbm, m_hbm, ax_ref, ay_ref, az_ref, fw, mw, sems,
    *, grid, params, kernel, block, w_subset
):
    """One dx-plane of the acceleration: fully unrolled pair loop over
    the (dx, dy) windows in ``w_subset`` (a static subset of 0..8).

    The full 27-offset unrolled body overflows the ~16 MB VMEM scoped
    stack (Mosaic's stack charge scales with unrolled iteration count),
    so the 27 offsets are split across three kernel invocations - one
    per dx plane - whose partial sums add outside.  Static slicing is
    what keeps the unrolled form fast; fori/dynamic-slice variants
    measured 3-5x slower.

    f_hbm: ``[8, Cp, Kp]`` SoA fields (x,y,z, vx,vy,vz, rho, p).
    """
    nx, ny, nz = grid.dims
    _, _, _, _, pad, _, _, astarts, extras, wlen, kp = _geometry(grid, block)
    h2eps = params.eps * params.h * params.h

    i = pl.program_id(0)
    base = i * block

    fcopies = _start_window_dmas(
        f_hbm, fw, sems, 0, base,
        [astarts[w] for w in w_subset], wlen,
    )
    mcopies = _start_window_dmas(
        m_hbm, mw, sems, len(w_subset), base,
        [astarts[w] for w in w_subset], wlen,
    )
    for c_ in fcopies + mcopies:
        c_.wait()

    ix, iy, iz = _cell_coords(i * block, block, ny, nz)

    # center block: always DMA'd (window 4 may not be in this subset),
    # cheapest as its own copy when absent
    if 4 in w_subset:
        slot4 = w_subset.index(4)
        e4 = extras[4]
        cen = fw[slot4, :, e4 + 1 : e4 + 1 + block]  # [8, B, Kp]
        mc = mw[slot4, e4 + 1 : e4 + 1 + block]
    else:
        # window 4's aligned start, staged into the spare scratch slot
        spare = len(w_subset)
        cp4 = pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(pl.multiple_of(base + astarts[4], 8), wlen), :],
            fw.at[spare],
            sems.at[2 * len(w_subset)],
        )
        cp4m = pltpu.make_async_copy(
            m_hbm.at[pl.ds(pl.multiple_of(base + astarts[4], 8), wlen), :],
            mw.at[spare],
            sems.at[2 * len(w_subset) + 1],
        )
        cp4.start()
        cp4m.start()
        cp4.wait()
        cp4m.wait()
        e4 = extras[4]
        cen = fw[spare, :, e4 + 1 : e4 + 1 + block]
        mc = mw[spare, e4 + 1 : e4 + 1 + block]

    rho_c = cen[6]
    p_c = cen[7]
    pterm_c = p_c / (rho_c * rho_c + 1e-30)

    accx = jnp.zeros((block, kp), jnp.float32)
    accy = jnp.zeros((block, kp), jnp.float32)
    accz = jnp.zeros((block, kp), jnp.float32)
    for slot, w in enumerate(w_subset):
        dx, dy = w // 3 - 1, w % 3 - 1
        e = extras[w]
        for dz in (-1, 0, 1):
            nb = fw[slot, :, e + 1 + dz : e + 1 + dz + block]  # [8, B, Kp]
            ym = mw[slot, e + 1 + dz : e + 1 + dz + block]
            valid = _offset_valid(ix, iy, iz, dx, dy, dz, nx, ny, nz)
            pm = ym[:, None, :] * valid[:, :, None]  # [B, 1, Kp]

            ddx = cen[0][:, :, None] - nb[0][:, None, :]  # [B, Kp, Kp]
            ddy = cen[1][:, :, None] - nb[1][:, None, :]
            ddz = cen[2][:, :, None] - nb[2][:, None, :]
            dvx = cen[3][:, :, None] - nb[3][:, None, :]
            dvy = cen[4][:, :, None] - nb[4][:, None, :]
            dvz = cen[5][:, :, None] - nb[5][:, None, :]
            rho_n = nb[6][:, None, :]
            p_n = nb[7][:, None, :]

            r2 = ddx * ddx + ddy * ddy + ddz * ddz
            r = jnp.sqrt(r2)
            dwr = kernel.dw_over_r(r, params.h, dim=params.dim)  # [B, Kp, Kp]

            press = pterm_c[:, :, None] + p_n / (rho_n * rho_n + 1e-30)

            vdotx = dvx * ddx + dvy * ddy + dvz * ddz
            rho_bar = 0.5 * (rho_c[:, :, None] + rho_n)
            pi = jnp.where(
                vdotx < 0.0,
                -params.alpha * params.c0 * params.h
                * (vdotx / (r2 + h2eps)) / rho_bar,
                0.0,
            )

            scale = -params.mass * (press + pi) * dwr * pm  # [B, Kp, Kp]
            accx = accx + jnp.sum(scale * ddx, axis=-1)
            accy = accy + jnp.sum(scale * ddy, axis=-1)
            accz = accz + jnp.sum(scale * ddz, axis=-1)

    ax_ref[:] = accx * mc
    ay_ref[:] = accy * mc
    az_ref[:] = accz * mc


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
    """Static geometry of the packed layout (see module comment above)."""
    if block % 8 != 0:
        raise ValueError("pallas block must be a multiple of 8")
    k = grid.capacity
    if k >= 128 or 128 % k != 0:
        raise ValueError("packed path needs capacity dividing 128, got %d" % k)
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
    """``[..., C(+1), K]`` -> packed padded ``[..., cp_r, 128]``."""
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
    widths = [(0, 0)] * len(lead) + [(pad_r, trail), (0, 0)]
    return jnp.pad(a, widths)


def _unpack_rows(out, grid, f, nzp, rows):
    """Packed ``[>=rows, 128]`` kernel output -> ``[n_cells, K]``."""
    nx, ny, nz = grid.dims
    k = grid.capacity
    a = out[:rows].reshape(nx, ny, nzp, k)[:, :, :nz]
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


def _packed_slices(xw, mw, w, e, block, f, k, izb, a_n, dh, nzp):
    """Yield (fields, mask, D, zn) pair-slices for window ``w``.

    ``D`` is the static lane-quadrant validity (None = all-valid);
    ``zn`` the [B, 128] neighbor z coordinate to bounds-check.

    For f == 2 the j=0 and j=2 row-slices each hold a single useful
    K x K quadrant (dz = -1 pairs center half 0, dz = +1 pairs half 1),
    so they are merged into one composite slice by lane-concatenating
    the two needed halves - 2 slices of pair math per window instead
    of 3 (27 -> 18 total), the difference between losing and beating
    the XLA path at the default capacity 64.
    """
    if f == 2:
        # middle row: every (hc, hn) quadrant valid (|dz| <= 1 always)
        yield (
            xw[w, :, e + 1 : e + 1 + block],
            mw[w, e + 1 : e + 1 + block],
            None,
            izb + a_n,
        )
        # composite of the two outer rows: lanes 0:K = row j=2 half 0
        # (dz=+1 for center half 1), lanes K: = row j=0 half 1 (dz=-1
        # for center half 0)
        hi = xw[w, :, e + 2 : e + 2 + block]
        lo = xw[w, :, e : e + block]
        comp = jnp.concatenate([hi[..., :k], lo[..., k:]], axis=-1)
        m_comp = jnp.concatenate(
            [
                mw[w, e + 2 : e + 2 + block][..., :k],
                mw[w, e : e + block][..., k:],
            ],
            axis=-1,
        )
        D = (dh != 0).astype(jnp.float32)  # anti-diagonal quadrants
        zn = izb + jnp.where(a_n == 0, f, -1)
        yield comp, m_comp, D, zn
    else:
        for j in (0, 1, 2):
            c0 = f * (j - 1)
            yield (
                xw[w, :, e + j : e + j + block],
                mw[w, e + j : e + j + block],
                _band_matrix(c0, dh),
                izb + (c0 + a_n),
            )


def _density_kernel_packed(
    x_hbm, m_hbm, rho_ref, xw, mw, sems, *, grid, params, kernel, block, f, nzp
):
    nx, ny, nz = grid.dims
    k = grid.capacity
    _, _, _, pad_r, _, _, astarts, extras, wlen = _packed_geometry(grid, block)

    i = pl.program_id(0)
    base = i * block

    xcopies = _start_window_dmas(x_hbm, xw, sems, 0, base, astarts, wlen)
    mcopies = _start_window_dmas(m_hbm, mw, sems, 9, base, astarts, wlen)
    for c_ in xcopies + mcopies:
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
    xc = xw[4, :, e4 + 1 : e4 + 1 + block]  # [3, B, 128]
    mc = mw[4, e4 + 1 : e4 + 1 + block]  # [B, 128]

    acc = jnp.zeros((block, 128), jnp.float32)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    for w, (dx, dy) in enumerate(offs):
        e = extras[w]
        xy_ok = (
            (ix + dx >= 0) & (ix + dx < nx) & (iy + dy >= 0) & (iy + dy < ny)
        ).astype(jnp.float32)  # [B, 1]
        for yb, ym, D, zn in _packed_slices(
            xw, mw, w, e, block, f, k, izb, a_n, dh, nzp
        ):
            z_ok = ((zn >= 0) & (zn < nzp)).astype(jnp.float32)
            pm = ym * z_ok * xy_ok  # [B, 128]
            ddx = xc[0][:, :, None] - yb[0][:, None, :]  # [B, 128, 128]
            ddy = xc[1][:, :, None] - yb[1][:, None, :]
            ddz = xc[2][:, :, None] - yb[2][:, None, :]
            r = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            wv = kernel.w(r, params.h, dim=params.dim)
            if D is not None:
                wv = wv * D[None, :, :]
            acc = acc + jnp.sum(wv * pm[:, None, :], axis=-1)
    rho_ref[:] = params.mass * acc * mc


def _accel_kernel_packed(
    f_hbm, m_hbm, ax_ref, ay_ref, az_ref, fw, mw, sems,
    *, grid, params, kernel, block, f, nzp
):
    nx, ny, nz = grid.dims
    k = grid.capacity
    _, _, _, pad_r, _, _, astarts, extras, wlen = _packed_geometry(grid, block)
    h2eps = params.eps * params.h * params.h

    i = pl.program_id(0)
    base = i * block

    fcopies = _start_window_dmas(f_hbm, fw, sems, 0, base, astarts, wlen)
    mcopies = _start_window_dmas(m_hbm, mw, sems, 9, base, astarts, wlen)
    for c_ in fcopies + mcopies:
        c_.wait()

    row = i * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
    cell0 = f * row
    ix = cell0 // (ny * nzp)
    rem = cell0 - ix * (ny * nzp)
    iy = rem // nzp
    izb = rem - iy * nzp  # [B, 1]

    a_n, dh = _lane_half_vectors(k)

    e4 = extras[4]
    cen = fw[4, :, e4 + 1 : e4 + 1 + block]  # [8, B, 128]
    mc = mw[4, e4 + 1 : e4 + 1 + block]

    rho_c = cen[6]
    p_c = cen[7]
    pterm_c = p_c / (rho_c * rho_c + 1e-30)

    accx = jnp.zeros((block, 128), jnp.float32)
    accy = jnp.zeros((block, 128), jnp.float32)
    accz = jnp.zeros((block, 128), jnp.float32)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    for w, (dx, dy) in enumerate(offs):
        e = extras[w]
        xy_ok = (
            (ix + dx >= 0) & (ix + dx < nx) & (iy + dy >= 0) & (iy + dy < ny)
        ).astype(jnp.float32)  # [B, 1]
        for nb, ym, D, zn in _packed_slices(
            fw, mw, w, e, block, f, k, izb, a_n, dh, nzp
        ):
            z_ok = ((zn >= 0) & (zn < nzp)).astype(jnp.float32)
            pm = ym * z_ok * xy_ok  # [B, 128]
            if D is not None:
                pm3 = D[None, :, :] * pm[:, None, :]
            else:
                pm3 = pm[:, None, :]

            ddx = cen[0][:, :, None] - nb[0][:, None, :]  # [B, 128, 128]
            ddy = cen[1][:, :, None] - nb[1][:, None, :]
            ddz = cen[2][:, :, None] - nb[2][:, None, :]
            dvx = cen[3][:, :, None] - nb[3][:, None, :]
            dvy = cen[4][:, :, None] - nb[4][:, None, :]
            dvz = cen[5][:, :, None] - nb[5][:, None, :]
            rho_n = nb[6][:, None, :]
            p_n = nb[7][:, None, :]

            r2 = ddx * ddx + ddy * ddy + ddz * ddz
            r = jnp.sqrt(r2)
            dwr = kernel.dw_over_r(r, params.h, dim=params.dim)

            press = pterm_c[:, :, None] + p_n / (rho_n * rho_n + 1e-30)

            vdotx = dvx * ddx + dvy * ddy + dvz * ddz
            rho_bar = 0.5 * (rho_c[:, :, None] + rho_n)
            pi = jnp.where(
                vdotx < 0.0,
                -params.alpha * params.c0 * params.h
                * (vdotx / (r2 + h2eps)) / rho_bar,
                0.0,
            )

            scale = -params.mass * (press + pi) * dwr * pm3
            accx = accx + jnp.sum(scale * ddx, axis=-1)
            accy = accy + jnp.sum(scale * ddy, axis=-1)
            accz = accz + jnp.sum(scale * ddz, axis=-1)

    ax_ref[:] = accx * mc
    ay_ref[:] = accy * mc
    az_ref[:] = accz * mc


def _density_packed(dense_x, mask, grid, params, kernel, block, interpret):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = _packed_geometry(
        grid, block
    )
    x_soa = jnp.moveaxis(dense_x[: grid.n_cells].astype(jnp.float32), -1, 0)
    x_pk = _pack_dense(x_soa, grid, f, nzp, pad_r, cp_r)  # [3, cp_r, 128]
    m_pk = _pack_dense(
        mask[: grid.n_cells].astype(jnp.float32), grid, f, nzp, pad_r, cp_r
    )

    kern = functools.partial(
        _density_kernel_packed, grid=grid, params=params, kernel=kernel,
        block=block, f=f, nzp=nzp,
    )
    rho = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((9, 3, wlen, 128), jnp.float32),
            pltpu.VMEM((9, wlen, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((18,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_pk, m_pk)
    return _unpack_rows(rho, grid, f, nzp, rows)


def _accel_packed(
    dense_x, dense_v, dense_rho, dense_p, mask, grid, params, kernel, block,
    interpret,
):
    f, nzp, rows, pad_r, nblocks, cp_r, astarts, extras, wlen = _packed_geometry(
        grid, block
    )
    c = grid.n_cells
    fields = jnp.concatenate(
        [
            jnp.moveaxis(dense_x[:c].astype(jnp.float32), -1, 0),
            jnp.moveaxis(dense_v[:c].astype(jnp.float32), -1, 0),
            dense_rho[:c].astype(jnp.float32)[None],
            dense_p[:c].astype(jnp.float32)[None],
        ],
        axis=0,
    )  # [8, C, K]
    f_pk = _pack_dense(fields, grid, f, nzp, pad_r, cp_r)
    m_pk = _pack_dense(mask[:c].astype(jnp.float32), grid, f, nzp, pad_r, cp_r)

    kern = functools.partial(
        _accel_kernel_packed, grid=grid, params=params, kernel=kernel,
        block=block, f=f, nzp=nzp,
    )
    ax, ay, az = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec((block, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block, 128), jnp.float32)
            for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((9, 8, wlen, 128), jnp.float32),
            pltpu.VMEM((9, wlen, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((18,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(f_pk, m_pk)
    return jnp.stack(
        [
            _unpack_rows(ax, grid, f, nzp, rows),
            _unpack_rows(ay, grid, f, nzp, rows),
            _unpack_rows(az, grid, f, nzp, rows),
        ],
        axis=-1,
    )


def _use_packed(grid):
    k = grid.capacity
    return k < 128 and 128 % k == 0


def supported(grid):
    """True when the Pallas path MEASURES faster than the XLA path for
    this grid's capacity (v5e): lane-native multiples of 128 (1.68x)
    and the f=2 packing at capacity 64 (1.15-1.24x).  Deeper packings
    (capacity <= 32) run but lose to XLA - their j=0/j=2 slices use
    1/f^2 of the lane math (no composite merge below f=2 yet); the
    ``use_pallas="auto"`` policy keeps the jnp path there."""
    k = grid.capacity
    return k % 128 == 0 or k == 64


def default_block(grid):
    """Measured-best block per path (v5e): 8 packed, 16 lane-native."""
    return 8 if _use_packed(grid) else 16


def _interpret_default():
    return jax.default_backend() != "tpu"


@functools.partial(
    jax.jit, static_argnames=("grid", "params", "kernel", "block", "interpret")
)
def density(dense_x, mask, grid, params, kernel=WendlandC2, block=DEFAULT_BLOCK, interpret=None):
    """Per-slot SPH density via the windowed-stencil Pallas kernel.

    Args:
        dense_x: ``[n_cells + 1, K, 3]`` cell-dense positions
            (from :func:`tpgsd.sph.cells.scatter_to_cells`).
        mask: ``[n_cells + 1, K]`` bool live-slot mask.
        grid: static :class:`tpgsd.sph.cells.CellGrid`.

    Returns:
        ``[n_cells, K]`` float32 density (0 in dead slots), matching the
        jnp reference path ``tpgsd.sph.step._density_blocks``.
    """
    if interpret is None:
        interpret = _interpret_default()
    if _use_packed(grid):
        return _density_packed(
            dense_x, mask, grid, params, kernel, block, interpret
        )
    nx, ny, nz, c, pad, nblocks, cp, astarts, extras, wlen, kp = _geometry(
        grid, block
    )
    k = grid.capacity

    x_soa = _soa(dense_x.astype(jnp.float32), c, pad, cp, kp)  # [3, Cp, Kp]
    m_soa = _pad_cells_to(mask[:c].astype(jnp.float32), c, pad, cp, kp)

    kern = functools.partial(
        _density_kernel, grid=grid, params=params, kernel=kernel, block=block
    )
    rho = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, kp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * block, kp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((9, 3, wlen, kp), jnp.float32),
            pltpu.VMEM((9, wlen, kp), jnp.float32),
            pltpu.SemaphoreType.DMA((18,)),
        ],
        compiler_params=pltpu.CompilerParams(
            # unrolled-body scoped stack exceeds the conservative 16 MB
            # default at block >= 16; v5e has 128 MB VMEM per core
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_soa, m_soa)
    return rho[:c, :k]


@functools.partial(
    jax.jit, static_argnames=("grid", "params", "kernel", "block", "interpret")
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
):
    """Per-slot SPH acceleration (pressure + artificial viscosity).

    Same contract as ``tpgsd.sph.step._accel_blocks``: returns
    ``[n_cells, K, 3]`` float32.
    """
    if interpret is None:
        interpret = _interpret_default()
    if _use_packed(grid):
        return _accel_packed(
            dense_x, dense_v, dense_rho, dense_p, mask, grid, params,
            kernel, block, interpret,
        )
    nx, ny, nz, c, pad, nblocks, cp, astarts, extras, wlen, kp = _geometry(
        grid, block
    )
    k = grid.capacity

    fields = jnp.concatenate(
        [
            jnp.moveaxis(dense_x[:c].astype(jnp.float32), -1, 0),
            jnp.moveaxis(dense_v[:c].astype(jnp.float32), -1, 0),
            dense_rho[:c].astype(jnp.float32)[None],
            dense_p[:c].astype(jnp.float32)[None],
        ],
        axis=0,
    )  # [8, C, K]
    f_soa = _pad_cells_to(fields, c, pad, cp, kp)
    m_soa = _pad_cells_to(mask[:c].astype(jnp.float32), c, pad, cp, kp)

    # one unrolled kernel per dx plane (see _accel_kernel docstring)
    ax = ay = az = None
    for w_subset in ([0, 1, 2, 3, 4, 5, 6, 7, 8],):
        nw = len(w_subset)
        kern = functools.partial(
            _accel_kernel, grid=grid, params=params, kernel=kernel,
            block=block, w_subset=tuple(w_subset),
        )
        px, py, pz = pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=tuple(
                pl.BlockSpec((block, kp), lambda i: (i, 0), memory_space=pltpu.VMEM)
                for _ in range(3)
            ),
            out_shape=tuple(
                jax.ShapeDtypeStruct((nblocks * block, kp), jnp.float32)
                for _ in range(3)
            ),
            scratch_shapes=[
                pltpu.VMEM((nw + 1, 8, wlen, kp), jnp.float32),
                pltpu.VMEM((nw + 1, wlen, kp), jnp.float32),
                pltpu.SemaphoreType.DMA((2 * nw + 2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                # the unrolled 9-offset body needs ~17 MB of scoped
                # stack; the default 16 MB cap is conservative
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(f_soa, m_soa)
        ax = px if ax is None else ax + px
        ay = py if ay is None else ay + py
        az = pz if az is None else az + pz
    return jnp.stack([ax[:c, :k], ay[:c, :k], az[:c, :k]], axis=-1)
