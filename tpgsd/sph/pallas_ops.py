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
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import WendlandC2

DEFAULT_BLOCK = 8


def _geometry(grid, block):
    """Static geometry: padding, window offsets, block count."""
    nx, ny, nz = grid.dims
    c = grid.n_cells
    pad = ny * nz + nz + 1  # max |offset| = +-(ny*nz + nz + 1)
    nblocks = -(-c // block)
    cp = pad + nblocks * block + pad
    # window start offsets relative to the block's first (padded) cell:
    # for (dx, dy), cells [c0 + dx*ny*nz + dy*nz - 1, ... + B + 1)
    wstarts = [
        dx * ny * nz + dy * nz - 1 for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ]
    return nx, ny, nz, c, pad, nblocks, cp, wstarts


def _pad_cells_to(arr, c, pad, cp):
    """Zero-pad the cell axis (axis -2 of ``[..., C, K]``) to ``cp``."""
    trail = cp - pad - c
    widths = [(0, 0)] * (arr.ndim - 2) + [(pad, trail), (0, 0)]
    return jnp.pad(arr[..., :c, :], widths)


def _soa(dense, c, pad, cp):
    """``[C(+1), K, F]`` AoS -> ``[F, Cp, K]`` SoA, zero-padded."""
    soa = jnp.moveaxis(dense[:c], -1, 0)  # [F, C, K]
    return _pad_cells_to(soa, c, pad, cp)


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


def _start_window_dmas(src, dst, sem, sem_base, base, wstarts, window):
    """Start one DMA per (dx, dy) window: ``src[..., start:start+window, :]``
    into ``dst[w]``; returns the copy descriptors for waiting."""
    copies = []
    for w, ws in enumerate(wstarts):
        start = base + ws
        if src.ndim == 3:
            cp_ = pltpu.make_async_copy(
                src.at[:, pl.ds(start, window), :], dst.at[w], sem.at[sem_base + w]
            )
        else:
            cp_ = pltpu.make_async_copy(
                src.at[pl.ds(start, window), :], dst.at[w], sem.at[sem_base + w]
            )
        cp_.start()
        copies.append(cp_)
    return copies


def _density_kernel(
    x_hbm, m_hbm, rho_ref, xw, mw, sems, *, grid, params, kernel, block
):
    nx, ny, nz = grid.dims
    _, _, _, _, pad, _, _, wstarts = _geometry(grid, block)
    k = xw.shape[-1]
    window = block + 2

    i = pl.program_id(0)
    base = i * block + pad  # padded index of the block's first cell

    xcopies = _start_window_dmas(x_hbm, xw, sems, 0, base, wstarts, window)
    mcopies = _start_window_dmas(m_hbm, mw, sems, 9, base, wstarts, window)
    for c_ in xcopies + mcopies:
        c_.wait()

    ix, iy, iz = _cell_coords(i * block, block, ny, nz)

    # center block = middle window (dx=0, dy=0), dz=0 slice
    xc = xw[4, :, 1 : 1 + block]  # [3, B, K]
    mc = mw[4, 1 : 1 + block]  # [B, K]

    acc = jnp.zeros((block, k), jnp.float32)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    for w, (dx, dy) in enumerate(offs):
        for dz in (-1, 0, 1):
            yb = xw[w, :, 1 + dz : 1 + dz + block]  # [3, B, K]
            ym = mw[w, 1 + dz : 1 + dz + block]  # [B, K]
            valid = _offset_valid(ix, iy, iz, dx, dy, dz, nx, ny, nz)
            pm = ym[:, None, :] * valid[:, :, None]  # [B, 1, K]
            ddx = xc[0][:, :, None] - yb[0][:, None, :]  # [B, K, K]
            ddy = xc[1][:, :, None] - yb[1][:, None, :]
            ddz = xc[2][:, :, None] - yb[2][:, None, :]
            r = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            acc = acc + jnp.sum(kernel.w(r, params.h) * pm, axis=-1)

    rho_ref[:] = params.mass * acc * mc


def _accel_kernel(
    f_hbm, m_hbm, ax_ref, ay_ref, az_ref, fw, mw, sems, *, grid, params, kernel, block
):
    """f_hbm: ``[8, Cp, K]`` SoA fields (x,y,z, vx,vy,vz, rho, p)."""
    nx, ny, nz = grid.dims
    _, _, _, _, pad, _, _, wstarts = _geometry(grid, block)
    k = fw.shape[-1]
    window = block + 2
    h2eps = params.eps * params.h * params.h

    i = pl.program_id(0)
    base = i * block + pad

    fcopies = _start_window_dmas(f_hbm, fw, sems, 0, base, wstarts, window)
    mcopies = _start_window_dmas(m_hbm, mw, sems, 9, base, wstarts, window)
    for c_ in fcopies + mcopies:
        c_.wait()

    ix, iy, iz = _cell_coords(i * block, block, ny, nz)

    cen = fw[4, :, 1 : 1 + block]  # [8, B, K]
    mc = mw[4, 1 : 1 + block]
    # center p/rho^2 precomputed once
    rho_c = cen[6]
    p_c = cen[7]
    pterm_c = p_c / (rho_c * rho_c + 1e-30)

    accx = jnp.zeros((block, k), jnp.float32)
    accy = jnp.zeros((block, k), jnp.float32)
    accz = jnp.zeros((block, k), jnp.float32)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    for w, (dx, dy) in enumerate(offs):
        for dz in (-1, 0, 1):
            nb = fw[w, :, 1 + dz : 1 + dz + block]  # [8, B, K]
            ym = mw[w, 1 + dz : 1 + dz + block]
            valid = _offset_valid(ix, iy, iz, dx, dy, dz, nx, ny, nz)
            pm = ym[:, None, :] * valid[:, :, None]  # [B, 1, K]

            ddx = cen[0][:, :, None] - nb[0][:, None, :]  # [B, K, K]
            ddy = cen[1][:, :, None] - nb[1][:, None, :]
            ddz = cen[2][:, :, None] - nb[2][:, None, :]
            dvx = cen[3][:, :, None] - nb[3][:, None, :]
            dvy = cen[4][:, :, None] - nb[4][:, None, :]
            dvz = cen[5][:, :, None] - nb[5][:, None, :]
            rho_n = nb[6][:, None, :]
            p_n = nb[7][:, None, :]

            r2 = ddx * ddx + ddy * ddy + ddz * ddz
            r = jnp.sqrt(r2)
            dwr = kernel.dw_over_r(r, params.h)  # [B, K, K]

            press = pterm_c[:, :, None] + p_n / (rho_n * rho_n + 1e-30)

            vdotx = dvx * ddx + dvy * ddy + dvz * ddz
            mu = vdotx / (r2 + h2eps)
            rho_bar = 0.5 * (rho_c[:, :, None] + rho_n)
            pi = jnp.where(
                vdotx < 0.0,
                -params.alpha * params.c0 * params.h * mu / rho_bar,
                0.0,
            )

            scale = -params.mass * (press + pi) * dwr * pm  # [B, K, K]
            accx = accx + jnp.sum(scale * ddx, axis=-1)
            accy = accy + jnp.sum(scale * ddy, axis=-1)
            accz = accz + jnp.sum(scale * ddz, axis=-1)

    ax_ref[:] = accx * mc
    ay_ref[:] = accy * mc
    az_ref[:] = accz * mc


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
    nx, ny, nz, c, pad, nblocks, cp, wstarts = _geometry(grid, block)
    k = grid.capacity

    x_soa = _soa(dense_x.astype(jnp.float32), c, pad, cp)  # [3, Cp, K]
    m_soa = _pad_cells_to(mask[:c].astype(jnp.float32), c, pad, cp)  # [Cp, K]

    window = block + 2
    kern = functools.partial(
        _density_kernel, grid=grid, params=params, kernel=kernel, block=block
    )
    rho = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (block, k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * block, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((9, 3, window, k), jnp.float32),
            pltpu.VMEM((9, window, k), jnp.float32),
            pltpu.SemaphoreType.DMA((18,)),
        ],
        interpret=interpret,
    )(x_soa, m_soa)
    return rho[:c]


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
    nx, ny, nz, c, pad, nblocks, cp, wstarts = _geometry(grid, block)
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
    f_soa = _pad_cells_to(fields, c, pad, cp)
    m_soa = _pad_cells_to(mask[:c].astype(jnp.float32), c, pad, cp)

    window = block + 2
    kern = functools.partial(
        _accel_kernel, grid=grid, params=params, kernel=kernel, block=block
    )
    ax, ay, az = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=tuple(
            pl.BlockSpec((block, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((nblocks * block, k), jnp.float32)
            for _ in range(3)
        ),
        scratch_shapes=[
            pltpu.VMEM((9, 8, window, k), jnp.float32),
            pltpu.VMEM((9, window, k), jnp.float32),
            pltpu.SemaphoreType.DMA((18,)),
        ],
        interpret=interpret,
    )(f_soa, m_soa)
    return jnp.stack([ax[:c], ay[:c], az[:c]], axis=-1)
