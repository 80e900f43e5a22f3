"""3-D block-decomposed distributed SPH over a ``(px, py, pz)`` mesh.

Completes the decomposition family: the 1-D slab step
(:mod:`tpgsd.sph.distributed`) cuts one axis, the 2-D block step
(:mod:`tpgsd.sph.distributed2d`) cuts two, and this module cuts ALL
THREE - device ``(i, j, k)`` of a 3-D mesh owns the ``nxl x nyl x nzl``
cell block at block-coordinates ``(i, j, k)``, so halo traffic scales
with the block's *surface area* while owned work scales with its
volume.  This is the natural mapping to a TPU v4/v5p 3-D ICI torus,
where every ``ppermute`` hop of the dimension-ordered exchange rides a
physical neighbor link on its own torus dimension.

The collective patterns generalize the 2-D ones:

* **halo exchange** - dimension-ordered (z, then y on the z-extended
  block, then x on the yz-extended block) so all 26 neighbors' boundary
  cells arrive without explicit edge/corner messages: the y-faces
  exchanged second already contain the z-ghosts received first, and the
  x-faces exchanged last carry both.  Positions/velocities/mask ride
  ONE stacked payload per direction, and a second owner-computed rho/p
  exchange precedes the force pass.
* **three-phase migration** - particles that left their block hop along
  x, then y, then z (shared :func:`~tpgsd.sph.distributed2d._migrate_axis`
  machinery); an off-corner mover takes all three hops in one step.
  Send-side overflow keeps the particle local one more step (one-step
  delay, never loss).

Unlike the 1-D/2-D steps there is NO locally-wrapped axis: with all
three axes decomposed, every periodic wrap flows through ring halo
permutations with coordinate-shifted seam ghosts, and the local cell
table is plain (the Pallas kernels see ``wrap_axes=None``).  Capacity
model, fixed-particle support, energy and XSPH passes match the 1-D/2-D
steps; parity is tested against the single-device step and the 2-D
step on degenerate meshes.  The MPI reference has no counterpart (its
parallel axis is the I/O row partition only:
pgsd/scripts/benchmark-write.cc:30-45); this is the TPU-native
scale-out path for the SPH producer at 3-D-torus pod scales.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from .cells import CellGrid, neighbor_table
from .distributed import (
    DistAux,
    DistState,
    _gather,
    _local_cells,
    _scatter,
)
from .distributed2d import _block_perms, _migrate_axis
from .kernels import WendlandC2
from .step import (
    _accel_blocks,
    _accel_drho_blocks,
    _st_force_blocks,
    _st_normals_blocks,
    _density_blocks,
    _energy_blocks,
    _renormalize_density,
    _xsph_blocks,
    tait_pressure,
)


def _halo3d(a, nxl, nyl, nzl, ax_x, ax_y, ax_z, perms):
    """Dimension-ordered 3-D halo exchange of one dense payload.

    ``a``: ``[c_local + 1, K, F]`` (sentinel row last).  Exchanges the
    z-faces first, then the y-faces of the z-extended block, then the
    x-faces of the yz-extended block - each later exchange forwards the
    earlier ghosts, so every device ends up with all 26 neighbors'
    boundary cells (faces, edges AND corners) in 6 ppermute pairs.
    Returns the ``[(nxl+2)*(nyl+2)*(nzl+2) + 1, K, F]`` extended
    payload.  With edge-terminated permutations, edge devices receive
    zeros - exactly the empty-ghost boundary condition, since the mask
    rides in the payload; ring permutations make the seam ghosts real
    (periodic).
    """
    (sx_f, sx_b), (sy_f, sy_b), (sz_f, sz_b) = perms
    c_local = nxl * nyl * nzl
    tail = a.shape[1:]
    core = a[:c_local].reshape((nxl, nyl, nzl) + tail)

    # z exchange: top face travels +z, bottom face travels -z
    ghost_dn = jax.lax.ppermute(core[:, :, nzl - 1 : nzl], ax_z, sz_f)
    ghost_up = jax.lax.ppermute(core[:, :, 0:1], ax_z, sz_b)
    zcat = jnp.concatenate([ghost_dn, core, ghost_up], axis=2)

    # y exchange of the z-extended faces (z-edges ride along)
    ghost_d = jax.lax.ppermute(zcat[:, nyl - 1 : nyl], ax_y, sy_f)
    ghost_u = jax.lax.ppermute(zcat[:, 0:1], ax_y, sy_b)
    ycat = jnp.concatenate([ghost_d, zcat, ghost_u], axis=1)

    # x exchange of the yz-extended faces (edges + corners ride along)
    ghost_l = jax.lax.ppermute(ycat[nxl - 1 : nxl], ax_x, sx_f)
    ghost_r = jax.lax.ppermute(ycat[0:1], ax_x, sx_b)
    xcat = jnp.concatenate([ghost_l, ycat, ghost_r], axis=0)

    return jnp.concatenate(
        [xcat.reshape((-1,) + tail), a[c_local:]], axis=0
    )


def _core3d(dense, nxl, nyl, nzl):
    """Slice the interior block back out of an extended dense array."""
    c_ext = (nxl + 2) * (nyl + 2) * (nzl + 2)
    tail = dense.shape[1:]
    e4 = dense[:c_ext].reshape((nxl + 2, nyl + 2, nzl + 2) + tail)
    return e4[1 : nxl + 1, 1 : nyl + 1, 1 : nzl + 1].reshape((-1,) + tail)


def make_distributed3d_step_fn(
    grid,
    params,
    mesh,
    capacity=None,
    migrate_cap=None,
    kernel=WendlandC2,
    block=32,
    use_pallas="auto",
    pallas_block=None,
    n_fixed=0,
    periodic=False,
    compute_energy=False,
    xsph=0.0,
    density_renorm=False,
    surface_tension=0.0,
    spill="auto",
    density_mode="summation",
    delta_sph=0.1,
    _traced_dt=False,
):
    """Build the 3-D block-decomposed distributed step.

    Args:
        grid: global :class:`CellGrid`; each entry of ``grid.dims``
            must be a multiple of the corresponding mesh extent.
        params: :class:`SPHParams`.
        mesh: 3-D ``jax.sharding.Mesh`` (shape ``(px, py, pz)``); its
            three axis names are used for the ppermute hops.
        capacity: particle slots per device (use
            :func:`distribute_state_3d`'s choice).
        migrate_cap: max migrations per face per phase per step
            (default ``capacity // 4``).
        n_fixed: particles with ``pid < n_fixed`` are static boundary
            particles, exactly as in the 1-D/2-D steps.
        periodic: periodic global box.  All three axes wrap through
            RING halo permutations along their mesh axes (each needs
            >= 3 cells globally); there is no locally-wrapped axis.
            Ghost planes crossing a seam arrive coordinate-shifted by
            the box extent so the kernels see true geometry.
        compute_energy / xsph / density_renorm: as in the 1-D/2-D
            steps (the density floor lands before the owner rho/p
            exchange, so ghosts carry it too).
        spill: two-tier cell layout (Pallas path only), as in the
            1-D/2-D steps: the local dense layout, halo payloads and
            particle gather run at ``2 * capacity`` slot width and only
            the density/accel pair passes split into the cross-tier
            spill kernels.  ``"auto"`` turns it on when the resolved
            Pallas path supports it.
        density_mode / delta_sph: as in the 1-D/2-D steps.
            ``"continuity"`` carries density as migrating state
            (``DistState.rho``): ghost densities are exact by
            construction, so the step runs ONE fused halo round
            (x|v|rho|p|mask, 6 ppermute pairs) instead of two and ONE
            fused accel+drho pair pass instead of two sweeps; the
            density rides all three migration hops.

    Returns:
        ``step(state: DistState) -> (DistState, DistAux)``, jitted with
        axis-0 shardings over all three mesh axes.  (With the private
        ``_traced_dt=True``, instead returns the UNJITTED
        ``step(state, dt) -> (DistState, DistAux, a2max[px*py*pz])``
        plus the sharding, for
        :func:`make_adaptive_distributed3d_step_fn` to compose the CFL
        controller around before jitting - the same contract as the
        1-D/2-D builders.)
    """
    if len(mesh.axis_names) != 3:
        raise ValueError(
            "make_distributed3d_step_fn needs a 3-D mesh, got axes %r"
            % (mesh.axis_names,)
        )
    ax_x, ax_y, ax_z = mesh.axis_names
    px, py, pz = mesh.devices.shape
    nx, ny, nz = grid.dims
    if nx % px != 0 or ny % py != 0 or nz % pz != 0:
        raise ValueError(
            "grid dims (%d, %d, %d) must be multiples of the mesh shape"
            " (%d, %d, %d)" % (nx, ny, nz, px, py, pz)
        )
    nxl, nyl, nzl = nx // px, ny // py, nz // pz
    c_local = nxl * nyl * nzl
    c_ext = (nxl + 2) * (nyl + 2) * (nzl + 2)
    if capacity is None:
        raise ValueError("pass capacity (slots per device)")
    cap = int(capacity)
    mig_cap = int(migrate_cap) if migrate_cap is not None else max(8, cap // 4)
    k = grid.capacity

    # static geometry
    cell = grid.cell_size
    lo_g = jnp.asarray(grid.lo, jnp.float32)
    hi_g = lo_g + cell * jnp.asarray(grid.dims, jnp.float32)
    gravity = jnp.asarray(params.gravity, jnp.float32)

    wrap = periodic & (np.asarray(grid.dims) >= 3)
    if periodic and (nx < 3 or ny < 3 or nz < 3):
        raise ValueError("periodic needs >= 3 cells along x, y and z")
    wrap_x, wrap_y, wrap_z = bool(wrap[0]), bool(wrap[1]), bool(wrap[2])
    Lx, Ly, Lz = cell * nx, cell * ny, cell * nz

    # extended (ghost-padded) local grid; ALL periodicity flows through
    # the ring halos - the local cell table never wraps
    ext_grid = CellGrid(
        lo=(0.0, 0.0, 0.0), cell_size=cell,
        dims=(nxl + 2, nyl + 2, nzl + 2), capacity=k,
    )
    nbr_ext = neighbor_table(ext_grid, periodic=False)

    continuity = density_mode == "continuity"
    if density_mode not in ("summation", "continuity"):
        raise ValueError("unknown density_mode: %r" % (density_mode,))
    if continuity and density_renorm:
        raise ValueError(
            "density_renorm corrects the summation-density free-surface "
            "deficit; continuity mode has no deficit to correct - use "
            "delta_sph for its noise control instead"
        )

    from . import pallas_ops as _po

    if use_pallas == "auto":
        use_pallas = jax.default_backend() == "tpu" and (
            _po.accel_drho_supported(ext_grid)
            if continuity
            else _po.supported(ext_grid)
        )
    if spill == "auto":
        spill = (
            jax.default_backend() == "tpu"
            and bool(use_pallas)
            and _po.spill_supported(ext_grid)
        )
    if spill:
        if not use_pallas:
            raise ValueError(
                "spill=True requires use_pallas - the two-tier layout "
                "exists for the packed Pallas kernels"
            )
        if not _po.spill_supported(ext_grid):
            raise ValueError(
                "spill needs a packed capacity (24 <= K <= 64, multiple "
                "of 8); got %d" % k
            )
    # dense slot width of the local layout (two spill tiers ride the
    # layout/halo/gather machinery concatenated; see the 1-D slab step)
    kd = 2 * k if spill else k
    if pallas_block is None:
        pallas_block = _po.default_block(ext_grid)
    if use_pallas:
        from . import pallas_ops

    perms = (
        _block_perms(px, wrap_x),
        _block_perms(py, wrap_y),
        _block_perms(pz, wrap_z),
    )
    (sx_f, sx_b), (sy_f, sy_b), (sz_f, sz_b) = perms

    def local_step(x, v, pid, rho_in, dt):
        # x/v/pid are this device's [cap] slot arrays (rho_in carried
        # density in continuity mode, None otherwise); dt is the
        # trace-time constant params.dt on the fixed path or a traced
        # replicated scalar on the adaptive path
        i = jax.lax.axis_index(ax_x)
        j = jax.lax.axis_index(ax_y)
        kk = jax.lax.axis_index(ax_z)
        alive = pid >= 0
        lo_local = lo_g + jnp.stack(
            [i * nxl * cell, j * nyl * cell, kk * nzl * cell]
        )

        cid_s, slot, order, gidx, mask, cell_ovf = _local_cells(
            x, alive, nxl, nyl, nzl, kd, lo_local, cell
        )
        if continuity:
            # density is CARRIED STATE: ghosts are exact, so x|v|rho|p
            # |mask ride ONE halo round - no owner rho/p re-exchange
            xvr = _scatter(
                jnp.concatenate([x, v, rho_in[:, None]], axis=-1),
                order, gidx,
            )
            rho_dense = jnp.where(
                mask, jnp.maximum(xvr[..., 6], 0.1 * params.rho0),
                params.rho0,
            )
            # pressure does NOT ride the halo: the receiver recomputes
            # it from the exchanged rho (pure per-element Tait math) -
            # ~11% less halo traffic, bit-identical values
            xvm = jnp.concatenate(
                [
                    xvr[..., :6],
                    rho_dense[..., None],
                    mask.astype(jnp.float32)[..., None],
                ],
                axis=-1,
            )
        else:
            # ONE stacked halo payload: x + v + mask = 7 lanes
            xvm = _scatter(
                jnp.concatenate(
                    [x, v, alive.astype(jnp.float32)[:, None]], axis=-1
                ),
                order,
                gidx,
            )
        nlanes = xvm.shape[-1]
        ext = _halo3d(xvm, nxl, nyl, nzl, ax_x, ax_y, ax_z, perms)

        # periodic seams: shift ghost-plane coordinates by the box
        # extent so ghost positions are geometrically true (the kernels
        # see no min-image at all).  Each axis's shift covers the other
        # axes' ghost edge/corner cells in its boundary planes too -
        # the neighbor that forwarded them shares our block index along
        # that axis, so our shift condition is exactly the one it would
        # apply (the 2-D corner argument, once per axis).
        if wrap_x or wrap_y or wrap_z:
            e4 = ext[:c_ext].reshape(nxl + 2, nyl + 2, nzl + 2, kd, nlanes)
            if wrap_z:
                sz_lo = jnp.where(kk == 0, -Lz, 0.0).astype(jnp.float32)
                sz_hi = jnp.where(kk == pz - 1, Lz, 0.0).astype(jnp.float32)
                e4 = e4.at[:, :, 0, ..., 2].add(sz_lo)
                e4 = e4.at[:, :, nzl + 1, ..., 2].add(sz_hi)
            if wrap_y:
                sy_lo = jnp.where(j == 0, -Ly, 0.0).astype(jnp.float32)
                sy_hi = jnp.where(j == py - 1, Ly, 0.0).astype(jnp.float32)
                e4 = e4.at[:, 0, ..., 1].add(sy_lo)
                e4 = e4.at[:, nyl + 1, ..., 1].add(sy_hi)
            if wrap_x:
                sx_lo = jnp.where(i == 0, -Lx, 0.0).astype(jnp.float32)
                sx_hi = jnp.where(i == px - 1, Lx, 0.0).astype(jnp.float32)
                e4 = e4.at[0, ..., 0].add(sx_lo)
                e4 = e4.at[nxl + 1, ..., 0].add(sx_hi)
            ext = jnp.concatenate(
                [e4.reshape(c_ext, kd, nlanes), ext[c_ext:]], axis=0
            )

        ext_x, ext_v = ext[..., :3], ext[..., 3:6]
        ext_mask = ext[..., nlanes - 1] > 0.5

        if continuity:
            # ghost rho/p arrived in the fused payload (edge devices'
            # ghost planes are zeros - refill dead/absent slots with
            # rho0 / 0 so p/rho^2 terms stay finite, masked anyway)
            rho_d2 = jnp.where(
                ext_mask, jnp.maximum(ext[..., 6], 0.1 * params.rho0),
                params.rho0,
            )
            p_d2 = jnp.where(ext_mask, tait_pressure(rho_d2, params), 0.0)
        else:
            # density over the extended block; only CORE outputs are
            # correct
            if spill:
                # tier split happens HERE only: slots < K are the main
                # tier, slots >= K the spill tier
                rho_ab = pallas_ops.density_spill(
                    ext_x[:, :k], ext_mask[:, :k],
                    ext_x[:, k:], ext_mask[:, k:],
                    ext_grid, params, kernel=kernel, block=pallas_block,
                )
                rho_d = jnp.concatenate(rho_ab, axis=1)
            elif use_pallas:
                rho_d = pallas_ops.density(
                    ext_x, ext_mask, ext_grid, params, kernel=kernel,
                    block=pallas_block,
                )
            else:
                rho_d = _density_blocks(
                    ext_x, ext_mask, nbr_ext, params, kernel, block
                )

            mask_core = _core3d(ext_mask, nxl, nyl, nzl)
            rho_core = jnp.where(
                mask_core,
                jnp.maximum(
                    _core3d(rho_d, nxl, nyl, nzl), 0.1 * params.rho0
                ),
                params.rho0,
            )
            if density_renorm:
                rho_core = _renormalize_density(rho_core, params)
            p_core = jnp.where(
                mask_core, tait_pressure(rho_core, params), 0.0
            )

            # second halo exchange: OWNER-computed rho/p replace the
            # locally-miscomputed ghost values before the force pass;
            # rho and p ride one stacked payload (latency-bound hops)
            rp = jnp.concatenate(
                [
                    jnp.stack([rho_core, p_core], axis=-1),
                    jnp.stack(
                        [
                            jnp.full((1, kd), params.rho0, rho_core.dtype),
                            jnp.zeros((1, kd), p_core.dtype),
                        ],
                        axis=-1,
                    ),
                ],
                axis=0,
            )
            ext_rp = _halo3d(rp, nxl, nyl, nzl, ax_x, ax_y, ax_z, perms)
            # edge devices' ghosts receive zeros; refill dead/absent
            # slots with rho0 / 0 so p/rho^2 terms stay finite (masked
            # anyway)
            rho_d2 = jnp.where(ext_mask, ext_rp[..., 0], params.rho0)
            p_d2 = jnp.where(ext_mask, ext_rp[..., 1], 0.0)

        if continuity:
            if spill:
                # cross-tier fused accel+drho: the tiers ride the
                # layout/halo concatenated (kd = 2K); only this pair
                # pass splits them (same contract as the summation
                # spill branch below)
                out_ab = pallas_ops.accel_drho_spill(
                    ext_x[:, :k], ext_v[:, :k], rho_d2[:, :k], p_d2[:, :k],
                    ext_mask[:, :k],
                    ext_x[:, k:], ext_v[:, k:], rho_d2[:, k:], p_d2[:, k:],
                    ext_mask[:, k:],
                    ext_grid, params, kernel=kernel, delta_sph=delta_sph,
                    block=pallas_block,
                )
                out4_d = jnp.concatenate(out_ab, axis=1)
            elif use_pallas:
                # fused accel+drho Pallas kernel on the extended block
                # grid (same ext-grid contract as density/accel; every
                # axis is ring-haloed, so no wrap_axes)
                out4_d = pallas_ops.accel_drho(
                    ext_x, ext_v, rho_d2, p_d2, ext_mask, ext_grid, params,
                    kernel=kernel, delta_sph=delta_sph, block=pallas_block,
                )
            else:
                out4_d = _accel_drho_blocks(
                    ext_x, ext_v, rho_d2, p_d2, ext_mask, nbr_ext, params,
                    kernel, block, delta_sph,
                )
            acc_d = out4_d[..., :3]
        elif spill:
            acc_ab = pallas_ops.accel_spill(
                ext_x[:, :k], ext_v[:, :k], rho_d2[:, :k], p_d2[:, :k],
                ext_mask[:, :k],
                ext_x[:, k:], ext_v[:, k:], rho_d2[:, k:], p_d2[:, k:],
                ext_mask[:, k:],
                ext_grid, params, kernel=kernel, block=pallas_block,
            )
            acc_d = jnp.concatenate(acc_ab, axis=1)
        elif use_pallas:
            acc_d = pallas_ops.accel(
                ext_x, ext_v, rho_d2, p_d2, ext_mask, ext_grid, params,
                kernel=kernel, block=pallas_block,
            )
        else:
            acc_d = _accel_blocks(
                ext_x, ext_v, rho_d2, p_d2, ext_mask, nbr_ext, params,
                kernel, block,
            )
        if surface_tension > 0:
            # Akinci surface tension needs neighbor NORMALS; like rho/p,
            # ghost normals computed locally have truncated neighborhoods,
            # so exchange the owner-computed values first (normals are
            # vectors - periodic seams need no coordinate shift)
            n_loc = _st_normals_blocks(
                ext_x, rho_d2, ext_mask, nbr_ext, params, kernel, block
            )
            n_pay = jnp.concatenate(
                [
                    _core3d(n_loc, nxl, nyl, nzl),
                    jnp.zeros((1, kd, 3), n_loc.dtype),
                ],
                axis=0,
            )
            n_d = jnp.where(
                ext_mask[..., None],
                _halo3d(n_pay, nxl, nyl, nzl, ax_x, ax_y, ax_z, perms),
                0.0,
            )
            acc_d = acc_d + _st_force_blocks(
                ext_x, n_d, rho_d2, ext_mask, nbr_ext, params, kernel,
                block, surface_tension,
            )

        # bundle core outputs as columns of ONE particle-order gather
        cols = [_core3d(acc_d, nxl, nyl, nzl)]
        sent = [jnp.zeros((1, kd, 3), acc_d.dtype)]
        if continuity:
            # drho sentinel is 0: cell-overflow-dropped particles keep
            # their carried density
            cols.append(_core3d(out4_d[..., 3:4], nxl, nyl, nzl))
            sent.append(jnp.zeros((1, kd, 1), acc_d.dtype))
        else:
            cols += [rho_core[..., None], p_core[..., None]]
            sent += [
                jnp.full((1, kd, 1), params.rho0, rho_core.dtype),
                jnp.zeros((1, kd, 1), p_core.dtype),
            ]
        if compute_energy:
            du_d = _energy_blocks(
                ext_x, ext_v, rho_d2, p_d2, ext_mask, nbr_ext, params,
                kernel, block,
            )
            cols.append(_core3d(du_d, nxl, nyl, nzl)[..., None])
            sent.append(jnp.zeros((1, kd, 1), du_d.dtype))
        if xsph > 0:
            dvc_d = _xsph_blocks(
                ext_x, ext_v, rho_d2, ext_mask, nbr_ext, params, kernel,
                block,
            )
            cols.append(_core3d(dvc_d, nxl, nyl, nzl))
            sent.append(jnp.zeros((1, kd, 3), dvc_d.dtype))
        bundle = jnp.concatenate(
            [jnp.concatenate(cols, axis=-1), jnp.concatenate(sent, axis=-1)],
            axis=0,
        )
        out = _gather(bundle, cid_s, slot, order, c_local, kd)
        acc = out[..., :3] + gravity
        if continuity:
            # integrate the gathered drho directly on the carried state
            rho = jnp.where(
                alive,
                jnp.maximum(rho_in + dt * out[..., 3], 0.1 * params.rho0),
                params.rho0,
            )
            p = jnp.where(alive, tait_pressure(rho, params), 0.0)
            ecol = 4
        else:
            rho = out[..., 3]
            p = out[..., 4]
            ecol = 5
        dudt = out[..., ecol] if compute_energy else jnp.zeros_like(rho)
        if compute_energy:
            ecol += 1
        dvc = out[..., ecol : ecol + 3] if xsph > 0 else None

        # integrate (dead slots don't move); XSPH smooths DRIFT velocity
        v_new = jnp.where(alive[:, None], v + dt * acc, v)
        v_drift = v_new + xsph * dvc if dvc is not None else v_new
        x_new = jnp.where(alive[:, None], x + dt * v_drift, x)

        # global walls: reflective except wrapped axes (ALL wraps are
        # deferred to the migration payloads - crossing detection needs
        # raw coordinates; no axis wraps locally here)
        under = x_new < lo_g
        over = x_new > hi_g
        reflected = jnp.where(under, 2.0 * lo_g - x_new, x_new)
        reflected = jnp.where(over, 2.0 * hi_g - reflected, reflected)
        reflected = jnp.clip(reflected, lo_g, hi_g)
        if periodic:
            x_new = jnp.where(wrap, x_new, reflected)
            bounce = (under | over) & ~wrap
        else:
            x_new = reflected
            bounce = under | over
        v_new = jnp.where(
            bounce & alive[:, None], -params.wall_damping * v_new, v_new
        )

        if n_fixed > 0:
            fixed = alive & (pid < n_fixed)
            x_new = jnp.where(fixed[:, None], x, x_new)
            v_new = jnp.where(fixed[:, None], 0.0, v_new)

        # ---- three-phase migration: x hop, then y, then z ----
        # (carried rho rides as column 7 in continuity mode; the
        # migration machinery keys on pid at column 6 regardless)
        rho_col = [rho[:, None]] if continuity else []
        payload = jnp.concatenate(
            [x_new, v_new, pid.astype(jnp.float32)[:, None]] + rho_col,
            axis=1,
        )  # [cap, 7 (8 continuity)], raw coordinates on wrapped axes
        slab_lo_x = lo_g[0] + i * nxl * cell
        merged1, ovf_x = _migrate_axis(
            payload, 0, slab_lo_x, slab_lo_x + nxl * cell, i, px, ax_x,
            sx_f, sx_b, wrap_x, lo_g[0], Lx, mig_cap,
        )
        slab_lo_y = lo_g[1] + j * nyl * cell
        merged2, ovf_y = _migrate_axis(
            merged1, 1, slab_lo_y, slab_lo_y + nyl * cell, j, py, ax_y,
            sy_f, sy_b, wrap_y, lo_g[1], Ly, mig_cap,
        )
        slab_lo_z = lo_g[2] + kk * nzl * cell
        merged3, ovf_z = _migrate_axis(
            merged2, 2, slab_lo_z, slab_lo_z + nzl * cell, kk, pz, ax_z,
            sz_f, sz_b, wrap_z, lo_g[2], Lz, mig_cap,
        )

        x_out = merged3[:, 0:3]
        v_out = merged3[:, 3:6]
        pid_out = merged3[:, 6].astype(jnp.int32)
        if continuity:
            # post-migration slot-consistent density/pressure
            rho = jnp.where(pid_out >= 0, merged3[:, 7], params.rho0)
            p = jnp.where(pid_out >= 0, tait_pressure(rho, params), 0.0)
        mig_ovf = ovf_x + ovf_y + ovf_z
        outs = (
            x_out, v_out, pid_out, rho, p, cell_ovf[None], mig_ovf[None],
            dudt,
        )
        if _traced_dt:
            # max squared acceleration of this block's MOBILE particles
            # (the CFL force-condition input); per-block [1] outputs,
            # the controller maxes globally outside the shard_map
            mobile = alive & (pid >= n_fixed) if n_fixed > 0 else alive
            a2 = jnp.where(mobile, jnp.sum(acc * acc, axis=-1), 0.0)
            outs = outs + (jnp.max(a2)[None],)
        return outs

    spec = P((ax_x, ax_y, ax_z))
    sh = NamedSharding(mesh, spec)

    n_out = 9 if _traced_dt else 8
    if continuity:
        fn = local_step if _traced_dt else (
            lambda x, v, pid, rho: local_step(x, v, pid, rho, params.dt)
        )
    elif _traced_dt:
        def fn(x, v, pid, dt):
            return local_step(x, v, pid, None, dt)
    else:
        def fn(x, v, pid):
            return local_step(x, v, pid, None, params.dt)
    sm_kwargs = dict(
        mesh=mesh,
        in_specs=(spec, spec, spec)
        + ((spec,) if continuity else ())
        + ((P(),) if _traced_dt else ()),
        out_specs=(spec,) * n_out,
    )
    if use_pallas:
        try:
            mapped = shard_map(fn, check_vma=False, **sm_kwargs)
        except TypeError:
            mapped = shard_map(fn, check_rep=False, **sm_kwargs)
    else:
        mapped = shard_map(fn, **sm_kwargs)

    st_sh = DistState(x=sh, v=sh, pid=sh, rho=sh if continuity else None)

    def _state_args(state):
        if continuity:
            if state.rho is None:
                raise ValueError(
                    "density_mode='continuity' needs DistState.rho - "
                    "seed the global state with tpgsd.sph.init_density "
                    "before distribute_state_3d"
                )
            return (state.x, state.v, state.pid, state.rho)
        return (state.x, state.v, state.pid)

    def _pack(x, v, pid, rho, p, covf, movf, dudt):
        return (
            DistState(x=x, v=v, pid=pid, rho=rho if continuity else None),
            DistAux(
                rho=rho, p=p, cell_overflow=covf, migrate_overflow=movf,
                dudt=dudt,
            ),
        )

    if _traced_dt:

        def step_dt(state, dt):
            *outs, a2 = mapped(*_state_args(state), jnp.float32(dt))
            return _pack(*outs) + (a2,)

        return step_dt, sh

    @partial(
        jax.jit,
        in_shardings=(st_sh,),
        out_shardings=(
            st_sh,
            DistAux(
                rho=sh, p=sh, cell_overflow=sh, migrate_overflow=sh, dudt=sh
            ),
        ),
    )
    def step(state):
        return _pack(*mapped(*_state_args(state)))

    return step


def make_adaptive_distributed3d_step_fn(
    grid,
    params,
    mesh,
    cfl=0.25,
    dt_min=0.0,
    dt_max=None,
    **kwargs,
):
    """CFL-adaptive variant of the 3-D block-decomposed step.

    Same Monaghan controller as
    :func:`tpgsd.sph.make_adaptive_distributed_step_fn`, computed
    globally over the ``(px, py, pz)`` mesh: each block reports its
    mobile particles' max ``|acc|^2`` out of the shard_map, the
    controller maxes over blocks and over the sharded velocity slots,
    and every device advances with one replicated traced dt - adapting
    never recompiles or re-shards.

    Args:
        grid / params / mesh: as :func:`make_distributed3d_step_fn`.
        cfl / dt_min / dt_max: as the single-device adaptive builder
            (``dt_max`` defaults to ``params.dt``).
        **kwargs: forwarded to :func:`make_distributed3d_step_fn`
            (``capacity``, ``use_pallas``, ``periodic``, ``n_fixed``,
            ``xsph``, ...).

    Returns:
        jitted ``step(state: DistState, dt) ->
        (DistState, DistAux, dt_next)``.  Roll out with
        :func:`tpgsd.sph.run_adaptive` (DistState is a pytree).
    """
    base, sh = make_distributed3d_step_fn(
        grid, params, mesh, _traced_dt=True, **kwargs
    )
    h = float(params.h)
    c0 = float(params.c0)
    if dt_max is None:
        dt_max = float(params.dt)
    continuity = kwargs.get("density_mode") == "continuity"
    st_sh = DistState(x=sh, v=sh, pid=sh, rho=sh if continuity else None)

    @partial(
        jax.jit,
        in_shardings=(st_sh, None),
        out_shardings=(
            st_sh,
            DistAux(
                rho=sh, p=sh, cell_overflow=sh, migrate_overflow=sh, dudt=sh
            ),
            None,
        ),
    )
    def step(state, dt):
        new_state, aux, a2 = base(state, dt)
        a2max = jnp.max(a2)
        amax = jnp.sqrt(jnp.maximum(a2max, 1e-30))
        v2max = jnp.max(jnp.sum(new_state.v * new_state.v, axis=-1))
        vmax = jnp.sqrt(jnp.maximum(v2max, 1e-30))
        dt_f = jnp.sqrt(h / amax)
        dt_cv = h / (c0 + vmax)
        dt_next = jnp.clip(
            cfl * jnp.minimum(dt_f, dt_cv), dt_min, dt_max
        ).astype(jnp.float32)
        return new_state, aux, dt_next

    return step


def distribute_state_3d(state, grid, mesh, capacity=None):
    """Partition an ``SPHState`` onto a 3-D mesh by block ownership.

    Returns a :class:`DistState` (``[px * py * pz * capacity, ...]``,
    axis 0 sharded over all three mesh axes, x-major block order) plus
    the chosen capacity - smallest multiple of 8 at least twice the
    densest block's population when not given.
    """
    px, py, pz = mesh.devices.shape
    nx, ny, nz = grid.dims
    nxl, nyl, nzl = nx // px, ny // py, nz // pz
    x = np.asarray(state.x)
    v = np.asarray(state.v)

    wx = nxl * grid.cell_size
    wy = nyl * grid.cell_size
    wz = nzl * grid.cell_size
    bi = np.clip(((x[:, 0] - grid.lo[0]) // wx).astype(np.int64), 0, px - 1)
    bj = np.clip(((x[:, 1] - grid.lo[1]) // wy).astype(np.int64), 0, py - 1)
    bk = np.clip(((x[:, 2] - grid.lo[2]) // wz).astype(np.int64), 0, pz - 1)
    owner = (bi * py + bj) * pz + bk
    pops = np.bincount(owner, minlength=px * py * pz)
    if capacity is None:
        capacity = int(-(-2 * max(int(pops.max()), 1) // 8) * 8)

    n_dev = px * py * pz
    rho = None if state.rho is None else np.asarray(state.rho)
    xs = np.zeros((n_dev, capacity, 3), np.float32)
    vs = np.zeros((n_dev, capacity, 3), np.float32)
    pids = np.full((n_dev, capacity), -1, np.int32)
    rhos = None if rho is None else np.zeros((n_dev, capacity), np.float32)
    for d in range(n_dev):
        sel = np.nonzero(owner == d)[0]
        if len(sel) > capacity:
            raise ValueError(
                "device %d block holds %d particles > capacity %d"
                % (d, len(sel), capacity)
            )
        xs[d, : len(sel)] = x[sel]
        vs[d, : len(sel)] = v[sel]
        pids[d, : len(sel)] = sel
        if rhos is not None:
            rhos[d, : len(sel)] = rho[sel]

    sh = NamedSharding(mesh, P(mesh.axis_names))
    return DistState(
        x=jax.device_put(xs.reshape(-1, 3), sh),
        v=jax.device_put(vs.reshape(-1, 3), sh),
        pid=jax.device_put(pids.reshape(-1), sh),
        rho=(
            None if rhos is None
            else jax.device_put(rhos.reshape(-1), sh)
        ),
    ), capacity
