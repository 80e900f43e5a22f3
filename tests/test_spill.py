"""Two-tier spill cell layout: builder, kernels, and step parity.

The spill layout (tpgsd.sph.cells.build_cells_spill + the cross-tier
Pallas kernels in tpgsd.sph.pallas_ops) sizes the main tier to the
TYPICAL cell occupancy and spills the rare dense cells' excess into an
equal-capacity second tier; these tests pin that the physics is
identical (up to reduction order) to a single-tier layout of capacity
2K.  The reference has no counterpart (its I/O layer has no compute);
this exercises the SPH frame-producer the BASELINE north star times.
"""

import numpy
import pytest

import jax
import jax.numpy as jnp

from tpgsd.sph import SPHState, dam_break, make_step_fn
from tpgsd.sph.cells import (
    build_cells,
    build_cells_spill,
    gather_from_cells,
    make_grid,
    scatter_to_cells,
    scatter_to_cells_soa,
)


@pytest.fixture(scope="module")
def dense_cloud():
    """Random cloud with a densified corner so cells exceed K=24."""
    rng = numpy.random.default_rng(7)
    x = rng.uniform(0.05, 0.95, (2000, 3)).astype(numpy.float32)
    x[:500] = 0.05 + 0.22 * rng.uniform(0, 1, (500, 3)).astype(numpy.float32)
    return x


def test_build_cells_spill_partitions_slots(dense_cloud):
    grid = make_grid((0, 0, 0), (1, 1, 1), 0.12, 24)
    k = grid.capacity
    cells, sp = build_cells_spill(jnp.asarray(dense_cloud), grid, k)
    ref = build_cells(jnp.asarray(dense_cloud), grid._replace(capacity=2 * k))

    # the two tiers' gather maps concatenated == the single 2K-tier map
    gidx_cat = numpy.concatenate(
        [numpy.asarray(cells.gidx), numpy.asarray(sp.gidx)], axis=1
    )
    numpy.testing.assert_array_equal(gidx_cat, numpy.asarray(ref.gidx))
    mask_cat = numpy.concatenate(
        [numpy.asarray(cells.mask), numpy.asarray(sp.mask)], axis=1
    )
    numpy.testing.assert_array_equal(mask_cat, numpy.asarray(ref.mask))

    # spill tier is actually populated in this workload
    assert bool(sp.mask.any())
    # overflow counts past 2K, matching the single-tier reference
    assert int(cells.overflow) == int(ref.overflow)
    numpy.testing.assert_array_equal(
        numpy.asarray(cells.slot), numpy.asarray(ref.slot)
    )


def test_spill_scatter_gather_roundtrip(dense_cloud):
    grid = make_grid((0, 0, 0), (1, 1, 1), 0.12, 24)
    k = grid.capacity
    x = jnp.asarray(dense_cloud)
    cells, sp = build_cells_spill(x, grid, k)

    vals = jnp.arange(x.shape[0], dtype=jnp.float32)[:, None] * jnp.ones(
        (1, 3)
    )
    dense_a = scatter_to_cells(vals, cells, grid)
    dense_b = scatter_to_cells(vals, cells, grid, gidx=sp.gidx)
    cat = jnp.concatenate([dense_a, dense_b], axis=1)
    back = gather_from_cells(cat, cells, grid, capacity=2 * k)
    # retained particles round-trip exactly; dropped (past 2K) read the
    # sentinel row's fill
    kept = numpy.asarray(cells.slot < 2 * k)[
        numpy.argsort(numpy.asarray(cells.order))
    ]
    assert kept.sum() > 0 and (~kept).sum() > 0
    numpy.testing.assert_array_equal(
        numpy.asarray(back)[kept], numpy.asarray(vals)[kept]
    )
    numpy.testing.assert_array_equal(numpy.asarray(back)[~kept], 0.0)


def test_spill_soa_scatter_matches_aos(dense_cloud):
    grid = make_grid((0, 0, 0), (1, 1, 1), 0.12, 24)
    k = grid.capacity
    x = jnp.asarray(dense_cloud)
    cells, sp = build_cells_spill(x, grid, k)
    vals = jnp.asarray(
        numpy.random.default_rng(1).normal(size=(x.shape[0], 6)),
        dtype=jnp.float32,
    )
    soa_b = scatter_to_cells_soa(vals, cells, grid, slot_base=k, capacity=k)
    aos_b = scatter_to_cells(vals, cells, grid, gidx=sp.gidx)[: grid.n_cells]
    m = numpy.asarray(sp.mask)[: grid.n_cells]
    got = numpy.moveaxis(numpy.asarray(soa_b), 0, -1)[m]
    numpy.testing.assert_array_equal(got, numpy.asarray(aos_b)[m])


def _spill_vs_single_tier(n_side, k, **kw):
    """One spill step vs the single-tier step at capacity 2K; extra
    kwargs (xsph, surface_tension, ...) apply to BOTH steps."""
    db = dam_break(n_side=n_side, capacity=2 * k)
    grid_a = db.grid._replace(capacity=k)

    occ = numpy.bincount(
        numpy.asarray(build_cells(jnp.asarray(db.state.x), db.grid).cid),
        minlength=db.grid.n_cells,
    )
    assert (occ > k).sum() > 0, "workload must exercise the spill tier"

    step_ref = jax.jit(
        make_step_fn(db.grid, db.params, use_pallas=True,
                     pallas_interpret=True, **kw)
    )
    state = db.state
    for _ in range(3):
        state, _ = step_ref(state)

    step_sp = jax.jit(
        make_step_fn(grid_a, db.params, use_pallas=True,
                     pallas_interpret=True, spill=True, **kw)
    )
    s1, (rho1, p1, ov1) = step_ref(state)
    s2, (rho2, p2, ov2) = step_sp(state)
    return (s1, rho1, p1, int(ov1)), (s2, rho2, p2, int(ov2))


def test_spill_step_matches_single_tier():
    (s1, rho1, p1, ov1), (s2, rho2, p2, ov2) = _spill_vs_single_tier(10, 24)
    assert ov1 == 0 and ov2 == 0
    rsc = float(jnp.abs(rho1).max())
    numpy.testing.assert_allclose(
        numpy.asarray(rho2) / rsc, numpy.asarray(rho1) / rsc,
        rtol=1e-5, atol=1e-6,
    )
    vsc = float(jnp.abs(s1.v).max())
    numpy.testing.assert_allclose(
        numpy.asarray(s2.v) / vsc, numpy.asarray(s1.v) / vsc,
        rtol=1e-4, atol=1e-5,
    )
    numpy.testing.assert_allclose(
        numpy.asarray(s2.x), numpy.asarray(s1.x), rtol=1e-5, atol=1e-7
    )


def test_spill_step_periodic_matches_single_tier():
    """Spill + periodic: both tiers ride the same pre-shifted ghost
    halo; parity against the single-tier periodic step at 2K."""
    from tpgsd.sph.step import SPHParams

    n_side = 12
    dx = 1.0 / n_side
    ax = (numpy.arange(n_side) + 0.5) * dx
    gx, gy, gz = numpy.meshgrid(ax, ax, ax, indexing="ij")
    x0 = numpy.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=1).astype(
        numpy.float32
    )
    # smooth periodic velocity field so the step is well-conditioned
    two_pi = 2.0 * numpy.pi
    v0 = numpy.stack(
        [
            numpy.sin(two_pi * x0[:, 0]),
            numpy.cos(two_pi * x0[:, 1]),
            numpy.sin(two_pi * x0[:, 2]),
        ],
        axis=1,
    ).astype(numpy.float32)

    support = 1.0 / 3.0  # 3x3x3 periodic grid; occupancy 64/cell
    params = SPHParams(
        mass=1000.0 * dx**3, h=support / 2, dt=1e-4, gravity=(0.0, 0.0, 0.0)
    )
    grid_ref = make_grid((0, 0, 0), (1, 1, 1), support, 64)
    grid_sp = grid_ref._replace(capacity=32)
    occ = numpy.bincount(
        numpy.asarray(build_cells(jnp.asarray(x0), grid_sp).cid),
        minlength=grid_sp.n_cells,
    )
    assert occ.max() > 32, "every cell must spill"

    state = SPHState(x=jnp.asarray(x0), v=jnp.asarray(v0))
    step_ref = jax.jit(
        make_step_fn(grid_ref, params, use_pallas=True,
                     pallas_interpret=True, periodic=True)
    )
    step_sp = jax.jit(
        make_step_fn(grid_sp, params, use_pallas=True,
                     pallas_interpret=True, periodic=True, spill=True)
    )
    s1, (rho1, p1, ov1) = step_ref(state)
    s2, (rho2, p2, ov2) = step_sp(state)
    assert int(ov1) == 0 and int(ov2) == 0
    rsc = float(jnp.abs(rho1).max())
    numpy.testing.assert_allclose(
        numpy.asarray(rho2) / rsc, numpy.asarray(rho1) / rsc,
        rtol=1e-5, atol=1e-6,
    )
    vsc = float(jnp.abs(s1.v).max())
    numpy.testing.assert_allclose(
        numpy.asarray(s2.v) / vsc, numpy.asarray(s1.v) / vsc,
        rtol=1e-4, atol=1e-5,
    )


def test_spill_slab_step_matches_single_tier():
    """Spill inside the slab-sequential big step: parity vs the global
    single-tier step at 2K (same kernels, two layouts + slab order)."""
    from tpgsd.sph import make_slab_step_fn

    db = dam_break(n_side=10, capacity=48)
    assert db.grid.dims[0] % 3 == 0, db.grid.dims
    grid_sp = db.grid._replace(capacity=24)
    occ = numpy.bincount(
        numpy.asarray(build_cells(jnp.asarray(db.state.x), db.grid).cid),
        minlength=db.grid.n_cells,
    )
    assert (occ > 24).sum() > 0

    step_g = jax.jit(
        make_step_fn(db.grid, db.params, use_pallas=True,
                     pallas_interpret=True)
    )
    step_s = jax.jit(
        make_slab_step_fn(grid_sp, db.params, n_slabs=3, use_pallas=True,
                          pallas_interpret=True, spill=True)
    )
    sg, (rg, pg, og) = step_g(db.state)
    ss, (rs, ps, os_, ws) = step_s(db.state)
    assert int(ws) == 0
    assert int(os_) == int(og) == 0
    numpy.testing.assert_allclose(
        numpy.asarray(rs), numpy.asarray(rg), rtol=2e-5, atol=1e-2
    )
    numpy.testing.assert_allclose(
        numpy.asarray(ss.x), numpy.asarray(sg.x), rtol=1e-5, atol=1e-7
    )
    numpy.testing.assert_allclose(
        numpy.asarray(ss.v), numpy.asarray(sg.v), rtol=2e-4, atol=2e-4
    )


def test_spill_slab_build_time_validation():
    from tpgsd.sph import make_slab_step_fn

    db = dam_break(n_side=10, capacity=48)
    with pytest.raises(ValueError, match="use_pallas"):
        make_slab_step_fn(db.grid._replace(capacity=24), db.params,
                          n_slabs=3, use_pallas=False, spill=True)
    with pytest.raises(ValueError, match="packed capacity"):
        make_slab_step_fn(db.grid._replace(capacity=128), db.params,
                          n_slabs=3, use_pallas=True,
                          pallas_interpret=True, spill=True)


def test_spill_overflow_counts_past_both_tiers(dense_cloud):
    grid = make_grid((0, 0, 0), (1, 1, 1), 0.12, 8)
    cells, sp = build_cells_spill(jnp.asarray(dense_cloud), grid, 8)
    ref = build_cells(jnp.asarray(dense_cloud), grid._replace(capacity=16))
    assert int(cells.overflow) == int(ref.overflow) > 0


def test_spill_build_time_validation():
    db = dam_break(n_side=6, capacity=32)
    with pytest.raises(ValueError, match="use_pallas"):
        make_step_fn(db.grid, db.params, spill=True)
    bad = db.grid._replace(capacity=128)
    with pytest.raises(ValueError, match="packed capacity"):
        make_step_fn(bad, db.params, use_pallas=True,
                     pallas_interpret=True, spill=True)


def test_spill_step_under_scan():
    """The spill step composes with lax.scan (static shapes, no host)."""
    # n_side=8 stretches cells to 1/3 box height: the densest cell holds
    # 64 lattice particles, so the two tiers need 2K = 64
    db = dam_break(n_side=8, capacity=64)
    grid_a = db.grid._replace(capacity=32)
    step = make_step_fn(grid_a, db.params, use_pallas=True,
                        pallas_interpret=True, spill=True)

    @jax.jit
    def roll(state):
        def body(st, _):
            st, (rho, p, ov) = step(st)
            return st, ov

        return jax.lax.scan(body, state, None, length=3)

    state, ovs = roll(db.state)
    assert state.x.shape == db.state.x.shape
    assert bool(jnp.all(jnp.isfinite(state.x)))
    assert int(ovs.max()) == 0


def test_spill_xsph_matches_single_tier():
    """spill + xsph: the XSPH pair pass runs over the two tiers
    concatenated along the slot axis, which is slot-identical to the
    single 2K tier - parity must hold."""
    (s1, rho1, p1, ov1), (s2, rho2, p2, ov2) = _spill_vs_single_tier(
        10, 24, xsph=0.5
    )
    assert ov1 == 0 and ov2 == 0
    rsc = float(jnp.abs(rho1).max())
    numpy.testing.assert_allclose(
        numpy.asarray(rho2) / rsc, numpy.asarray(rho1) / rsc,
        rtol=1e-5, atol=1e-6,
    )
    vsc = float(jnp.abs(s1.v).max())
    numpy.testing.assert_allclose(
        numpy.asarray(s2.v) / vsc, numpy.asarray(s1.v) / vsc,
        rtol=1e-4, atol=1e-5,
    )
    numpy.testing.assert_allclose(
        numpy.asarray(s2.x), numpy.asarray(s1.x), rtol=1e-5, atol=1e-7
    )


def test_spill_surface_tension_matches_single_tier():
    """spill + Akinci surface tension: the normals and cohesion passes
    run over the concatenated tiers; parity vs single-tier 2K."""
    (s1, rho1, p1, ov1), (s2, rho2, p2, ov2) = _spill_vs_single_tier(
        10, 24, surface_tension=0.05
    )
    assert ov1 == 0 and ov2 == 0
    vsc = float(jnp.abs(s1.v).max())
    numpy.testing.assert_allclose(
        numpy.asarray(s2.v) / vsc, numpy.asarray(s1.v) / vsc,
        rtol=1e-4, atol=1e-5,
    )
    numpy.testing.assert_allclose(
        numpy.asarray(s2.x), numpy.asarray(s1.x), rtol=1e-5, atol=1e-7
    )


def test_spill_continuity_matches_single_tier():
    """Continuity-density mode on the spill layout: the fused
    accel+drho CROSS-TIER kernels (accel_drho_spill's AA/AB/BA/BB
    passes) vs the single-tier 2K continuity step on the same Pallas
    path - positions, velocities AND the evolved carried density."""
    from tpgsd.sph import init_density

    db = dam_break(n_side=10, capacity=48)
    grid_a = db.grid._replace(capacity=24)
    occ = numpy.bincount(
        numpy.asarray(build_cells(jnp.asarray(db.state.x), db.grid).cid),
        minlength=db.grid.n_cells,
    )
    assert (occ > 24).sum() > 0, "workload must exercise the spill tier"
    state = init_density(db.state, db.grid, db.params)

    step_ref = jax.jit(
        make_step_fn(db.grid, db.params, use_pallas=True,
                     pallas_interpret=True, density_mode="continuity")
    )
    for _ in range(3):
        state, _ = step_ref(state)
    step_sp = jax.jit(
        make_step_fn(grid_a, db.params, use_pallas=True,
                     pallas_interpret=True, spill=True,
                     density_mode="continuity")
    )
    s1, (rho1, p1, ov1) = step_ref(state)
    s2, (rho2, p2, ov2) = step_sp(state)
    assert int(ov1) == 0 and int(ov2) == 0
    numpy.testing.assert_allclose(
        numpy.asarray(s2.x), numpy.asarray(s1.x), rtol=1e-5, atol=1e-7
    )
    vsc = float(jnp.abs(s1.v).max())
    numpy.testing.assert_allclose(
        numpy.asarray(s2.v) / vsc, numpy.asarray(s1.v) / vsc,
        rtol=1e-4, atol=1e-5,
    )
    numpy.testing.assert_allclose(
        numpy.asarray(s2.rho), numpy.asarray(s1.rho), rtol=5e-4
    )


def test_spill_continuity_xsph_matches_single_tier():
    """Continuity + spill + XSPH: the XSPH pass runs over the
    concatenated tiers while accel+drho splits into the cross-tier
    kernels."""
    from tpgsd.sph import init_density

    db = dam_break(n_side=10, capacity=48)
    grid_a = db.grid._replace(capacity=24)
    state = init_density(db.state, db.grid, db.params)
    step_ref = jax.jit(
        make_step_fn(db.grid, db.params, use_pallas=True,
                     pallas_interpret=True, density_mode="continuity",
                     xsph=0.5)
    )
    for _ in range(2):
        state, _ = step_ref(state)
    step_sp = jax.jit(
        make_step_fn(grid_a, db.params, use_pallas=True,
                     pallas_interpret=True, spill=True,
                     density_mode="continuity", xsph=0.5)
    )
    s1, _ = step_ref(state)
    s2, _ = step_sp(state)
    numpy.testing.assert_allclose(
        numpy.asarray(s2.x), numpy.asarray(s1.x), rtol=1e-5, atol=1e-7
    )
    numpy.testing.assert_allclose(
        numpy.asarray(s2.rho), numpy.asarray(s1.rho), rtol=5e-4
    )


def test_spill_auto_resolves_to_champion(monkeypatch):
    """spill='auto' (now the builder DEFAULT) turns the two-tier layout
    on exactly when running on a TPU backend AND the resolved Pallas
    path supports it, producing the spill=True result.  The backend is
    monkeypatched to 'tpu' so the resolution logic is exercised on the
    CPU suite; the kernels still run in interpret mode."""
    db = dam_break(n_side=8, capacity=64)
    grid_a = db.grid._replace(capacity=32)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    step_auto = jax.jit(
        make_step_fn(grid_a, db.params, use_pallas=True,
                     pallas_interpret=True, spill="auto")
    )
    step_sp = jax.jit(
        make_step_fn(grid_a, db.params, use_pallas=True,
                     pallas_interpret=True, spill=True)
    )
    s1, (r1, p1, o1) = step_auto(db.state)
    s2, (r2, p2, o2) = step_sp(db.state)
    numpy.testing.assert_array_equal(numpy.asarray(s1.x), numpy.asarray(s2.x))
    numpy.testing.assert_array_equal(numpy.asarray(r1), numpy.asarray(r2))
    # lane-native capacity: no spill kernel -> auto stays single-tier
    step_off = make_step_fn(db.grid._replace(capacity=128), db.params,
                            use_pallas=True, pallas_interpret=True,
                            spill="auto")
    assert step_off is not None  # builds without the packed-capacity check
    monkeypatch.undo()
    # off-TPU, auto never flips spill on - CPU runs stay single-tier
    # even with use_pallas forced (interpret-mode testing)
    step_cpu = jax.jit(
        make_step_fn(grid_a, db.params, use_pallas=True,
                     pallas_interpret=True, spill="auto")
    )
    s3, (r3, _, o3) = step_cpu(db.state)
    # capacity 32 single-tier on this workload overflows where the
    # two-tier layout would not - proving spill stayed OFF
    assert int(o3) != int(o1) or not numpy.array_equal(
        numpy.asarray(r3), numpy.asarray(r1)
    )


# ---------------------------------------------------------------------------
# spill under the explicit decompositions: the two tiers ride the local
# layout / halo / gather machinery CONCATENATED (2K slot width); only the
# density/accel pair passes split into the cross-tier kernels.  Parity is
# against the SAME decomposition on the jnp path with a single tier big
# enough for the worst cell.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def decomp_cloud():
    """Dense-corner cloud on an (8, 4, 4) grid over a 2 x 1 x 1 box:
    20 cells exceed the K=24 main tier (max 42 < 2K = 48, so nothing
    overflows), and the grid divides the (8,), (4, 2) and (2, 2, 2)
    meshes."""
    from tpgsd.sph import SPHParams, SPHState
    from tpgsd.sph.cells import CellGrid

    rng = numpy.random.default_rng(3)
    n = 2400
    x = rng.uniform(0.02, 0.98, (n, 3)).astype(numpy.float32)
    x[:, 0] *= 2.0
    x[:140, 0] = rng.uniform(0.02, 0.51, 140)
    x[:140, 1] = rng.uniform(0.02, 0.51, 140)
    x[:140, 2] = rng.uniform(0.02, 0.51, 140)
    v = (rng.normal(size=(n, 3)) * 0.05).astype(numpy.float32)
    grid = CellGrid(lo=(0.0, 0.0, 0.0), cell_size=0.25, dims=(8, 4, 4),
                    capacity=24)
    # gentle parameters: the random cloud is far from equilibrium, and
    # the test pins LAYOUT parity, not violent dynamics - a small dt
    # keeps the 2-step motion bounded so no cell exceeds 2K anywhere
    params = SPHParams(mass=0.8, h=0.12, dt=1e-4, c0=20.0,
                       gravity=(0.0, 0.0, -9.81))

    occ = numpy.bincount(
        numpy.asarray(build_cells(jnp.asarray(x), grid).cid),
        minlength=grid.n_cells,
    )
    assert (occ > 24).sum() >= 10 and occ.max() <= 44, occ.max()
    state = SPHState(x=jnp.asarray(x), v=jnp.asarray(v))
    return state, grid, params


def _run_decomp(kind, state, grid, params, **kw):
    from tpgsd.parallel import make_mesh, make_mesh2d, make_mesh3d
    from tpgsd.sph import (
        collect_state,
        distribute_state,
        distribute_state_2d,
        distribute_state_3d,
        make_distributed2d_step_fn,
        make_distributed3d_step_fn,
        make_distributed_step_fn,
    )

    n = state.x.shape[0]
    if kind == "slab":
        mesh = make_mesh()
        dist, cap = distribute_state(state, grid, mesh)
        step = make_distributed_step_fn(grid, params, mesh, capacity=cap, **kw)
    elif kind == "2d":
        mesh = make_mesh2d(shape=(4, 2))
        dist, cap = distribute_state_2d(state, grid, mesh)
        step = make_distributed2d_step_fn(
            grid, params, mesh, capacity=cap, **kw
        )
    else:
        mesh = make_mesh3d(shape=(2, 2, 2))
        dist, cap = distribute_state_3d(state, grid, mesh)
        step = make_distributed3d_step_fn(
            grid, params, mesh, capacity=cap, **kw
        )
    for _ in range(2):
        dist, aux = step(dist)
    assert int(jnp.sum(aux.migrate_overflow)) == 0
    assert int(jnp.sum(aux.cell_overflow)) == 0
    return collect_state(dist, n)


@pytest.mark.parametrize("kind", ["slab", "2d", "3d"])
def test_spill_distributed_matches_jnp(kind, decomp_cloud):
    state, grid, params = decomp_cloud
    # jnp reference: single tier sized for the worst cell
    x_j, v_j, _ = _run_decomp(kind, state, grid._replace(capacity=48), params)
    x_s, v_s, _ = _run_decomp(kind, state, grid, params,
                           use_pallas=True, spill=True)
    numpy.testing.assert_allclose(x_s, x_j, rtol=1e-5, atol=1e-6)
    numpy.testing.assert_allclose(v_s, v_j, rtol=5e-4, atol=5e-4)


def test_spill_distributed_periodic_matches_jnp(decomp_cloud):
    """Periodic spill on the 2-D block decomposition: x/y wrap through
    ring halos with coordinate-shifted seam ghosts, z wraps locally as
    a ghost-halo tier pair inside the spill kernels."""
    state, grid, params = decomp_cloud
    x_j, v_j, _ = _run_decomp(
        "2d", state, grid._replace(capacity=48), params, periodic=True
    )
    x_s, v_s, _ = _run_decomp(
        "2d", state, grid, params, use_pallas=True, spill=True,
        periodic=True,
    )
    numpy.testing.assert_allclose(x_s, x_j, rtol=1e-5, atol=1e-6)
    numpy.testing.assert_allclose(v_s, v_j, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("kind", ["slab", "2d", "3d"])
def test_spill_distributed_continuity_matches_jnp(kind, decomp_cloud):
    """Continuity + spill on every decomposition: the carried density
    rides the concatenated-tier halos and migration; only the fused
    accel+drho pass splits into the cross-tier kernels.  Reference:
    the same decomposition, jnp pair path, single tier at 2K."""
    from tpgsd.sph import init_density

    state, grid, params = decomp_cloud
    state = init_density(state, grid._replace(capacity=48), params)
    x_j, v_j, r_j = _run_decomp(
        kind, state, grid._replace(capacity=48), params,
        density_mode="continuity",
    )
    x_s, v_s, r_s = _run_decomp(
        kind, state, grid, params, use_pallas=True, spill=True,
        density_mode="continuity",
    )
    numpy.testing.assert_allclose(x_s, x_j, rtol=1e-5, atol=1e-5)
    numpy.testing.assert_allclose(v_s, v_j, rtol=5e-4, atol=5e-4)
    numpy.testing.assert_allclose(r_s, r_j, rtol=5e-4)


def test_spill_distributed_xsph_matches_jnp(decomp_cloud):
    """spill + xsph on the slab decomposition: the XSPH pair pass runs
    over the concatenated tiers of the extended slab."""
    state, grid, params = decomp_cloud
    x_j, v_j, _ = _run_decomp(
        "slab", state, grid._replace(capacity=48), params, xsph=0.5
    )
    x_s, v_s, _ = _run_decomp(
        "slab", state, grid, params, use_pallas=True, spill=True, xsph=0.5
    )
    numpy.testing.assert_allclose(x_s, x_j, rtol=1e-5, atol=1e-6)
    numpy.testing.assert_allclose(v_s, v_j, rtol=5e-4, atol=5e-4)
