"""Checkpoint/resume tests: the trajectory file as the restart point.

(resume semantics: reference pgsd/pgsd/pgsd.c:1630-1639 append-mode
frame-counter derivation; sharded offset re-derivation is tpgsd-new)
"""

import numpy
import numpy.testing
import pytest

jax = pytest.importorskip("jax")

import tpgsd.hoomd  # noqa: E402
from tpgsd.parallel import ShardedFrameWriter, ShardedTrajectoryReader  # noqa: E402
from tpgsd.sph import SPHState, dam_break, make_step_fn, resume  # noqa: E402


def _run(step, state, writer, n, start_step=0):
    for i in range(n):
        state, (rho, p, _) = step(state)
        writer.write_frame(
            {
                "particles/position": state.x,
                "particles/velocity": state.v,
                "particles/density": rho,
            },
            step=start_step + i,
        )
    return state


def test_resume_continues_trajectory(tmp_path):
    db = dam_break(n_side=5)
    step = jax.jit(make_step_fn(db.grid, db.params))
    path = tmp_path / "resumable.gsd"

    # phase 1: 3 frames, then close (simulated shutdown)
    writer = ShardedFrameWriter(path)
    state1 = _run(step, db.state, writer, 3)
    writer.close()

    # phase 2: resume and run 2 more
    state2, last_step, writer, _ = resume(path)
    assert last_step == 2
    numpy.testing.assert_allclose(
        numpy.asarray(state2.x)[: db.n], numpy.asarray(state1.x), rtol=1e-6
    )
    state2 = SPHState(
        x=state2.x[: db.n], v=state2.v[: db.n]
    )  # strip sharding pad for the unsharded step
    _run(step, state2, writer, 2, start_step=3)
    writer.close()

    with tpgsd.hoomd.open(path, mode="r") as traj:
        assert len(traj) == 5
        steps = [int(traj[i].configuration.step) for i in range(5)]
        assert steps == [0, 1, 2, 3, 4]
        # the resumed trajectory must be continuous: frame 3 is one step
        # from frame 2
        ref = _run(step, state1, ShardedFrameWriter(tmp_path / "x.gsd"), 1)
        numpy.testing.assert_allclose(
            traj[3].particles.position,
            numpy.asarray(ref.x),
            rtol=1e-5,
        )


def test_resume_reads_extra_chunks_sharded(tmp_path):
    db = dam_break(n_side=5)
    step = jax.jit(make_step_fn(db.grid, db.params))
    path = tmp_path / "extras.gsd"
    writer = ShardedFrameWriter(path)
    _run(step, db.state, writer, 2)
    writer.close()

    state, last_step, writer, extras = resume(
        path, extra_chunks=("particles/density",)
    )
    writer.close()
    assert last_step == 1
    rho = extras["particles/density"]
    assert rho.shape[0] >= db.n
    assert bool(numpy.isfinite(numpy.asarray(rho)).all())


def test_sharded_reader_round_trip(tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpgsd.parallel import make_mesh

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("shard"))

    path = tmp_path / "roundtrip.gsd"
    rng = numpy.random.RandomState(0)
    pos = rng.rand(16, 3).astype(numpy.float32)
    with ShardedFrameWriter(path) as w:
        w.write_frame({"particles/position": pos}, step=7)

    with ShardedTrajectoryReader(path, sharding=sharding) as r:
        assert len(r) == 1
        assert r.chunk_names("particles/") == ["particles/N", "particles/position"]
        out = r.read_frame(-1, ["particles/position"])["particles/position"]
        assert out.sharding.is_equivalent_to(sharding, out.ndim)
        numpy.testing.assert_array_equal(numpy.asarray(out), pos)


def test_resume_distributed_continues(tmp_path):
    """Distributed resume re-derives slab ownership from positions and
    continues the slab-decomposed loop exactly."""
    import jax.numpy as jnp

    from tpgsd.parallel import make_mesh
    from tpgsd.sph import resume_distributed
    from tpgsd.sph.cells import make_grid
    from tpgsd.sph.distributed import (
        collect_state,
        distribute_state,
        make_distributed_step_fn,
    )
    from tpgsd.sph import SPHParams

    mesh = make_mesh()
    n_dev = mesh.devices.size
    grid = make_grid((0, 0, 0), (8.0, 1.0, 1.0), 0.5, capacity=16)
    assert grid.dims[0] % n_dev == 0
    params = SPHParams(mass=1.0, h=0.25, dt=0.05, gravity=(0.0, 0.0, 0.0))

    # particles separated by > 2h: zero pair forces, exactly linear
    # drift - resume correctness shows up bitwise, not through chaos
    rng = numpy.random.RandomState(2)
    i = numpy.arange(24)
    pts = numpy.stack(
        [
            0.3 + (i % 12) * 0.62,
            0.2 + (i // 12) * 0.6,
            numpy.full(24, 0.5),
        ],
        axis=1,
    ).astype(numpy.float32)
    vel = rng.randn(24, 3).astype(numpy.float32) * 0.05
    state = SPHState(x=jnp.asarray(pts), v=jnp.asarray(vel))

    dist, cap = distribute_state(state, grid, mesh)
    dstep = make_distributed_step_fn(grid, params, mesh, capacity=cap)

    path = tmp_path / "dist_resume.gsd"
    writer = ShardedFrameWriter(path)
    for i in range(2):
        dist, aux = dstep(dist)
        x_h, v_h, _ = collect_state(dist, 24)
        writer.write_frame(
            {"particles/position": x_h, "particles/velocity": v_h}, step=i
        )
    writer.close()

    # the headline capability first: resume onto a DIFFERENT device
    # count than the writing run (ownership re-derived from positions)
    mesh4 = make_mesh(n_devices=4)
    assert grid.dims[0] % 4 == 0
    dist4, cap4, step4, writer4 = resume_distributed(path, grid, mesh4)
    writer4.close()
    assert step4 == 1
    x4, v4, _ = collect_state(dist4, 24)
    x1, v1, _ = collect_state(dist, 24)
    numpy.testing.assert_allclose(x4, x1, rtol=1e-6)
    numpy.testing.assert_allclose(v4, v1, rtol=1e-6, atol=1e-7)
    # and it continues on the smaller mesh
    step4_fn = make_distributed_step_fn(grid, params, mesh4, capacity=cap4)
    dist4b, aux4 = step4_fn(dist4)
    assert int(jnp.sum(aux4.migrate_overflow)) == 0

    dist2, cap2, last_step, writer2 = resume_distributed(
        path, grid, mesh, capacity=cap
    )
    assert last_step == 1
    x2, v2, _ = collect_state(dist2, 24)
    numpy.testing.assert_allclose(x2, x1, rtol=1e-6)
    numpy.testing.assert_allclose(v2, v1, rtol=1e-6, atol=1e-7)

    # continue one step on each and compare
    dist, _ = dstep(dist)
    dist2, _ = dstep(dist2)
    xa, _, _ = collect_state(dist, 24)
    xb, _, _ = collect_state(dist2, 24)
    numpy.testing.assert_allclose(xb, xa, rtol=1e-5, atol=1e-6)

    writer2.write_frame({"particles/position": xb}, step=2)
    writer2.close()
    with tpgsd.hoomd.open(path, mode="r") as traj:
        assert len(traj) == 3


def test_resume_empty_trajectory_raises(tmp_path):
    path = tmp_path / "empty.gsd"
    ShardedFrameWriter(path).close()
    with pytest.raises(ValueError, match="empty"):
        resume(path)


def test_resume_distributed2d_continues(tmp_path):
    """2-D block resume: ownership re-derived from positions onto a
    (px, py) mesh, including from a file written by a 1-D slab run -
    the file records global state only."""
    import jax.numpy as jnp

    from tpgsd.parallel import make_mesh, make_mesh2d
    from tpgsd.sph import SPHParams, resume_distributed2d
    from tpgsd.sph.cells import make_grid
    from tpgsd.sph.distributed import (
        collect_state,
        distribute_state,
        make_distributed_step_fn,
    )
    from tpgsd.sph.distributed2d import make_distributed2d_step_fn

    mesh1 = make_mesh()
    grid = make_grid((0, 0, 0), (8.0, 1.0, 1.0), 0.5, capacity=16)
    assert grid.dims[0] % mesh1.devices.size == 0
    params = SPHParams(mass=1.0, h=0.25, dt=0.05, gravity=(0.0, 0.0, 0.0))

    # separated particles (> 2h): zero pair forces, exactly linear
    # drift; spread over both y halves so every 2-D block owns some
    rng = numpy.random.RandomState(3)
    i = numpy.arange(24)
    pts = numpy.stack(
        [
            0.3 + (i % 12) * 0.62,
            0.2 + (i // 12) * 0.6,
            numpy.full(24, 0.5),
        ],
        axis=1,
    ).astype(numpy.float32)
    vel = rng.randn(24, 3).astype(numpy.float32) * 0.05
    state = SPHState(x=jnp.asarray(pts), v=jnp.asarray(vel))

    # write 2 frames from a 1-D slab run
    dist, cap = distribute_state(state, grid, mesh1)
    dstep = make_distributed_step_fn(grid, params, mesh1, capacity=cap)
    path = tmp_path / "resume2d.gsd"
    writer = ShardedFrameWriter(path)
    for s in range(2):
        dist, _aux = dstep(dist)
        x_h, v_h, _ = collect_state(dist, 24)
        writer.write_frame(
            {"particles/position": x_h, "particles/velocity": v_h}, step=s
        )
    writer.close()
    x1, v1, _ = collect_state(dist, 24)

    # resume onto a (2, 2) block mesh and verify state parity
    mesh2d = make_mesh2d(shape=(2, 2))
    assert grid.dims[0] % 2 == 0 and grid.dims[1] % 2 == 0
    dist2, cap2, last_step, writer2 = resume_distributed2d(
        path, grid, mesh2d
    )
    assert last_step == 1
    x2, v2, _ = collect_state(dist2, 24)
    numpy.testing.assert_allclose(x2, x1, rtol=1e-6)
    numpy.testing.assert_allclose(v2, v1, rtol=1e-6, atol=1e-7)

    # continue a step on the 2-D mesh; free particles drift linearly,
    # so the 1-D and 2-D continuations agree
    step2d = make_distributed2d_step_fn(grid, params, mesh2d, capacity=cap2)
    dist2, aux2 = step2d(dist2)
    assert int(jnp.sum(aux2.migrate_overflow)) == 0
    dist, _ = dstep(dist)
    xa, _, _ = collect_state(dist, 24)
    xb, _, _ = collect_state(dist2, 24)
    numpy.testing.assert_allclose(xb, xa, rtol=1e-5, atol=1e-6)

    writer2.write_frame({"particles/position": xb}, step=2)
    writer2.close()
    with tpgsd.hoomd.open(path, mode="r") as traj:
        assert len(traj) == 3


def test_resume_distributed3d_continues(tmp_path):
    """3-D block resume: ownership re-derived from positions onto a
    (px, py, pz) mesh from a file written by a 1-D slab run - the mesh
    dimensionality is a reader-side choice, the file records global
    state only."""
    import jax.numpy as jnp

    from tpgsd.parallel import make_mesh, make_mesh3d
    from tpgsd.sph import SPHParams, resume_distributed3d
    from tpgsd.sph.cells import make_grid
    from tpgsd.sph.distributed import (
        collect_state,
        distribute_state,
        make_distributed_step_fn,
    )
    from tpgsd.sph.distributed3d import make_distributed3d_step_fn

    mesh1 = make_mesh()
    grid = make_grid((0, 0, 0), (8.0, 1.0, 1.0), 0.5, capacity=16)
    assert grid.dims[0] % mesh1.devices.size == 0
    assert grid.dims[1] % 2 == 0 and grid.dims[2] % 2 == 0
    params = SPHParams(mass=1.0, h=0.25, dt=0.05, gravity=(0.0, 0.0, 0.0))

    # separated particles (> 2h): zero pair forces, exactly linear
    # drift; spread over both y and z halves so 3-D blocks own some
    rng = numpy.random.RandomState(3)
    i = numpy.arange(24)
    pts = numpy.stack(
        [
            0.3 + (i % 6) * 1.24,
            0.2 + ((i // 6) % 2) * 0.6,
            0.2 + (i // 12) * 0.6,
        ],
        axis=1,
    ).astype(numpy.float32)
    vel = rng.randn(24, 3).astype(numpy.float32) * 0.05
    state = SPHState(x=jnp.asarray(pts), v=jnp.asarray(vel))

    # write 2 frames from a 1-D slab run
    dist, cap = distribute_state(state, grid, mesh1)
    dstep = make_distributed_step_fn(grid, params, mesh1, capacity=cap)
    path = tmp_path / "resume3d.gsd"
    writer = ShardedFrameWriter(path)
    for s in range(2):
        dist, _aux = dstep(dist)
        x_h, v_h, _ = collect_state(dist, 24)
        writer.write_frame(
            {"particles/position": x_h, "particles/velocity": v_h}, step=s
        )
    writer.close()
    x1, v1, _ = collect_state(dist, 24)

    # resume onto a (2, 2, 2) block mesh and verify state parity
    mesh3d = make_mesh3d(shape=(2, 2, 2))
    dist3, cap3, last_step, writer3 = resume_distributed3d(
        path, grid, mesh3d
    )
    assert last_step == 1
    x3, v3, _ = collect_state(dist3, 24)
    numpy.testing.assert_allclose(x3, x1, rtol=1e-6)
    numpy.testing.assert_allclose(v3, v1, rtol=1e-6, atol=1e-7)

    # continue a step on the 3-D mesh; free particles drift linearly,
    # so the 1-D and 3-D continuations agree
    step3d = make_distributed3d_step_fn(grid, params, mesh3d, capacity=cap3)
    dist3, aux3 = step3d(dist3)
    assert int(jnp.sum(aux3.migrate_overflow)) == 0
    dist, _ = dstep(dist)
    xa, _, _ = collect_state(dist, 24)
    xb, _, _ = collect_state(dist3, 24)
    numpy.testing.assert_allclose(xb, xa, rtol=1e-5, atol=1e-6)
    writer3.close()


def test_resume_continuity_seeds_rho(tmp_path):
    """Continuity-mode resume loads the last frame's particles/density
    into state.rho, and the resumed run continues the uninterrupted one
    exactly (the evolved density is state - re-summing would lose it)."""
    from tpgsd.sph import init_density

    db = dam_break(n_side=5)
    step = jax.jit(make_step_fn(db.grid, db.params, density_mode="continuity"))
    state0 = init_density(db.state, db.grid, db.params)
    path = tmp_path / "cont_resume.gsd"

    writer = ShardedFrameWriter(path)
    state1 = state0
    for i in range(3):
        state1, (rho, p, _) = step(state1)
        writer.write_frame(
            {
                "particles/position": state1.x,
                "particles/velocity": state1.v,
                "particles/density": state1.rho,
            },
            step=i,
        )
    writer.close()

    state2, last_step, writer2, _ = resume(path, density_mode="continuity")
    assert last_step == 2
    assert state2.rho is not None
    numpy.testing.assert_array_equal(
        numpy.asarray(state2.rho)[: db.n], numpy.asarray(state1.rho)
    )
    # continue one step from the resumed state: bitwise identical to
    # continuing the in-memory run (f32 dumps are exact).  Materialize
    # to host first - the resumed arrays carry the reader's 8-device
    # sharding, and jitting the step with a different input sharding
    # legitimately changes fp reduction order.
    state2 = SPHState(
        x=numpy.asarray(state2.x)[: db.n],
        v=numpy.asarray(state2.v)[: db.n],
        rho=numpy.asarray(state2.rho)[: db.n],
    )
    s_resumed, _ = step(state2)
    s_direct, _ = step(state1)
    numpy.testing.assert_array_equal(
        numpy.asarray(s_resumed.x), numpy.asarray(s_direct.x)
    )
    numpy.testing.assert_array_equal(
        numpy.asarray(s_resumed.rho), numpy.asarray(s_direct.rho)
    )
    writer2.close()


def test_resume_continuity_missing_density_raises(tmp_path):
    db = dam_break(n_side=4)
    path = tmp_path / "nodensity.gsd"
    writer = ShardedFrameWriter(path)
    writer.write_frame(
        {
            "particles/position": db.state.x,
            "particles/velocity": jnp_zeros_like(db.state.x),
        },
        step=0,
    )
    writer.close()
    with pytest.raises(ValueError, match="particles/density"):
        resume(path, density_mode="continuity")
    from tpgsd.parallel import make_mesh
    from tpgsd.sph import resume_distributed

    with pytest.raises(ValueError, match="particles/density"):
        resume_distributed(
            path, db.grid, make_mesh(n_devices=1),
            density_mode="continuity",
        )


def jnp_zeros_like(a):
    import jax.numpy as jnp

    return jnp.zeros_like(a)


def test_resume_distributed_continuity(tmp_path):
    """Slab resume in continuity mode: the carried density re-slabs
    with its particle onto a DIFFERENT device count and the run
    continues exactly."""
    import jax.numpy as jnp

    from tpgsd.parallel import make_mesh
    from tpgsd.sph import SPHParams, resume_distributed
    from tpgsd.sph.cells import make_grid
    from tpgsd.sph.distributed import (
        collect_state,
        distribute_state,
        make_distributed_step_fn,
    )

    mesh = make_mesh()
    n_dev = mesh.devices.size
    grid = make_grid((0, 0, 0), (8.0, 1.0, 1.0), 0.5, capacity=16)
    assert grid.dims[0] % n_dev == 0
    params = SPHParams(mass=1.0, h=0.25, dt=0.05, gravity=(0.0, 0.0, 0.0))

    rng = numpy.random.RandomState(3)
    i = numpy.arange(24)
    pts = numpy.stack(
        [
            0.3 + (i % 12) * 0.62,
            0.2 + (i // 12) * 0.6,
            numpy.full(24, 0.5),
        ],
        axis=1,
    ).astype(numpy.float32)
    vel = rng.randn(24, 3).astype(numpy.float32) * 0.05
    rho0 = (1000.0 + rng.rand(24) * 50.0).astype(numpy.float32)
    state = SPHState(x=jnp.asarray(pts), v=jnp.asarray(vel),
                     rho=jnp.asarray(rho0))

    dist, cap = distribute_state(state, grid, mesh)
    dstep = make_distributed_step_fn(
        grid, params, mesh, capacity=cap, density_mode="continuity",
        delta_sph=0.0,
    )

    path = tmp_path / "cont_dist_resume.gsd"
    writer = ShardedFrameWriter(path)
    for i in range(2):
        dist, aux = dstep(dist)
        x_h, v_h, rho_h = collect_state(dist, 24)
        writer.write_frame(
            {
                "particles/position": x_h,
                "particles/velocity": v_h,
                "particles/density": rho_h,
            },
            step=i,
        )
    writer.close()

    mesh4 = make_mesh(n_devices=4)
    dist4, cap4, step4, writer4 = resume_distributed(
        path, grid, mesh4, density_mode="continuity"
    )
    writer4.close()
    assert step4 == 1
    assert dist4.rho is not None
    x4, v4, r4 = collect_state(dist4, 24)
    x1, v1, r1 = collect_state(dist, 24)
    numpy.testing.assert_array_equal(r4, r1)
    numpy.testing.assert_allclose(x4, x1, rtol=1e-6)

    # continue one step on the new mesh; isolated particles keep their
    # carried densities exactly
    step4_fn = make_distributed_step_fn(
        grid, params, mesh4, capacity=cap4, density_mode="continuity",
        delta_sph=0.0,
    )
    dist4, aux4 = step4_fn(dist4)
    assert int(jnp.sum(aux4.migrate_overflow)) == 0
    _, _, r_next = collect_state(dist4, 24)
    numpy.testing.assert_array_equal(r_next, r1)


def test_resume_continuity_cross_decomposition(tmp_path):
    """A continuity trajectory written by the 1-D slab loop resumes
    onto 2-D and 3-D block meshes with the carried density intact (the
    file records global state only)."""
    import jax.numpy as jnp

    from tpgsd.parallel import make_mesh, make_mesh2d, make_mesh3d
    from tpgsd.sph import (
        SPHParams,
        resume_distributed2d,
        resume_distributed3d,
    )
    from tpgsd.sph.cells import CellGrid
    from tpgsd.sph.distributed import (
        collect_state,
        distribute_state,
        make_distributed_step_fn,
    )

    grid = CellGrid(lo=(0.0, 0.0, 0.0), cell_size=0.25, dims=(8, 4, 4),
                    capacity=16)
    params = SPHParams(mass=1.0, h=0.12, dt=0.01, gravity=(0.0, 0.0, 0.0))
    rng = numpy.random.RandomState(11)
    x = rng.uniform(0.1, 0.9, (32, 3)).astype(numpy.float32)
    x[:, 0] *= 2.0
    rho0 = (1000.0 + rng.rand(32) * 40.0).astype(numpy.float32)
    state = SPHState(
        x=jnp.asarray(x),
        v=jnp.zeros((32, 3), jnp.float32),
        rho=jnp.asarray(rho0),
    )

    mesh = make_mesh()
    dist, cap = distribute_state(state, grid, mesh)
    dstep = make_distributed_step_fn(
        grid, params, mesh, capacity=cap, density_mode="continuity"
    )
    dist, aux = dstep(dist)
    x_h, v_h, rho_h = collect_state(dist, 32)

    path = tmp_path / "cross.gsd"
    w = ShardedFrameWriter(path)
    w.write_frame(
        {
            "particles/position": x_h,
            "particles/velocity": v_h,
            "particles/density": rho_h,
        },
        step=0,
    )
    w.close()

    d2, cap2, _, w2 = resume_distributed2d(
        path, grid, make_mesh2d(shape=(4, 2)), density_mode="continuity"
    )
    w2.close()
    assert d2.rho is not None
    _, _, r2 = collect_state(d2, 32)
    numpy.testing.assert_array_equal(r2, rho_h)

    d3, cap3, _, w3 = resume_distributed3d(
        path, grid, make_mesh3d(shape=(2, 2, 2)), density_mode="continuity"
    )
    w3.close()
    assert d3.rho is not None
    _, _, r3 = collect_state(d3, 32)
    numpy.testing.assert_array_equal(r3, rho_h)
