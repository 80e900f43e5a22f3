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


def test_resume_empty_trajectory_raises(tmp_path):
    path = tmp_path / "empty.gsd"
    ShardedFrameWriter(path).close()
    with pytest.raises(ValueError, match="empty"):
        resume(path)
