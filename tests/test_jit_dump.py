"""Tests for in-jit frame dumps (io_callback channel + scan rollout)."""

import numpy
import numpy.testing
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

import tpgsd.hoomd  # noqa: E402
from tpgsd.io_runtime import JitDumpChannel, scan_simulate  # noqa: E402
from tpgsd.parallel import ShardedFrameWriter  # noqa: E402


def test_emit_from_jit(tmp_path):
    path = tmp_path / "jit.gsd"
    channel = JitDumpChannel(
        ShardedFrameWriter(path), ["particles/position"]
    )

    @jax.jit
    def compute_and_dump(x, step):
        y = x * 2.0
        channel.emit([y], step)
        return y

    out = compute_and_dump(jnp.ones((8, 3), jnp.float32), 0)
    out = compute_and_dump(out, 1)
    jax.block_until_ready(out)
    channel.close()

    with tpgsd.hoomd.open(path, mode="r") as traj:
        assert len(traj) == 2
        numpy.testing.assert_array_equal(
            traj[0].particles.position, numpy.full((8, 3), 2.0)
        )
        numpy.testing.assert_array_equal(
            traj[1].particles.position, numpy.full((8, 3), 4.0)
        )
        assert traj[1].configuration.step == 1


def test_scan_simulate_with_cadence(tmp_path):
    path = tmp_path / "scan.gsd"

    def step(state):
        return state + 1.0, jnp.sum(state)

    channel = JitDumpChannel(ShardedFrameWriter(path), ["state/values"])
    final = scan_simulate(
        jax.jit(step),
        jnp.zeros((4,), jnp.float32),
        n_steps=10,
        channel=channel,
        frame_of=lambda s, aux: [s],
        every=3,
    )
    channel.close()

    numpy.testing.assert_array_equal(numpy.asarray(final), numpy.full(4, 10.0))

    import tpgsd.fl

    with tpgsd.fl.open(path, "r") as f:
        # steps 0, 3, 6, 9 emitted
        assert f.nframes == 4
        for frame, stepval in enumerate([0, 3, 6, 9]):
            numpy.testing.assert_array_equal(
                f.read_chunk(frame, "state/values"),
                numpy.full(4, float(stepval) + 1.0, numpy.float32),
            )
            assert f.read_chunk(frame, "configuration/step")[0] == stepval


def test_scan_simulate_sph(tmp_path):
    """Whole-simulation scan with the real SPH step."""
    from tpgsd.sph import dam_break, make_step_fn

    db = dam_break(n_side=5)
    step = make_step_fn(db.grid, db.params)
    path = tmp_path / "sph_scan.gsd"

    channel = JitDumpChannel(
        ShardedFrameWriter(path),
        ["particles/position", "particles/density"],
    )
    # n_steps=5, every=2 -> emits at i = 0, 2, 4; the i=4 emission is the
    # state after 5 step applications == the returned final state
    final = scan_simulate(
        step,
        db.state,
        n_steps=5,
        channel=channel,
        frame_of=lambda s, aux: [s.x, aux[0]],
        every=2,
    )
    channel.close()

    with tpgsd.hoomd.open(path, mode="r") as traj:
        assert len(traj) == 3
        assert traj[2].configuration.step == 4
        numpy.testing.assert_allclose(
            traj[2].particles.position, numpy.asarray(final.x), rtol=1e-6
        )
        assert numpy.isfinite(traj[2].particles.density).all()


def test_scan_simulate_adaptive_sph(tmp_path):
    """Adaptive whole-simulation scan: the (state, dt, t) carry rolls
    inside one compiled program, frames emit through the ordered
    callback, and the returned t equals the sum of the dts taken."""
    from tpgsd.io_runtime import scan_simulate_adaptive
    from tpgsd.sph import dam_break, make_adaptive_step_fn

    db = dam_break(n_side=5)
    step = make_adaptive_step_fn(db.grid, db.params)
    path = tmp_path / "sph_scan_ad.gsd"

    channel = JitDumpChannel(
        ShardedFrameWriter(path),
        ["particles/position", "particles/density"],
    )
    final, dt_next, t = scan_simulate_adaptive(
        step,
        db.state,
        db.params.dt,
        n_steps=6,
        channel=channel,
        frame_of=lambda s, aux: [s.x, aux[0]],
        every=3,
    )
    channel.close()

    assert 0 < float(dt_next) <= db.params.dt
    # step 0 takes dt0; later steps take the controller's choices
    assert 0 < float(t) <= 6 * db.params.dt + 1e-9

    with tpgsd.hoomd.open(path, mode="r") as traj:
        assert len(traj) == 2  # i = 0, 3
        assert traj[1].configuration.step == 3
        assert numpy.isfinite(traj[1].particles.position).all()
