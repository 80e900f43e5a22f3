"""Tests for the async double-buffered dump runtime."""

import threading
import time

import numpy
import numpy.testing
import pytest

import tpgsd.hoomd
from tpgsd.io_runtime import AsyncDumpRunner, run_dump_loop
from tpgsd.parallel import ShardedFrameWriter


def test_async_dump_roundtrip(tmp_path):
    path = tmp_path / "async.gsd"
    frames = []
    with AsyncDumpRunner(ShardedFrameWriter(path)) as dump:
        for i in range(5):
            pos = numpy.full((10, 3), float(i), numpy.float32)
            frames.append(pos)
            dump.submit({"particles/position": pos}, step=i)
    assert dump.stats.frames == 5
    assert dump.stats.bytes == 5 * 10 * 3 * 4
    assert dump.stats.wall_seconds > 0

    with tpgsd.hoomd.open(path, mode="r") as traj:
        assert len(traj) == 5
        for i in range(5):
            numpy.testing.assert_array_equal(traj[i].particles.position, frames[i])
            assert traj[i].configuration.step == i


def test_async_dump_overlaps_submitter(tmp_path):
    """submit() must not block while fewer than `depth` frames are queued."""

    class SlowWriter:
        def __init__(self):
            self.frames = []

        def write_frame(self, chunks, step=None):
            time.sleep(0.05)
            self.frames.append(chunks)

        def flush(self):
            pass

        def close(self):
            pass

    writer = SlowWriter()
    with AsyncDumpRunner(writer, depth=2) as dump:
        t0 = time.perf_counter()
        dump.submit({"x": numpy.zeros(4)})
        first_submit = time.perf_counter() - t0
        dump.submit({"x": numpy.ones(4)})
        dump.flush()
    assert first_submit < 0.04  # returned before the 50 ms write finished
    assert len(writer.frames) == 2


def test_async_dump_error_propagates(tmp_path):
    class FailingWriter:
        def write_frame(self, chunks, step=None):
            raise IOError("disk gone")

        def flush(self):
            pass

        def close(self):
            pass

    dump = AsyncDumpRunner(FailingWriter(), depth=1)
    with pytest.raises(RuntimeError, match="async dump writer failed"):
        dump.submit({"x": numpy.zeros(4)})
        dump.flush()
        dump.close()


def test_async_dump_backpressure(tmp_path):
    """The queue bound caps in-flight frames (bounded host memory)."""
    gate = threading.Event()

    class GatedWriter:
        def __init__(self):
            self.count = 0

        def write_frame(self, chunks, step=None):
            gate.wait(timeout=10)
            self.count += 1

        def flush(self):
            pass

        def close(self):
            pass

    writer = GatedWriter()
    dump = AsyncDumpRunner(writer, depth=1, own_writer=False)
    dump.submit({"x": numpy.zeros(4)})  # picked up by the writer, blocks on gate
    time.sleep(0.05)
    dump.submit({"x": numpy.zeros(4)})  # fills the depth-1 queue

    blocked = []

    def third():
        t0 = time.perf_counter()
        dump.submit({"x": numpy.zeros(4)})
        blocked.append(time.perf_counter() - t0)

    t = threading.Thread(target=third)
    t.start()
    time.sleep(0.1)
    gate.set()  # release the writer
    t.join(timeout=10)
    dump.close()
    assert writer.count == 3
    assert blocked and blocked[0] > 0.05  # third submit waited for the gate


def test_run_dump_loop_with_sph(tmp_path):
    jax = pytest.importorskip("jax")
    from tpgsd.sph import dam_break, make_step_fn

    db = dam_break(n_side=5)
    step = jax.jit(make_step_fn(db.grid, db.params))
    path = tmp_path / "loop.gsd"

    final_state, stats = run_dump_loop(
        step,
        db.state,
        ShardedFrameWriter(path),
        n_steps=4,
        frame_of=lambda state, aux, i: {
            "particles/position": state.x,
            "particles/density": aux[0],
        },
    )
    assert stats.frames == 4
    with tpgsd.hoomd.open(path, mode="r") as traj:
        assert len(traj) == 4
        numpy.testing.assert_allclose(
            traj[3].particles.position, numpy.asarray(final_state.x), rtol=1e-6
        )


def test_async_dump_error_does_not_deadlock_flush(tmp_path):
    """After a writer error, queued frames must still be drained so
    flush()'s queue.join() returns (regression: _drain used to exit on
    the first exception, leaving task_done never called -> hang)."""

    class FailingWriter:
        def write_frame(self, chunks, step=None):
            raise IOError("disk gone")

        def flush(self):
            pass

        def close(self):
            pass

    dump = AsyncDumpRunner(FailingWriter(), depth=4)
    dump.submit({"x": numpy.zeros(4)})
    dump.submit({"x": numpy.zeros(4)})  # queued behind the failure
    done = []

    def do_flush():
        with pytest.raises(RuntimeError, match="async dump writer failed"):
            dump.flush()
        done.append(True)

    t = threading.Thread(target=do_flush)
    t.start()
    t.join(timeout=10)
    assert done, "flush() deadlocked after a writer error"
    dump.close()  # must not hang either


def test_async_dump_error_does_not_deadlock_close(tmp_path):
    """close() must not hang putting the sentinel into a full queue when
    the writer has failed (e.g. disk full mid-run)."""

    class FailingWriter:
        def write_frame(self, chunks, step=None):
            raise IOError("disk full")

        def flush(self):
            pass

        def close(self):
            pass

    dump = AsyncDumpRunner(FailingWriter(), depth=1)
    try:
        for _ in range(4):  # more frames than the queue holds
            dump.submit({"x": numpy.zeros(4)})
    except RuntimeError:
        pass
    done = []

    def do_close():
        try:
            dump.close()
        except RuntimeError:
            pass
        done.append(True)

    t = threading.Thread(target=do_close)
    t.start()
    t.join(timeout=10)
    assert done, "close() deadlocked after a writer error"
