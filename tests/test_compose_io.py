"""Compose-on-commit writer: the object-store-safe dump path.

Spill files are append-only per process (the access pattern GCS-fuse
and friends support); the composed output must be an ordinary GSD v2
file identical in content to the direct positioned-write path.
"""

import socket
import subprocess
import sys
import textwrap

import numpy
import numpy.testing
import pytest

import tpgsd.pypgsd
from tpgsd.parallel.compose_io import ComposedFrameWriter, compose


def _frames(n_frames=3, n=24, seed=0):
    rng = numpy.random.RandomState(seed)
    out = []
    for i in range(n_frames):
        out.append(
            {
                "particles/position": rng.rand(n, 3).astype(numpy.float32),
                "particles/density": rng.rand(n).astype(numpy.float32),
            }
        )
    return out


def test_composed_matches_direct(tmp_path):
    """Single process: composed output reads back identically to the
    direct ShardedFrameWriter output."""
    from tpgsd.parallel import ShardedFrameWriter

    frames = _frames()
    direct = str(tmp_path / "direct.gsd")
    composed = str(tmp_path / "composed.gsd")

    with ShardedFrameWriter(direct, application="t") as w:
        for i, fr in enumerate(frames):
            w.write_frame(fr, step=i)
    with ComposedFrameWriter(composed, application="t") as w:
        for i, fr in enumerate(frames):
            w.write_frame(fr, step=i)

    # spills are deleted after compose
    assert not list(tmp_path.glob("*.spill*"))

    with tpgsd.pypgsd.PGSDFile(open(direct, "rb")) as fd, \
            tpgsd.pypgsd.PGSDFile(open(composed, "rb")) as fc:
        assert fc.nframes == fd.nframes == len(frames)
        for i in range(len(frames)):
            for name in ("particles/position", "particles/density",
                         "configuration/step"):
                numpy.testing.assert_array_equal(
                    fc.read_chunk(i, name), fd.read_chunk(i, name), err_msg=name
                )
        # static chunks land in frame 0 only, as the direct writer does
        numpy.testing.assert_array_equal(
            fc.read_chunk(0, "particles/N"), fd.read_chunk(0, "particles/N")
        )
        assert not fc._find_chunk(1, "particles/N")


def test_composed_sharded_arrays(tmp_path):
    """Device-sharded jax arrays spill per-shard and compose globally."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpgsd.parallel import make_mesh

    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("shard"))
    n = 32
    x = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    x = jax.device_put(x, sharding)

    path = str(tmp_path / "sharded.gsd")
    with ComposedFrameWriter(path, application="t") as w:
        w.write_frame({"particles/position": x}, step=7)

    with tpgsd.pypgsd.PGSDFile(open(path, "rb")) as f:
        assert f.nframes == 1
        numpy.testing.assert_array_equal(
            f.read_chunk(0, "particles/position"), numpy.asarray(x)
        )
        assert f.read_chunk(0, "configuration/step")[0] == 7


def test_compose_truncates_torn_tail(tmp_path):
    """A crashed spill (no clean-close marker) composes only frames
    strictly before the last started one - the possibly-torn final
    frame never reaches the output."""
    path = str(tmp_path / "torn.gsd")
    w = ComposedFrameWriter(path, application="t", keep_spills=True)
    frames = _frames(n_frames=3, n=8)
    for i, fr in enumerate(frames):
        w.write_frame(fr, step=i)
    w.flush()
    spill = w._spill_paths[0]
    w._fh.close()
    w._closed = True  # simulate a crash: no end marker, torn garbage

    with open(spill, "ab") as fh:
        from tpgsd.parallel.compose_io import _MAGIC, _REC

        fh.write(_REC.pack(_MAGIC, 4, 3, 0, 1000, 3, 6, 0, 0))
        fh.write(b"nametruncated")

    n = compose(path, [spill], application="t")
    assert n == 2  # frame 2 was the last started -> distrusted
    with tpgsd.pypgsd.PGSDFile(open(path, "rb")) as f:
        assert f.nframes == 2
        numpy.testing.assert_array_equal(
            f.read_chunk(1, "particles/position"),
            frames[1]["particles/position"],
        )


def test_compose_drops_midframe_crash(tmp_path):
    """A frame whose records were only partially spilled (crash between
    chunks of one frame) is dropped entirely - no partial frames."""
    path = str(tmp_path / "midframe.gsd")
    w = ComposedFrameWriter(path, application="t", keep_spills=True)
    frames = _frames(n_frames=1, n=8)
    w.write_frame(frames[0], step=0)
    # frame 1: crash after only the first chunk's record
    w._append_record(
        "particles/position", 1, 0,
        frames[0]["particles/position"],
    )
    w.flush()
    spill = w._spill_paths[0]
    w._fh.close()
    w._closed = True  # no end marker

    n = compose(path, [spill], application="t")
    assert n == 1
    with tpgsd.pypgsd.PGSDFile(open(path, "rb")) as f:
        assert f.nframes == 1


def test_clean_close_keeps_last_frame(tmp_path):
    """With the clean-close marker, every written frame composes (the
    conservative last-frame drop applies only to crashes), and the
    composed file passes the full fsck walk."""
    path = str(tmp_path / "clean.gsd")
    frames = _frames(n_frames=2, n=8)
    with ComposedFrameWriter(path, application="t") as w:
        for i, fr in enumerate(frames):
            w.write_frame(fr, step=i)
    with tpgsd.pypgsd.PGSDFile(open(path, "rb")) as f:
        assert f.nframes == 2
    with open(path, "rb") as fh:
        report = tpgsd.pypgsd.verify(fh)
    assert report["ok"], report["errors"]
    assert report["frames"] == 2


def test_composed_through_async_dump_runner(tmp_path):
    """The full object-store pipeline: async double-buffered dumps into
    the compose-on-commit writer, composed at close, fsck-clean."""
    from tpgsd.io_runtime import AsyncDumpRunner

    path = str(tmp_path / "async_composed.gsd")
    frames = _frames(n_frames=4, n=16)
    writer = ComposedFrameWriter(path, application="t")
    with AsyncDumpRunner(writer, depth=2) as dump:
        for i, fr in enumerate(frames):
            dump.submit(fr, step=i)

    with tpgsd.pypgsd.PGSDFile(open(path, "rb")) as f:
        assert f.nframes == 4
        numpy.testing.assert_array_equal(
            f.read_chunk(3, "particles/position"),
            frames[3]["particles/position"],
        )
    with open(path, "rb") as fh:
        report = tpgsd.pypgsd.verify(fh)
    assert report["ok"], report["errors"]


def test_composed_rejects_3d_arrays(tmp_path):
    """>2-D chunks raise loudly (matching the direct writer) instead of
    desyncing the spill stream."""
    path = str(tmp_path / "bad3d.gsd")
    w = ComposedFrameWriter(
        path, application="t",
        static={"bad/threed": numpy.ones((2, 3, 4), numpy.float32)},
    )
    with pytest.raises(ValueError, match="1 or 2 dimensional"):
        w.write_frame({"particles/position": numpy.zeros((4, 3), numpy.float32)})
    w._fh.close()
    w._closed = True


MP_WORKER = textwrap.dedent(
    """
    import sys
    pid = int(sys.argv[1]); nprocs = int(sys.argv[2])
    fname = sys.argv[3]; port = sys.argv[4]; repo = sys.argv[5]
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address="localhost:" + port,
        num_processes=nprocs, process_id=pid)
    sys.path.insert(0, repo)
    import numpy
    from tpgsd.parallel.comm import JaxProcessComm
    from tpgsd.parallel.compose_io import ComposedFrameWriter

    comm = JaxProcessComm()
    counts = [3, 5]
    lo = sum(counts[:pid])
    data = numpy.arange(8, dtype=numpy.float64)

    class _Shards:
        # minimal duck-typed stand-in for a host-sharded array: each
        # process contributes only its own row range
        pass

    w = ComposedFrameWriter(fname, application="mp", schema="none",
                            schema_version=(1, 0), comm=comm)
    for frame in range(2):
        local = data[lo:lo + counts[pid]] + frame
        # spill the local rows directly through the record API
        w._append_record("d", frame, lo, local.reshape(-1, 1))
        if comm.rank == 0:
            w._append_record("step", frame, 0,
                             numpy.array([frame], numpy.uint64), flags=1)
        w._frame += 1
    w.close()
    print("proc", pid, "OK")
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_compose(tmp_path):
    """Two real processes spill privately; the controller composes one
    coherent file at close."""
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(MP_WORKER)
    fname = str(tmp_path / "mp_composed.gsd")
    port = str(_free_port())

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), "2", fname, port, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, out[-2000:]

    with tpgsd.pypgsd.PGSDFile(open(fname, "rb")) as f:
        assert f.nframes == 2
        numpy.testing.assert_array_equal(
            f.read_chunk(1, "d").reshape(-1),
            numpy.arange(8, dtype=numpy.float64) + 1,
        )
        assert f.read_chunk(1, "step")[0] == 1
