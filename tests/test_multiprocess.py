"""REAL multi-process file-layer test over jax.distributed.

Two OS processes coordinate through ``JaxProcessComm``
(multihost_utils over the Gloo CPU backend): collective open, the
striped offset protocol, controller-only buffered chunks, name/index
replication for in-session reads.  This is the closest local stand-in
for a multi-host TPU pod; the threading harness in test_multirank.py
covers the same protocol in-process.
"""

import socket
import subprocess
import sys
import textwrap

import numpy
import numpy.testing
import pytest

import tpgsd.pypgsd

WORKER = textwrap.dedent(
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
    import tpgsd.fl
    from tpgsd.parallel.comm import JaxProcessComm

    comm = JaxProcessComm()
    assert comm.size == nprocs and comm.rank == pid
    counts = numpy.array([3, 5], dtype=numpy.uint64)
    lo = int(counts[:pid].sum())
    data = numpy.arange(int(counts.sum()), dtype=numpy.float64)

    f = tpgsd.fl.PGSDFile(fname, "w", application="mp", schema="none",
                          schema_version=(1, 0), comm=comm)
    for frame in range(2):
        f.write_chunk("step", numpy.array([frame], numpy.uint64),
                      write_all=False)
        f.write_chunk("d", data[lo:lo + int(counts[pid])] + frame,
                      offset=counts, rank=pid, write_all=True)
        f.end_frame()
    # in-session reads on every process need the replication at flush
    assert f.chunk_exists(0, "d")
    numpy.testing.assert_array_equal(f.read_chunk(1, "d"), data + 1)
    f.close()
    print("proc", pid, "OK")
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_striped_write(tmp_path):
    import pathlib

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    fname = str(tmp_path / "mp.gsd")
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
            f.read_chunk(1, "d"), numpy.arange(8, dtype=numpy.float64) + 1
        )
        assert f.read_chunk(1, "step")[0] == 1
