"""Multi-rank file-layer protocol tests without MPI.

``ThreadComm`` implements the Communicator interface over threading
primitives, so N threads drive N :class:`tpgsd.fl.PGSDFile` handles on
the SAME file through the full collective protocol: rank-0 metadata
ownership, the all-gather-of-sizes offset computation, striped direct
writes, buffered-flush rebasing, and the committed-name/index
replication.  The reference has NO automated multi-rank tests at all
(SURVEY.md section 4 - benchmarks under mpirun only); this harness
exercises the same protocol its MPI ranks run.
"""

import threading

import numpy
import numpy.testing
import pytest

import tpgsd.fl
import tpgsd.pypgsd


class ThreadComm:
    """Communicator over threads: barrier + shared-slot collectives."""

    class Shared:
        def __init__(self, size):
            self.size = size
            self.barrier_obj = threading.Barrier(size)
            self.slots = [None] * size

    def __init__(self, rank, shared):
        self.rank = rank
        self.size = shared.size
        self._s = shared

    def barrier(self):
        self._s.barrier_obj.wait()

    def allgather(self, value):
        self._s.slots[self.rank] = value
        self.barrier()
        out = list(self._s.slots)
        self.barrier()
        return out

    def bcast(self, value, root=0):
        if self.rank == root:
            self._s.slots[root] = value
        self.barrier()
        out = self._s.slots[root]
        self.barrier()
        return out

    def allreduce_sum(self, value):
        return sum(self.allgather(value))

    def allreduce_max(self, value):
        return max(self.allgather(value))


def run_ranks(size, fn):
    """Run ``fn(rank, comm)`` on ``size`` threads; re-raise any error."""
    shared = ThreadComm.Shared(size)
    errors = []

    def runner(rank):
        try:
            fn(rank, ThreadComm(rank, shared))
        except BaseException as e:  # noqa: BLE001
            errors.append((rank, e))
            # unblock peers stuck in a barrier
            shared.barrier_obj.abort()

    threads = [
        threading.Thread(target=runner, args=(r,), name="rank%d" % r)
        for r in range(size)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    if errors:
        rank, err = errors[0]
        raise AssertionError("rank %d failed: %r" % (rank, err)) from err


def test_striped_collective_write(tmp_path):
    """3 ranks write uneven row partitions of shared chunks; the
    assembled file is verified by both independent readers."""
    fname = str(tmp_path / "mr_striped.gsd")
    counts = numpy.array([5, 3, 4], dtype=numpy.uint64)
    n = int(counts.sum())
    base = numpy.arange(n * 2, dtype=numpy.float64).reshape(n, 2)
    nframes = 3

    def work(rank, comm):
        lo = int(counts[:rank].sum())
        hi = lo + int(counts[rank])
        f = tpgsd.fl.PGSDFile(
            fname, "w", application="mr", schema="none",
            schema_version=(1, 0), comm=comm,
        )
        for frame in range(nframes):
            f.write_chunk(
                "particles/data", base[lo:hi] + frame,
                offset=counts, rank=rank, write_all=True,
            )
            f.end_frame()
        f.close()

    run_ranks(3, work)

    for opener in (
        lambda: tpgsd.fl.open(fname, "r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(fname, "rb")),
    ):
        with opener() as f:
            assert f.nframes == nframes
            for frame in range(nframes):
                numpy.testing.assert_array_equal(
                    f.read_chunk(frame, "particles/data"), base + frame
                )


def test_rank0_scalars_plus_striped(tmp_path):
    """Controller-only small chunks (write_all=False, buffered) mix with
    striped particle chunks - the hoomd append pattern."""
    fname = str(tmp_path / "mr_mixed.gsd")
    counts = numpy.array([4, 4], dtype=numpy.uint64)
    pos = numpy.random.RandomState(0).rand(8, 3).astype(numpy.float32)

    def work(rank, comm):
        f = tpgsd.fl.PGSDFile(
            fname, "w", application="mr", schema="hoomd",
            schema_version=(1, 4), comm=comm,
        )
        for frame in range(2):
            # write_chunk is collective: every rank calls it for every
            # chunk; controller-only chunks pass write_all=False and the
            # controller's copy is the one indexed (reference semantics:
            # pgsd/pgsd/hoomd.py:608-612 commented intent + SURVEY 2.6#2)
            f.write_chunk(
                "configuration/step",
                numpy.array([frame], numpy.uint64),
                write_all=False,
            )
            lo = rank * 4
            f.write_chunk(
                "particles/position", pos[lo : lo + 4] * (frame + 1),
                offset=counts, rank=rank, write_all=True,
            )
            f.end_frame()
        f.close()

    run_ranks(2, work)

    with tpgsd.fl.open(fname, "r") as f:
        assert f.nframes == 2
        assert f.read_chunk(1, "configuration/step")[0] == 1
        numpy.testing.assert_allclose(
            f.read_chunk(1, "particles/position"), pos * 2
        )


def test_single_writer_direct_write_all_false(tmp_path):
    """A write_all=False chunk above the buffer cap resolves to the
    direct path; exactly the controller writes it (the reference's
    ``if (all || rank == 0)`` guard, pgsd/pgsd/pgsd.c:2228).  Redundant
    overlapping pwrites from the other ranks would waste shared-FS
    bandwidth and silently paper over caller divergence."""
    fname = str(tmp_path / "mr_single_writer.gsd")
    big = numpy.arange(4096, dtype=numpy.float64)  # 32 KiB >> 1 KiB cap
    data_writes = [0, 0, 0]

    def work(rank, comm):
        f = tpgsd.fl.PGSDFile(
            fname, "w", application="mr", schema="none",
            schema_version=(1, 0), comm=comm,
        )
        f.maximum_write_buffer_size = 1024  # force the direct branch
        orig = f._fh.pwrite_many

        def counting(writes):
            data_writes[rank] += len(writes)
            return orig(writes)

        f._fh.pwrite_many = counting
        f.write_chunk("big", big, write_all=False)
        # a striped write_all=True chunk in the same frame still has
        # every rank write its own stripe
        f.write_chunk(
            "striped",
            numpy.full(4, rank, numpy.int32),
            offset=numpy.array([4, 4, 4], numpy.uint64),
            rank=rank,
        )
        f.end_frame()
        f.close()

    run_ranks(3, work)

    assert data_writes[0] >= 2  # controller: the global chunk + its stripe
    assert data_writes[1] == 1  # others: their stripe ONLY
    assert data_writes[2] == 1

    with tpgsd.fl.open(fname, "r") as f:
        numpy.testing.assert_array_equal(f.read_chunk(0, "big"), big)
        numpy.testing.assert_array_equal(
            f.read_chunk(0, "striped"),
            numpy.repeat(numpy.arange(3, dtype=numpy.int32), 4),
        )


def test_all_ranks_read_after_write(tmp_path):
    """Every rank can resolve and read chunks committed in the same
    session - requires the name/index replication at flush."""
    fname = str(tmp_path / "mr_read.gsd")
    counts = numpy.array([3, 3], dtype=numpy.uint64)
    data = numpy.arange(6, dtype=numpy.int32)

    def work(rank, comm):
        f = tpgsd.fl.PGSDFile(
            fname, "w", application="mr", schema="none",
            schema_version=(1, 0), comm=comm,
        )
        lo = rank * 3
        f.write_chunk("d", data[lo : lo + 3], offset=counts, rank=rank)
        f.end_frame()

        # both ranks must see the committed chunk without reopening
        assert f.chunk_exists(0, "d")
        full = f.read_chunk(0, "d")
        numpy.testing.assert_array_equal(full, data)
        # strided per-rank read-back (reference: pgsd.c:2496-2534)
        stripe = f.read_chunk(0, "d", N=3, M=1, offset=lo, r_all=True)
        numpy.testing.assert_array_equal(stripe, data[lo : lo + 3])
        f.close()

    run_ranks(2, work)


def test_consistency_check_reports_divergence(tmp_path, capsys):
    """Ranks completing different frame counts must be reported."""
    fname = str(tmp_path / "mr_diverge.gsd")

    def work(rank, comm):
        f = tpgsd.fl.PGSDFile(
            fname, "w", application="mr", schema="none",
            schema_version=(1, 0), comm=comm,
        )
        # rank 1 "misses" a frame: manually desync the counter
        if rank == 1:
            f._cur_frame += 1
        f.write_chunk(
            "d", numpy.arange(2, dtype=numpy.int32),
            offset=numpy.array([1, 1], numpy.uint64), rank=rank,
        )
        f.end_frame()
        f.close()

    import sys
    from io import StringIO

    captured = StringIO()
    old = sys.stderr
    sys.stderr = captured
    try:
        run_ranks(2, work)
    finally:
        sys.stderr = old
    assert "frame counters diverge" in captured.getvalue()


def test_append_reopen_multirank(tmp_path):
    """Append mode across a reopen continues the frame counter on every
    rank (resume semantics; reference: pgsd/pgsd/pgsd.c:1630-1639)."""
    fname = str(tmp_path / "mr_append.gsd")
    counts = numpy.array([2, 2], dtype=numpy.uint64)

    def session(mode):
        def work(rank, comm):
            if mode == "w":
                f = tpgsd.fl.PGSDFile(
                    fname, "w", application="mr", schema="none",
                    schema_version=(1, 0), comm=comm,
                )
            else:
                f = tpgsd.fl.PGSDFile(fname, "a", comm=comm)
            v = numpy.full(2, f.nframes, numpy.int32)
            f.write_chunk("d", v, offset=counts, rank=rank)
            f.end_frame()
            f.close()

        return work

    run_ranks(2, session("w"))
    run_ranks(2, session("a"))

    with tpgsd.fl.open(fname, "r") as f:
        assert f.nframes == 2
        numpy.testing.assert_array_equal(
            f.read_chunk(1, "d"), numpy.full(4, 1, numpy.int32)
        )


def test_strict_mode_raises_on_divergence(tmp_path):
    """With strict=True a diverged writer raises instead of printing -
    it must not keep writing garbage offsets."""
    fname = str(tmp_path / "mr_strict.gsd")

    def work(rank, comm):
        f = tpgsd.fl.PGSDFile(
            fname, "w", application="mr", schema="none",
            schema_version=(1, 0), comm=comm, strict=True,
        )
        if rank == 1:
            f._cur_frame += 1  # simulate a missed frame
        f.write_chunk(
            "d", numpy.arange(2, dtype=numpy.int32),
            offset=numpy.array([1, 1], numpy.uint64), rank=rank,
        )
        f.end_frame()
        f.close()

    with pytest.raises(AssertionError, match="consistency error"):
        run_ranks(2, work)


def test_flush_metadata_is_batched(tmp_path):
    """The flush metadata protocol must stay O(1) collectives: one
    object bcast for the committed names, one for the committed index
    entries + scalars (the reference does ~10 per flush,
    pgsd/pgsd/pgsd.c:1229-1317 + 2064-2067)."""
    fname = str(tmp_path / "mr_batched.gsd")
    counts = numpy.array([2, 2], dtype=numpy.uint64)
    bcasts = [0, 0]

    class CountingComm(ThreadComm):
        def bcast(self, value, root=0):
            bcasts[self.rank] += 1
            return super().bcast(value, root)

    shared = ThreadComm.Shared(2)
    errors = []

    def runner(rank):
        try:
            comm = CountingComm(rank, shared)
            f = tpgsd.fl.PGSDFile(
                fname, "w", application="mr", schema="none",
                schema_version=(1, 0), comm=comm,
            )
            f.write_chunk(
                "d", numpy.arange(2, dtype=numpy.int32),
                offset=counts, rank=rank,
            )
            before = bcasts[rank]
            f.end_frame()  # flushes (direct entries pending)
            per_flush = bcasts[rank] - before
            # names payload + index payload; nothing per-scalar
            assert per_flush <= 2, per_flush
            f.close()
        except BaseException as e:  # noqa: BLE001
            errors.append((rank, e))
            shared.barrier_obj.abort()

    threads = [
        threading.Thread(target=runner, args=(r,)) for r in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    if errors:
        rank, err = errors[0]
        raise AssertionError("rank %d failed: %r" % (rank, err)) from err


def test_buffer_cap_overflow_multirank(tmp_path):
    """Buffered chunks crossing the write-buffer cap mid-frame: the
    overflow flush is a COLLECTIVE decision, so every rank must take it
    together even though only the controller stages bytes.  Before the
    round-4 fix the controller entered ``_flush_write_buffer``'s
    allgather alone (gated on its local buffer length) and the ranks
    desynchronized - the reference decides collectively via
    Allreduce(MAX) (reference: pgsd/pgsd/pgsd.c:2156-2160)."""
    fname = str(tmp_path / "mr_bufcap.gsd")
    nchunks, nframes = 30, 2
    payload = numpy.arange(64, dtype=numpy.float64)  # 512 B/chunk

    def work(rank, comm):
        f = tpgsd.fl.PGSDFile(
            fname, "w", application="mr", schema="none",
            schema_version=(1, 0), comm=comm,
        )
        # shrink the cap so ~8 chunks overflow it (30 * 512 B >> 4096 B)
        f.maximum_write_buffer_size = 4096
        for frame in range(nframes):
            for c in range(nchunks):
                f.write_chunk(
                    "log/q%02d" % c, payload + frame * nchunks + c,
                    write_all=False,
                )
            f.end_frame()
        f.close()

    run_ranks(2, work)

    for opener in (
        lambda: tpgsd.fl.open(fname, "r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(fname, "rb")),
    ):
        with opener() as f:
            assert f.nframes == nframes
            for frame in range(nframes):
                for c in range(nchunks):
                    numpy.testing.assert_array_equal(
                        f.read_chunk(frame, "log/q%02d" % c),
                        payload + frame * nchunks + c,
                    )


def test_upgrade_multirank(tmp_path):
    """Collective v1 -> v2 upgrade: only the controller writes the
    relocated namelist/index and the header (the controller-commit
    discipline every other metadata path follows); every rank's handle
    ends consistent and can keep appending."""
    from tests.test_compat import _make_v1_file

    rng = numpy.random.RandomState(3)
    frames = [
        [("d", rng.rand(6).astype(numpy.float32))] for _ in range(2)
    ]
    fname = tmp_path / "mr_upgrade.gsd"
    _make_v1_file(fname, frames, nframes=2)
    fname = str(fname)
    writes = [0, 0]

    def work(rank, comm):
        class CountingFH:
            """Wrap the file handle to count mutating calls per rank."""

            def __init__(self, fh):
                self._fh = fh

            def __getattr__(self, name):
                attr = getattr(self._fh, name)
                if name in ("pwrite", "pwrite_many", "truncate", "fsync"):
                    def counted(*a, **kw):
                        writes[rank] += 1
                        return attr(*a, **kw)

                    return counted
                return attr

        f = tpgsd.fl.PGSDFile(
            fname, "r+", comm=comm,
        )
        f._fh = CountingFH(f._fh)
        assert f.pgsd_version == (1, 0)
        before = writes[rank]
        f.upgrade()
        assert f.pgsd_version == (2, 0)
        if rank != 0:
            # non-controller ranks issue ZERO file mutations
            assert writes[rank] == before
        # both handles stay usable: append one more frame collectively
        counts = numpy.array([3, 3], dtype=numpy.uint64)
        lo = 3 * rank
        data = numpy.arange(6, dtype=numpy.float32)
        f.write_chunk("d", data[lo:lo + 3], offset=counts, rank=rank)
        f.end_frame()
        f.close()

    run_ranks(2, work)

    with tpgsd.pypgsd.PGSDFile(open(fname, "rb")) as f:
        assert f.gsd_version == (2, 0)
        assert f.nframes == 3
        for i, chunks in enumerate(frames):
            numpy.testing.assert_array_equal(
                f.read_chunk(i, "d"), chunks[0][1]
            )
        numpy.testing.assert_array_equal(
            f.read_chunk(2, "d"), numpy.arange(6, dtype=numpy.float32)
        )
