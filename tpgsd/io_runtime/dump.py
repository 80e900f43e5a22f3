"""Double-buffered asynchronous frame dump.

:class:`AsyncDumpRunner` owns a writer thread and a bounded frame queue.
``submit()`` enqueues a dict of (device or host) arrays and returns
immediately; the writer thread performs the device->host transfer and the
positioned file writes while the device computes the next step.  A queue
bound of ``depth`` frames applies backpressure so a slow disk cannot pile
up unbounded host memory.

Overlap correctness: ``jax.Array`` is immutable and the runner holds a
reference until the frame is on disk, so the simulation can never mutate
a frame mid-dump (SURVEY.md section 7 "Overlap correctness").  D2H starts
eagerly via ``copy_to_host_async`` at submit time, so the transfer rides
alongside the already-dispatched next step.
"""

import logging
import queue
import threading
import time
from dataclasses import dataclass, field

logger = logging.getLogger("tpgsd.io_runtime")

_SENTINEL = object()


@dataclass
class DumpStats:
    """Aggregate dump metrics (the observability the reference keeps in
    its benchmarks only; reference: pgsd/scripts/benchmark-write.cc:146-172)."""

    frames: int = 0
    bytes: int = 0
    write_seconds: float = 0.0  # writer-thread busy time
    wall_seconds: float = 0.0  # first submit -> close
    _t_first: float = field(default=0.0, repr=False)

    @property
    def write_mb_s(self):
        """MB/s sustained by the writer thread while busy."""
        return self.bytes / 1e6 / self.write_seconds if self.write_seconds else 0.0

    @property
    def effective_mb_s(self):
        """MB/s over the whole overlapped wall time."""
        return self.bytes / 1e6 / self.wall_seconds if self.wall_seconds else 0.0

    @property
    def overlap_efficiency(self):
        """Fraction of wall time the writer was busy (1.0 = I/O-bound)."""
        return self.write_seconds / self.wall_seconds if self.wall_seconds else 0.0


class AsyncDumpRunner:
    """Stream frames to a trajectory file from a background writer thread.

    Args:
        writer: a :class:`tpgsd.parallel.ShardedFrameWriter` (or anything
            with ``write_frame(chunks, step=...)`` / ``flush`` / ``close``).
        depth: max frames in flight (default 2 = classic double buffer).
        own_writer: close ``writer`` when the runner closes (default True).

    Example:
        with AsyncDumpRunner(ShardedFrameWriter(path)) as dump:
            for i in range(steps):
                state, (rho, p, _) = step(state)
                dump.submit({"particles/position": state.x}, step=i)
        print(dump.stats.effective_mb_s)
    """

    def __init__(self, writer, depth=2, own_writer=True):
        self._writer = writer
        self._own_writer = own_writer
        self._queue = queue.Queue(maxsize=max(1, int(depth)))
        self._error = None
        self.stats = DumpStats()
        self._closed = False
        self._thread = threading.Thread(
            target=self._drain, name="tpgsd-dump", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------------ #

    def _drain(self):
        # The thread stays alive until the sentinel even after a writer
        # error: queued frames past the failure are consumed-and-discarded
        # (each still task_done-ed) so flush()'s queue.join() and close()'s
        # blocking put can never hang on a dead writer (e.g. disk full) —
        # the error surfaces as an exception at the next submit/flush/close.
        while True:
            item = self._queue.get()
            if item is _SENTINEL:
                return
            chunks, step = item
            try:
                if self._error is not None:
                    continue
                t0 = time.perf_counter()
                self._writer.write_frame(chunks, step=step)
                dt = time.perf_counter() - t0
                nbytes = sum(_nbytes(a) for a in chunks.values())
                self.stats.write_seconds += dt
                self.stats.frames += 1
                self.stats.bytes += nbytes
                from ..utils.trace import get_tracer

                tracer = get_tracer()
                if tracer.enabled:
                    tracer.record(
                        "dump_frame", frame=self.stats.frames - 1,
                        bytes=nbytes, seconds=round(dt, 6),
                    )
            except BaseException as e:  # surface on next submit/close
                logger.exception("async dump failed")
                self._error = e
            finally:
                self._queue.task_done()

    def _check_error(self):
        if self._error is not None:
            err, self._error = self._error, None
            self._closed = True
            raise RuntimeError("async dump writer failed") from err

    # ------------------------------------------------------------------ #

    def submit(self, chunks, step=None):
        """Enqueue one frame for writing; blocks only when ``depth``
        frames are already in flight.

        Args:
            chunks: dict chunk name -> array (``jax.Array`` or numpy).
            step: optional ``configuration/step`` value.
        """
        if self._closed:
            raise ValueError("runner is closed")
        self._check_error()
        if not self.stats._t_first:
            self.stats._t_first = time.perf_counter()
        # start every shard's D2H now; it overlaps the running device step
        for arr in chunks.values():
            _start_host_copy(arr)
        self._queue.put((dict(chunks), step))
        self._check_error()

    def flush(self):
        """Block until every submitted frame is on disk."""
        self._queue.join()
        self._check_error()
        self._writer.flush()

    def close(self):
        """Drain the queue, stop the writer thread, close the file."""
        if self._closed:
            return
        self._closed = True
        if self._thread.is_alive():
            self._queue.put(_SENTINEL)
        self._thread.join()
        if self.stats._t_first:
            self.stats.wall_seconds = time.perf_counter() - self.stats._t_first
        if self._own_writer:
            self._writer.close()
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async dump writer failed") from err

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        if exc_type is None:
            self.close()
        else:  # don't mask the original exception with writer errors
            try:
                self.close()
            except Exception:
                logger.exception("error closing dump runner")


def _nbytes(arr):
    try:
        return int(arr.size) * int(arr.dtype.itemsize)
    except Exception:
        return 0


def _start_host_copy(arr):
    """Kick off an async device->host copy when ``arr`` is a jax.Array."""
    start = getattr(arr, "copy_to_host_async", None)
    if start is not None:
        try:
            start()
        except Exception:
            pass  # non-addressable or already-host arrays


def run_dump_loop(step_fn, state, writer, n_steps, frame_of, depth=2):
    """Couple a jitted step with an async dump: the canonical overlapped
    simulation loop.

    Args:
        step_fn: ``state -> (state, aux)`` (jitted).
        state: initial state pytree.
        writer: ShardedFrameWriter (consumed; closed on return).
        n_steps: number of steps == frames.
        frame_of: ``(state, aux, i) -> dict`` building the frame's chunks.
        depth: frames in flight.

    Returns:
        ``(final_state, DumpStats)``.
    """
    with AsyncDumpRunner(writer, depth=depth) as dump:
        for i in range(n_steps):
            state, aux = step_fn(state)
            dump.submit(frame_of(state, aux, i), step=i)
        dump.flush()
    return state, dump.stats
