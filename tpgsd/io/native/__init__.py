"""ctypes bindings for the native I/O core (``tpgsd_io.cpp``).

Loads (building on first use if necessary) ``libtpgsd_io.so`` and exposes
:class:`NativeFileHandle`, a drop-in for
:class:`tpgsd.io.backend.PosixFileHandle` whose batched shard writes run
in C++ worker threads with the GIL released for the whole batch.  Import
raises when no compiler and no prebuilt library is available; callers
fall back to the pure-Python handle (see ``tpgsd.io.backend.open_file``).
"""

import ctypes
import os
import subprocess
import sys
import tempfile

from ..backend import PosixFileHandle

_SRC = os.path.join(os.path.dirname(__file__), "tpgsd_io.cpp")


class _TioSlice(ctypes.Structure):
    _fields_ = [
        ("buf", ctypes.c_void_p),
        ("len", ctypes.c_uint64),
        ("off", ctypes.c_int64),
    ]


def _lib_path():
    return os.path.join(
        os.path.dirname(__file__),
        "libtpgsd_io-py%d%d.so" % sys.version_info[:2],
    )


def _build():
    """Compile the native core (one-time, cached next to the source).

    A CMake-built ``libtpgsd_io.so`` (see /CMakeLists.txt) is preferred
    when present and current.
    """
    cmake_out = os.path.join(os.path.dirname(__file__), "libtpgsd_io.so")
    if os.path.exists(cmake_out) and os.path.getmtime(cmake_out) >= os.path.getmtime(_SRC):
        return cmake_out
    out = _lib_path()
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(_SRC):
        return out
    tmp = tempfile.mktemp(suffix=".so", dir=os.path.dirname(out))
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        # warning-clean is enforced, not aspirational (the reference
        # wires clang-tidy into its build the same way,
        # reference: pgsd/CMake/LinterSetup.cmake:1-13)
        "-Wall", "-Wextra", "-Werror",
        _SRC, "-o", tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    os.replace(tmp, out)  # atomic under concurrent builders
    return out


_lib = ctypes.CDLL(_build())
_lib.tio_pwrite_batch.restype = ctypes.c_int
_lib.tio_pwrite_batch.argtypes = [
    ctypes.c_int, ctypes.POINTER(_TioSlice), ctypes.c_int64, ctypes.c_int,
]
_lib.tio_pwrite_batch2.restype = ctypes.c_int
_lib.tio_pwrite_batch2.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.POINTER(_TioSlice), ctypes.c_int64,
    ctypes.c_int, ctypes.c_uint64,
]
_lib.tio_open_direct.restype = ctypes.c_int
_lib.tio_open_direct.argtypes = [ctypes.c_char_p]
_lib.tio_open_direct_read.restype = ctypes.c_int
_lib.tio_open_direct_read.argtypes = [ctypes.c_char_p]
_lib.tio_pread_batch.restype = ctypes.c_int
_lib.tio_pread_batch.argtypes = _lib.tio_pwrite_batch.argtypes
_lib.tio_pread_batch2.restype = ctypes.c_int
_lib.tio_pread_batch2.argtypes = _lib.tio_pwrite_batch2.argtypes
_lib.tio_pread_span2.restype = ctypes.c_int
_lib.tio_pread_span2.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_void_p, ctypes.c_uint64,
    ctypes.c_int64, ctypes.c_int, ctypes.c_uint64,
]
_lib.tio_pwrite.restype = ctypes.c_int
_lib.tio_pwrite.argtypes = [
    ctypes.c_int, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int64,
]
_lib.tio_pread.restype = ctypes.c_int
_lib.tio_pread.argtypes = _lib.tio_pwrite.argtypes
_lib.tio_pwritev.restype = ctypes.c_int
_lib.tio_pwritev.argtypes = [
    ctypes.c_int, ctypes.POINTER(_TioSlice), ctypes.c_int64, ctypes.c_int64,
]
_lib.tio_fsync.restype = ctypes.c_int
_lib.tio_fsync.argtypes = [ctypes.c_int]


def _raise(rc, what, name):
    if rc != 0:
        raise IOError(
            "%s failed on %s: %s" % (what, name, os.strerror(-rc))
        )


class NativeFileHandle(PosixFileHandle):
    """Positioned I/O backed by the native core.

    ``pwrite_many`` fans disjoint-offset shard writes over C++ threads -
    the per-host analogue of the reference's all-ranks-concurrent
    ``MPI_File_write_at`` (reference: pgsd/pgsd/pgsd.c:2225-2237).
    """

    #: threads for batched writes; overridable via TPGSD_IO_THREADS.
    #: Floor of 4 regardless of CPU count: batched positioned writes are
    #: I/O-bound (O_DIRECT bypasses the cache) and benefit from queue
    #: depth, not cores.
    threads = int(os.environ.get("TPGSD_IO_THREADS", "0")) or min(
        8, max(4, (os.cpu_count() or 1))
    )
    #: threads for batched BUFFERED reads: capped at the CORE count.
    #: Buffered reads often serve from the page cache, where the work is
    #: pure memcpy - on a 1-vCPU host, 4 threads thrashing one core
    #: measured 349 MB/s where a single thread does 4.4 GB/s.  O_DIRECT
    #: reads are the opposite regime - pure I/O, no memcpy contention -
    #: and take the write-style ``threads`` floor of 4 instead (queue
    #: depth on the device: measured 145 MB/s buffered 1-thread vs
    #: 1969 MB/s direct 1-thread vs 4787 MB/s direct 4-thread on the
    #: same 1-vCPU host, 3 GB cold file).  An explicit TPGSD_IO_THREADS
    #: wins for both directions.
    read_threads = int(os.environ.get("TPGSD_IO_THREADS", "0")) or max(
        1, min(8, (os.cpu_count() or 1))
    )
    #: writes at least this large route through O_DIRECT (0 disables);
    #: bypassing the page cache sidesteps writeback throttling on
    #: virtualized block devices while small metadata writes stay cached
    direct_threshold = int(
        os.environ.get("TPGSD_IO_DIRECT_THRESHOLD", str(1 << 20))
    )

    def __init__(self, fd, name=""):
        super().__init__(fd, name)
        self._fd_direct = -1
        self._fd_direct_r = -1
        if self.direct_threshold > 0 and name:
            fd_d = _lib.tio_open_direct(os.fsencode(name))
            self._fd_direct = fd_d if fd_d >= 0 else -1
            fd_r = _lib.tio_open_direct_read(os.fsencode(name))
            self._fd_direct_r = fd_r if fd_r >= 0 else -1

    def pwrite(self, offset, data):
        view = memoryview(data).cast("B")
        if view.nbytes == 0:
            return 0
        buf = (ctypes.c_char * view.nbytes).from_buffer_copy(view) if view.readonly else (ctypes.c_char * view.nbytes).from_buffer(view)
        if self._fd_direct >= 0 and view.nbytes >= self.direct_threshold:
            slice_ = (_TioSlice * 1)()
            slice_[0].buf = ctypes.addressof(buf)
            slice_[0].len = view.nbytes
            slice_[0].off = offset
            _raise(
                _lib.tio_pwrite_batch2(
                    self.fd, self._fd_direct, slice_, 1, 1,
                    self.direct_threshold,
                ),
                "pwrite(direct)", self.name,
            )
        else:
            _raise(
                _lib.tio_pwrite(self.fd, ctypes.addressof(buf), view.nbytes, offset),
                "pwrite", self.name,
            )
        return view.nbytes

    def pread_into(self, offset, buffer):
        view = memoryview(buffer).cast("B")
        if view.nbytes == 0:
            return
        buf = (ctypes.c_char * view.nbytes).from_buffer(view)
        if view.nbytes >= self.direct_threshold > 0:
            # large span: stripe over the I/O thread team with the
            # aligned middle through O_DIRECT (read twin of the write
            # split) - this is the path under read_all_chunks'
            # contiguous frame span and every bulk read_chunk.  Direct
            # reads are I/O-bound, so the team size is the write-style
            # ``threads`` (queue depth), not the core-capped
            # ``read_threads``
            nthreads = (
                self.threads if self._fd_direct_r >= 0 else self.read_threads
            )
            _raise(
                _lib.tio_pread_span2(
                    self.fd, self._fd_direct_r, ctypes.addressof(buf),
                    view.nbytes, offset, nthreads, self.direct_threshold,
                ),
                "pread(direct)", self.name,
            )
        else:
            _raise(
                _lib.tio_pread(self.fd, ctypes.addressof(buf), view.nbytes, offset),
                "pread", self.name,
            )

    def pread(self, offset, size):
        out = bytearray(size)
        self.pread_into(offset, out)
        return bytes(out)

    def pwrite_many(self, writes, parallel=None):
        if not writes:
            return
        if len(writes) == 1:
            self.pwrite(writes[0][0], writes[0][1])
            return
        n = len(writes)
        arr = (_TioSlice * n)()
        keep = []
        for i, (off, data) in enumerate(writes):
            view = memoryview(data).cast("B")
            if view.readonly:
                # ctypes needs a writable buffer address source; copy
                # readonly views (rare - chunk data is writable numpy)
                view = memoryview(bytearray(view))
            buf = (ctypes.c_char * view.nbytes).from_buffer(view)
            keep.append((view, buf))
            arr[i].buf = ctypes.addressof(buf)
            arr[i].len = view.nbytes
            arr[i].off = off
        nthreads = self.threads if (parallel is None or parallel) else 1
        _raise(
            _lib.tio_pwrite_batch2(
                self.fd, self._fd_direct, arr, n, nthreads,
                self.direct_threshold,
            ),
            "pwrite_batch", self.name,
        )

    def pread_many(self, reads, parallel=True):
        """Fill ``[(offset, writable_buffer), ...]`` concurrently."""
        if not reads:
            return
        n = len(reads)
        arr = (_TioSlice * n)()
        keep = []
        for i, (off, data) in enumerate(reads):
            view = memoryview(data).cast("B")
            buf = (ctypes.c_char * view.nbytes).from_buffer(view)
            keep.append((view, buf))
            arr[i].buf = ctypes.addressof(buf)
            arr[i].len = view.nbytes
            arr[i].off = off
        # direct-qualifying slices are I/O-bound (write-style thread
        # count); all-buffered batches stay core-capped (memcpy-bound
        # when cache-warm)
        any_direct = self._fd_direct_r >= 0 and any(
            s.len >= self.direct_threshold for s in arr
        )
        nthreads = (self.threads if any_direct else self.read_threads) if parallel else 1
        _raise(
            _lib.tio_pread_batch2(
                self.fd, self._fd_direct_r, arr, n, nthreads,
                self.direct_threshold,
            ),
            "pread_batch", self.name,
        )

    def fsync(self):
        _raise(_lib.tio_fsync(self.fd), "fsync", self.name)

    def close(self):
        for attr in ("_fd_direct", "_fd_direct_r"):
            fd = getattr(self, attr, -1)
            if fd >= 0:
                try:
                    os.close(fd)
                except OSError:
                    pass
                setattr(self, attr, -1)
        super().close()
