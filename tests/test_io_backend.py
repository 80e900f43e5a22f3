"""Positioned-I/O backend tests: pure-Python and native C++ handles.

The native handle is the per-host analogue of the reference's concurrent
``MPI_File_write_at`` fan-out (reference: pgsd/pgsd/pgsd.c:2225-2237).
"""

import os

import numpy
import numpy.testing
import pytest

from tpgsd.io.backend import PosixFileHandle, open_file


def _handles(tmp_path):
    handles = []
    fd = os.open(str(tmp_path / "posix.bin"), os.O_RDWR | os.O_CREAT, 0o644)
    handles.append(PosixFileHandle(fd, name="posix.bin"))
    try:
        from tpgsd.io.native import NativeFileHandle

        fd = os.open(str(tmp_path / "native.bin"), os.O_RDWR | os.O_CREAT, 0o644)
        handles.append(NativeFileHandle(fd, name="native.bin"))
    except Exception:
        pass
    return handles


def test_roundtrip_all_backends(tmp_path):
    for h in _handles(tmp_path):
        data = numpy.arange(4096, dtype=numpy.int32)
        h.pwrite(128, data)
        assert h.size() == 128 + data.nbytes

        out = numpy.empty(4096, numpy.int32)
        h.pread_into(128, out)
        numpy.testing.assert_array_equal(out, data)

        raw = h.pread(128, 64)
        numpy.testing.assert_array_equal(
            numpy.frombuffer(raw, numpy.int32), data[:16]
        )

        h.truncate(128)
        assert h.size() == 128
        h.close()


def test_pwrite_many_disjoint(tmp_path):
    for h in _handles(tmp_path):
        rng = numpy.random.RandomState(0)
        shards = [rng.rand(1000).astype(numpy.float64) for _ in range(8)]
        writes = [(i * 8000, s) for i, s in enumerate(shards)]
        h.pwrite_many(writes)
        for i, s in enumerate(shards):
            out = numpy.empty(1000, numpy.float64)
            h.pread_into(i * 8000, out)
            numpy.testing.assert_array_equal(out, s)
        h.close()


def test_readonly_buffer_write(tmp_path):
    """bytes objects (readonly buffers) must be writable through every
    backend - the header/index paths pass bytes."""
    for h in _handles(tmp_path):
        h.pwrite(0, b"\x01\x02\x03\x04")
        assert h.pread(0, 4) == b"\x01\x02\x03\x04"
        arr = numpy.arange(10, dtype=numpy.int8)
        arr.flags.writeable = False
        h.pwrite(4, arr)
        assert h.pread(4, 10) == arr.tobytes()
        h.close()


def test_native_backend_is_default():
    """open_file prefers the native handle when the toolchain built it."""
    pytest.importorskip("tpgsd.io.native")
    import tempfile

    with tempfile.NamedTemporaryFile() as f:
        h = open_file(f.name)
        assert type(h).__name__ == "NativeFileHandle"
        h.close()


def test_native_pread_many(tmp_path):
    native = pytest.importorskip("tpgsd.io.native")
    fd = os.open(str(tmp_path / "n.bin"), os.O_RDWR | os.O_CREAT, 0o644)
    h = native.NativeFileHandle(fd, name="n.bin")
    data = numpy.arange(8192, dtype=numpy.float32)
    h.pwrite(0, data)
    reads = [
        (0, numpy.empty(2048, numpy.float32)),
        (2048 * 4, numpy.empty(2048, numpy.float32)),
        (4096 * 4, numpy.empty(4096, numpy.float32)),
    ]
    h.pread_many(reads)
    numpy.testing.assert_array_equal(reads[0][1], data[:2048])
    numpy.testing.assert_array_equal(reads[1][1], data[2048:4096])
    numpy.testing.assert_array_equal(reads[2][1], data[4096:])
    h.close()


def test_native_direct_split_read_roundtrip(tmp_path):
    """Large reads route through the O_DIRECT striped span path
    (tio_pread_span2): byte-exact at unaligned offsets and odd sizes,
    cold (fadvise-evicted) and warm."""
    native = pytest.importorskip("tpgsd.io.native")
    path = str(tmp_path / "big.bin")
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
    h = native.NativeFileHandle(fd, name=path)
    if h._fd_direct_r < 0:
        h.close()
        pytest.skip("filesystem does not support O_DIRECT")
    rng = numpy.random.RandomState(7)
    # odd size above the 1 MiB direct threshold, written at an
    # unaligned offset so the split has a buffered head and tail
    data = rng.randint(0, 256, size=3_000_001).astype(numpy.uint8)
    h.pwrite(13, data)
    h.fsync()
    os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)  # cold read
    out = numpy.empty_like(data)
    h.pread_into(13, out)
    numpy.testing.assert_array_equal(out, data)
    out2 = numpy.empty_like(data)  # warm read, same path
    h.pread_into(13, out2)
    numpy.testing.assert_array_equal(out2, data)
    # interior window (aligned-middle only on both ends)
    win = numpy.empty(1_048_576 + 7, numpy.uint8)
    h.pread_into(13 + 9001, win)
    numpy.testing.assert_array_equal(win, data[9001 : 9001 + win.size])
    h.close()


def test_native_pread_many_direct_slices(tmp_path):
    """Batched reads with direct-qualifying slices (>= threshold) mix
    correctly with small buffered slices."""
    native = pytest.importorskip("tpgsd.io.native")
    path = str(tmp_path / "mix.bin")
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
    h = native.NativeFileHandle(fd, name=path)
    rng = numpy.random.RandomState(11)
    data = rng.randint(0, 256, size=4_200_000).astype(numpy.uint8)
    h.pwrite(0, data)
    h.fsync()
    reads = [
        (0, numpy.empty(2_000_000, numpy.uint8)),      # direct
        (2_000_000, numpy.empty(199, numpy.uint8)),    # buffered
        (2_000_199, numpy.empty(2_199_801, numpy.uint8)),  # direct
    ]
    h.pread_many(reads)
    numpy.testing.assert_array_equal(reads[0][1], data[:2_000_000])
    numpy.testing.assert_array_equal(reads[1][1], data[2_000_000:2_000_199])
    numpy.testing.assert_array_equal(reads[2][1], data[2_000_199:])
    h.close()


def test_short_read_raises(tmp_path):
    for h in _handles(tmp_path):
        h.pwrite(0, b"abc")
        with pytest.raises(IOError):
            h.pread(0, 100)
        h.close()
