"""Large-file scale tests (>2 GB), gated behind ``pytest --validate``.

(reference: pgsd/pgsd/test/test_largefile.py:12-13 - 2^27 / 2^28 /
2^29+1 uint32 chunks)
"""

import gc

import numpy
import numpy.testing
import pytest

import tpgsd.fl
import tpgsd.pypgsd


@pytest.mark.validate
@pytest.mark.parametrize("N", [2**27])
def test_large_chunk_roundtrip(tmp_path, N):
    # Data-volume coverage at 512 MB; >2^31 offset arithmetic is covered
    # always-on by test_chunk_beyond_2gb_offset below (multi-GB array
    # generation takes 20+ minutes on hosts with slow first-touch page
    # faults, which is what gates the larger reference sizes 2^28/2^29+1,
    # reference: pgsd/pgsd/test/test_largefile.py:12-13).
    data = numpy.arange(N, dtype=numpy.uint32)
    fname = tmp_path / ("large_%d.gsd" % N)

    with tpgsd.fl.open(
        name=fname, mode="w", application="test_largefile", schema="none",
        schema_version=[1, 0],
    ) as f:
        f.write_chunk(name="data", data=data)
        f.end_frame()

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode="r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            read_data = f.read_chunk(frame=0, name="data")
            assert read_data.shape == (N,)
            numpy.testing.assert_array_equal(data[:1000], read_data[:1000])
            numpy.testing.assert_array_equal(data[-1000:], read_data[-1000:])
            assert int(read_data[N // 2]) == N // 2
            del read_data
            gc.collect()

    fname.unlink()


@pytest.mark.validate
def test_1e8_row_chunk(tmp_path):
    """BASELINE-scale frame: one 1e8-row float32x3 chunk (1.2 GB)
    written through the sharded writer and read back in stripes."""
    from tpgsd.parallel import ShardedFrameWriter

    n = 100_000_000
    pos = numpy.arange(3 * n, dtype=numpy.float32).reshape(n, 3)
    fname = tmp_path / "rows_1e8.gsd"

    w = ShardedFrameWriter(str(fname))
    w.write_frame({"particles/position": pos}, step=0)
    w.close()

    with tpgsd.fl.open(name=fname, mode="r") as f:
        assert f.nframes == 1
        entry = f._find_chunk(0, "particles/position")
        assert int(entry["N"]) == n
        head = f.read_chunk(0, "particles/position", N=4, M=3, offset=0, r_all=True)
        tail = f.read_chunk(0, "particles/position", N=4, M=3, offset=n - 4, r_all=True)
        numpy.testing.assert_array_equal(head, pos[:4])
        numpy.testing.assert_array_equal(tail, pos[-4:])
    del pos
    gc.collect()
    fname.unlink()


def test_chunk_beyond_2gb_offset(tmp_path):
    """64-bit offset arithmetic: a chunk located past 2^31 reads back
    through every reader.  Uses a sparse file, so it runs instantly
    (the data-volume variants above are validate-gated)."""
    fname = tmp_path / "sparse_far.gsd"
    data = numpy.arange(1000, dtype=numpy.uint32)
    far = 3 * 2**30  # 3 GiB, past both 2^31 and uint32 range

    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none",
        schema_version=[1, 0],
    ) as f:
        f.write_chunk(name="near", data=data)
        f.end_frame()
        # relocate the append point far past 2^31 (sparse hole)
        f._fh.truncate(far)
        f._file_size = far
        f.write_chunk(name="far", data=data * 2)
        f.end_frame()

    import os

    assert os.path.getsize(fname) > far  # logical size is far + data

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode="r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert f.nframes == 2
            numpy.testing.assert_array_equal(f.read_chunk(0, "near"), data)
            numpy.testing.assert_array_equal(f.read_chunk(1, "far"), data * 2)
