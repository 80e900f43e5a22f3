"""Randomized round-trip fuzzing of the file layer.

Seeded random operation sequences (chunk sizes, dtypes, frame
boundaries, reopen/append cycles, buffered vs direct, shard splits) are
written through ``tpgsd.fl`` and verified through three independent
readers: ``tpgsd.fl``, ``tpgsd.pypgsd``, and - when present - the
upstream reference's own pure-Python reader.  Catches protocol drift
the targeted unit tests cannot anticipate.
"""

import importlib.util
import os
import pathlib

import numpy
import numpy.testing
import pytest

import tpgsd.fl
import tpgsd.pypgsd

_REF_READER = pathlib.Path("/root/reference/pgsd/pgsd/pypgsd.py")

_DTYPES = [
    numpy.uint8, numpy.uint16, numpy.uint32, numpy.uint64,
    numpy.int8, numpy.int16, numpy.int32, numpy.int64,
    numpy.float32, numpy.float64,
]


def _random_chunk(rng):
    dtype = _DTYPES[rng.randint(len(_DTYPES))]
    n = int(rng.randint(0, 2000))
    m = int(rng.randint(1, 6))
    if rng.rand() < 0.3:
        shape = (n,)
    else:
        shape = (n, m)
    info = numpy.iinfo(dtype) if numpy.issubdtype(dtype, numpy.integer) else None
    if info is not None:
        data = rng.randint(
            max(info.min, -(2**31)), min(info.max, 2**31 - 1), size=shape
        ).astype(dtype)
    else:
        data = (rng.rand(*shape) * 100).astype(dtype)
    return data


def _ref_reader():
    spec = importlib.util.spec_from_file_location("ref_pypgsd", _REF_READER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_roundtrip(tmp_path, seed):
    rng = numpy.random.RandomState(seed)
    fname = str(tmp_path / ("fuzz_%d.gsd" % seed))

    expected = []  # list of dict name -> array per frame
    n_sessions = int(rng.randint(1, 4))
    for session in range(n_sessions):
        mode = "w" if session == 0 else "a"
        with tpgsd.fl.open(
            fname, mode, application="fuzz", schema="none",
            schema_version=[1, 0],
        ) as f:
            if rng.rand() < 0.5:
                f.maximum_write_buffer_size = int(rng.randint(1, 64)) * 1024
            for _ in range(int(rng.randint(1, 6))):
                frame = {}
                for _ in range(int(rng.randint(1, 8))):
                    name = "c%02d/%s" % (rng.randint(12), "ab"[rng.randint(2)])
                    if name in frame:
                        # duplicate names within a frame are undefined
                        # (two index entries with the same (frame, id))
                        continue
                    data = _random_chunk(rng)
                    write_all = bool(rng.rand() < 0.5)
                    f.write_chunk(name, data, write_all=write_all)
                    frame[name] = data
                f.end_frame()
                expected.append(frame)

    # three independent readers must agree bit-for-bit: tpgsd's two,
    # plus the VENDORED copy of the reference's own pure-Python reader
    # (tests/oracle/vendored_pypgsd.py - hermetic, never skipped), plus
    # the live reference checkout when present
    from tests.oracle import vendored_pypgsd

    readers = [
        lambda: tpgsd.fl.open(fname, "r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(fname, "rb")),
        lambda: vendored_pypgsd.PGSDFile(open(fname, "rb")),
    ]
    if _REF_READER.exists():
        ref = _ref_reader()
        readers.append(lambda: ref.PGSDFile(open(fname, "rb")))

    for opener in readers:
        with opener() as f:
            assert f.nframes == len(expected)
            for idx, frame in enumerate(expected):
                for name, data in frame.items():
                    got = f.read_chunk(idx, name)
                    # readers return M == 1 chunks as 1-D
                    if data.ndim == 1 or data.shape[1] == 1:
                        want = data.reshape(-1)
                    else:
                        want = data
                    if want.size == 0:
                        assert got.size == 0
                        continue
                    numpy.testing.assert_array_equal(
                        got, want, err_msg="frame %d chunk %s" % (idx, name)
                    )
                # chunks never written in this frame don't appear
                assert not f.chunk_exists(idx, "never/written")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_spill_scanner_never_crashes(tmp_path, seed):
    """The compose spill scanner must survive arbitrary garbage: random
    bytes, truncated real records, corrupted headers - stopping cleanly
    at the first invalid point, never raising, never over-reading."""
    from tpgsd.parallel.compose_io import (
        _MAGIC,
        _REC,
        ComposedFrameWriter,
        _complete_through,
        _scan_spill,
        compose,
    )

    rng = numpy.random.RandomState(seed)
    path = str(tmp_path / "t.gsd")
    w = ComposedFrameWriter(path, application="t", keep_spills=True)
    pos0 = rng.rand(8, 3).astype(numpy.float32)
    w.write_frame({"particles/position": pos0}, step=0)
    spill = w._spill_paths[0]
    mode = seed % 4
    if mode == 0:
        # garbage appended AFTER a clean close: the END marker protects
        # every written frame, so recovery must yield the full frame
        w.close()
        os.unlink(path)
    else:
        w.flush()
        w._fh.close()
        w._closed = True  # crashed writer: no END marker

    good = open(spill, "rb").read()
    if mode == 0:
        tail = rng.bytes(rng.randint(1, 200))
    elif mode == 1:
        # plausible header with absurd sizes, truncated payload
        tail = _REC.pack(
            _MAGIC, rng.randint(0, 1 << 16), 1, 0,
            rng.randint(0, 1 << 40), rng.randint(0, 1 << 20),
            rng.randint(0, 255), 0, 0,
        ) + rng.bytes(16)
    elif mode == 2:
        # truncate a valid record mid-payload
        tail = b""
        good = good[: max(_REC.size + 1, len(good) - rng.randint(1, 60))]
    else:
        # valid header, in-bounds payload, but non-UTF-8 name bytes
        tail = _REC.pack(_MAGIC, 2, 1, 0, 1, 1, 9, 0, 0) + b"\xff\xfe" + b"\0" * 4
    with open(spill, "wb") as fh:
        fh.write(good + tail)

    # scanning and horizon derivation never raise
    list(_scan_spill(spill))
    assert isinstance(_complete_through(spill), int)
    # compose of the damaged spill yields a valid (possibly empty) file
    n = compose(path, [spill], application="t")
    if mode == 0:
        assert n == 1  # clean close: frame survives the trailing garbage
    else:
        assert n == 0  # crashed writer: last started frame distrusted
    if n:
        import tpgsd.pypgsd

        with tpgsd.pypgsd.PGSDFile(open(path, "rb")) as f:
            assert f.nframes == n
            numpy.testing.assert_array_equal(
                f.read_chunk(0, "particles/position"), pos0
            )
