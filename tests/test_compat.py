"""Bit-compatibility tests against independent anchors.

Self-contained tier (always runs, no external checkout needed):

* ``fixtures/golden_v1.gsd`` — the upstream project's own checked-in v1
  binary fixture, vendored unchanged (reference:
  pgsd/pgsd/test/test_gsd_v1.gsd, exercised by test_fl.py:613-860).
  Written by upstream GSD 1.x, so reading it proves tpgsd consumes real
  v1 files produced by an independent implementation.
* ``fixtures/golden_v2.gsd`` — a deterministic v2 file written by tpgsd
  and byte-verified ONCE against the reference's own pure-Python reader
  at generation time (see fixtures/make_golden_v2.py provenance note);
  expected contents pinned in ``golden_v2_expected.npz``.
* a v1 file synthesized directly from the byte-layout spec
  (pgsd/doc/pgsd.tex:341-606).

Bonus tier (skipped when the reference checkout is absent): live
cross-reads with the reference's reader from /root/reference.
"""

import pathlib
import random
import shutil
import struct

import numpy
import numpy.testing
import pytest

import tpgsd.fl
import tpgsd.pypgsd

_REF = pathlib.Path("/root/reference/pgsd/pgsd")
_FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"
_V1_FIXTURE = _FIXTURES / "golden_v1.gsd"
_V2_FIXTURE = _FIXTURES / "golden_v2.gsd"
_V2_EXPECTED = _FIXTURES / "golden_v2_expected.npz"


def _make_v1_file(path, chunks_per_frame, nframes=2):
    """Synthesize a GSD v1 file directly from the spec byte layout.

    v1: 64-byte fixed name slots; index sorted by frame only (entries in
    insertion order within a frame).
    """
    names = sorted({name for name, _ in chunks_per_frame[0]})
    name_ids = {n: i for i, n in enumerate(names)}
    namelist_entries = 16
    index_entries = 128

    header = struct.pack(
        "QQQQQII64s64s80s",
        0x65DF65DF65DF65DF,
        256,
        index_entries,
        256 + index_entries * 32,
        namelist_entries,
        (1 << 16) | 2,
        (1 << 16) | 0,  # v1.0
        b"synthetic",
        b"none",
        b"\x00" * 80,
    )
    namelist = b"".join(
        n.encode().ljust(64, b"\x00") for n in names
    ) + b"\x00" * 64 * (namelist_entries - len(names))

    data_start = 256 + index_entries * 32 + namelist_entries * 64
    blob = b""
    index = []
    for frame in range(nframes):
        for name, arr in chunks_per_frame[frame]:
            location = data_start + len(blob)
            blob += arr.tobytes()
            n = arr.shape[0]
            m = arr.shape[1] if arr.ndim == 2 else 1
            tcode = {numpy.dtype("int32"): 7, numpy.dtype("float32"): 9}[arr.dtype]
            index.append(
                struct.pack("QQqIHBB", frame, n, location, m, name_ids[name], tcode, 0)
            )
    index_block = b"".join(index) + b"\x00" * 32 * (index_entries - len(index))
    path.write_bytes(header + index_block + namelist + blob)


def test_read_synthetic_v1(tmp_path):
    """tpgsd readers consume spec-conformant v1 files."""
    rng = numpy.random.RandomState(7)
    frames = []
    for _ in range(2):
        frames.append(
            [
                ("zz_last", rng.randint(0, 100, size=(5,)).astype(numpy.int32)),
                ("aa_first", rng.rand(4, 3).astype(numpy.float32)),
            ]
        )
    fname = tmp_path / "synthetic_v1.gsd"
    _make_v1_file(fname, frames)

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode="r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert f.pgsd_version == (1, 0)
            assert f.nframes == 2
            for frame in range(2):
                for name, arr in frames[frame]:
                    numpy.testing.assert_array_equal(
                        f.read_chunk(frame, name), arr.squeeze() if arr.ndim == 1 else arr
                    )
            assert sorted(f.find_matching_chunk_names("")) == ["aa_first", "zz_last"]


def test_append_to_v1_writes_v1_names(tmp_path):
    """Appending to a v1 file keeps the v1 fixed-slot namelist readable."""
    frames = [[("c0", numpy.arange(3, dtype=numpy.int32))]] * 1
    fname = tmp_path / "v1_append.gsd"
    _make_v1_file(fname, frames, nframes=1)

    long_name = "x" * 100  # must truncate to 63 in v1
    with tpgsd.fl.open(name=fname, mode="r+") as f:
        f.write_chunk(name=long_name, data=numpy.arange(4, dtype=numpy.int32))
        f.end_frame()

    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        assert f.nframes == 2
        names = f.find_matching_chunk_names("x")
        assert names == ["x" * 63]
        numpy.testing.assert_array_equal(
            f.read_chunk(1, "x" * 63), numpy.arange(4, dtype=numpy.int32)
        )


def test_upstream_golden_v1_fixture():
    """Read the vendored upstream golden v1 file (reference: test_fl.py:613-651)."""
    values = list(range(127))
    values_str = sorted(str(v) for v in values)

    def check(f):
        assert f.pgsd_version == (1, 0)
        for frame in range(5):
            random.shuffle(values)
            for value in values:
                expected = numpy.array([value * 13], dtype=numpy.int32)
                numpy.testing.assert_array_equal(
                    expected, f.read_chunk(frame=frame, name=str(value))
                )
        assert sorted(f.find_matching_chunk_names("")) == values_str

    with tpgsd.fl.open(name=_V1_FIXTURE, mode="r") as f:
        check(f)
    with tpgsd.pypgsd.PGSDFile(open(str(_V1_FIXTURE), "rb")) as f:
        check(f)


def _load_v2_expected():
    """Return {frame: {name: array}} from the pinned expected-values archive."""
    frames = {}
    with numpy.load(_V2_EXPECTED) as z:
        for key in z.files:
            fpart, name = key.split("|", 1)
            frames.setdefault(int(fpart[1:]), {})[name] = z[key]
    return frames


def test_golden_v2_fixture():
    """Both tpgsd readers reproduce the blessed v2 fixture chunk-for-chunk.

    The fixture was byte-verified once against the reference's own reader
    at generation time (fixtures/make_golden_v2.py), so agreement here is
    transitive agreement with the reference — without needing the
    reference checkout at test time.
    """
    expected = _load_v2_expected()
    for opener in (
        lambda: tpgsd.fl.open(name=_V2_FIXTURE, mode="r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(_V2_FIXTURE), "rb")),
    ):
        with opener() as f:
            assert f.pgsd_version == (2, 0)
            assert f.nframes == len(expected)
            for frame, chunks in expected.items():
                for name, arr in chunks.items():
                    got = f.read_chunk(frame, name)
                    numpy.testing.assert_array_equal(got.reshape(arr.shape), arr)
                    assert got.dtype == arr.dtype
            # frame 0 carried 70 extra names: the fixture pins namelist
            # growth + relocation behavior.
            assert len(f.find_matching_chunk_names("extra/")) == 70


def test_golden_v2_fixture_verify_clean():
    """The fsck walk passes on the blessed fixture."""
    with open(str(_V2_FIXTURE), "rb") as fobj:
        report = tpgsd.pypgsd.verify(fobj, deep=True)
    assert report["ok"], report["errors"]


def test_append_to_golden_v2(tmp_path):
    """Appending to the blessed fixture preserves every existing chunk."""
    work = tmp_path / "golden_v2_append.gsd"
    shutil.copy(_V2_FIXTURE, work)
    expected = _load_v2_expected()

    new = numpy.arange(12, dtype=numpy.float64).reshape(4, 3)
    with tpgsd.fl.open(name=work, mode="r+") as f:
        f.write_chunk(name="appended/after_bless", data=new)
        f.end_frame()

    with tpgsd.pypgsd.PGSDFile(open(str(work), "rb")) as f:
        assert f.nframes == len(expected) + 1
        for frame, chunks in expected.items():
            for name, arr in chunks.items():
                numpy.testing.assert_array_equal(
                    f.read_chunk(frame, name).reshape(arr.shape), arr
                )
        numpy.testing.assert_array_equal(
            f.read_chunk(len(expected), "appended/after_bless"), new
        )


@pytest.mark.skipif(
    not (_REF / "pypgsd.py").exists(), reason="upstream reference not present"
)
def test_upstream_reader_consumes_tpgsd_output(tmp_path):
    """Files tpgsd writes are readable by the reference's own pure-Python reader."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_pypgsd", _REF / "pypgsd.py")
    ref_pypgsd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_pypgsd)

    fname = tmp_path / "ours_for_upstream.gsd"
    rng = numpy.random.RandomState(3)
    payload = {
        "particles/position": rng.rand(50, 3).astype(numpy.float32),
        "particles/typeid": rng.randint(0, 4, size=50).astype(numpy.uint32),
        "log/energy": numpy.array([1.25], dtype=numpy.float64),
    }
    with tpgsd.fl.open(
        name=fname, mode="w", application="tpgsd", schema="hoomd",
        schema_version=[1, 4],
    ) as f:
        for nframe in range(3):
            for name, arr in payload.items():
                f.write_chunk(name=name, data=arr + nframe)
            f.end_frame()

    with ref_pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        assert f.nframes == 3
        assert f.schema == "hoomd"
        assert f.pgsd_version == (2, 0)
        for nframe in range(3):
            for name, arr in payload.items():
                got = f.read_chunk(frame=nframe, name=name)
                numpy.testing.assert_array_equal(got, (arr + nframe).squeeze())


def test_vendored_oracle_consumes_tpgsd_output(tmp_path):
    """Hermetic third oracle: the VENDORED copy of the reference's own
    pure-Python reader (tests/oracle/vendored_pypgsd.py, upstream GSD
    3.2.0's spec reader - the one the reference's test suite itself
    relies on, reference: pgsd/pgsd/test/test_fl.py:6-7) must parse
    tpgsd-written v2 files bit-for-bit.  Unlike
    ``test_upstream_reader_consumes_tpgsd_output`` this never skips:
    the oracle ships with the tests."""
    from tests.oracle import vendored_pypgsd

    fname = tmp_path / "ours_for_vendored.gsd"
    rng = numpy.random.RandomState(9)
    payload = {
        "particles/position": rng.rand(40, 3).astype(numpy.float32),
        "particles/typeid": rng.randint(0, 4, size=40).astype(numpy.uint32),
        "log/energy": numpy.array([2.5], dtype=numpy.float64),
    }
    with tpgsd.fl.open(
        name=fname, mode="w", application="tpgsd", schema="hoomd",
        schema_version=[1, 4],
    ) as f:
        for nframe in range(3):
            for name, arr in payload.items():
                f.write_chunk(name=name, data=arr + nframe)
            f.end_frame()

    with vendored_pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        assert f.nframes == 3
        assert f.schema == "hoomd"
        assert f.pgsd_version == (2, 0)
        for nframe in range(3):
            for name, arr in payload.items():
                got = f.read_chunk(frame=nframe, name=name)
                numpy.testing.assert_array_equal(got, (arr + nframe).squeeze())


def test_vendored_oracle_reads_golden_fixtures():
    """The vendored oracle agrees with tpgsd's readers on the golden
    binary fixtures (v1 and v2), pinning all three implementations to
    the same on-disk bytes."""
    from tests.oracle import vendored_pypgsd

    for fixture in (_V1_FIXTURE, _V2_FIXTURE):
        with tpgsd.fl.open(name=fixture, mode="r") as ours, \
                vendored_pypgsd.PGSDFile(open(str(fixture), "rb")) as oracle:
            assert oracle.nframes == ours.nframes
            for frame in range(ours.nframes):
                for name in ours.find_matching_chunk_names(""):
                    if not ours.chunk_exists(frame, name):
                        continue
                    numpy.testing.assert_array_equal(
                        oracle.read_chunk(frame=frame, name=name),
                        ours.read_chunk(frame, name),
                        err_msg="frame %d chunk %s of %s"
                        % (frame, name, fixture),
                    )
