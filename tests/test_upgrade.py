"""v1 -> v2 in-place upgrade tests (capability the reference disables;
reference: pgsd/pgsd/pgsd.h:675)."""

import numpy
import numpy.testing

import tpgsd.fl
import tpgsd.pypgsd
from tests.test_compat import _make_v1_file


def test_upgrade_v1_to_v2(tmp_path):
    rng = numpy.random.RandomState(5)
    frames = [
        [
            ("zz", rng.randint(0, 9, size=(4,)).astype(numpy.int32)),
            ("aa", rng.rand(3, 2).astype(numpy.float32)),
        ]
        for _ in range(3)
    ]
    fname = tmp_path / "up.gsd"
    _make_v1_file(fname, frames, nframes=3)

    with tpgsd.fl.open(fname, "r+") as f:
        assert f.pgsd_version == (1, 0)
        f.upgrade()
        assert f.pgsd_version == (2, 0)
        # still readable through the same handle
        for i in range(3):
            for name, arr in frames[i]:
                numpy.testing.assert_array_equal(
                    f.read_chunk(i, name),
                    arr.squeeze() if arr.ndim == 1 else arr,
                )

    # fresh readers parse the upgraded file as v2
    for opener in (
        lambda: tpgsd.fl.open(fname, "r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert f.pgsd_version == (2, 0)
            assert f.nframes == 3
            assert sorted(f.find_matching_chunk_names("")) == ["aa", "zz"]
            for i in range(3):
                for name, arr in frames[i]:
                    numpy.testing.assert_array_equal(
                        f.read_chunk(i, name),
                        arr.squeeze() if arr.ndim == 1 else arr,
                    )


def test_upgrade_then_append_uses_v2_names(tmp_path):
    frames = [[("c", numpy.arange(2, dtype=numpy.int32))]]
    fname = tmp_path / "up2.gsd"
    _make_v1_file(fname, frames, nframes=1)

    long_name = "n" * 100
    with tpgsd.fl.open(fname, "r+") as f:
        f.upgrade()
        f.write_chunk(long_name, numpy.arange(3, dtype=numpy.int32))
        f.end_frame()

    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        # v2 names are not truncated to 63 chars
        assert f.find_matching_chunk_names("n") == [long_name]
        numpy.testing.assert_array_equal(
            f.read_chunk(1, long_name), numpy.arange(3, dtype=numpy.int32)
        )


def test_upgrade_v2_noop(tmp_path):
    fname = tmp_path / "v2.gsd"
    with tpgsd.fl.open(
        fname, "w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        f.write_chunk("x", numpy.arange(2, dtype=numpy.int32))
        f.end_frame()
        f.upgrade()
        assert f.pgsd_version == (2, 0)


def test_upgrade_crash_before_header_leaves_v1_intact(tmp_path):
    """upgrade() is copy-on-write: new namelist/index blocks land at EOF
    and the single final header write flips version + locations.  A
    crash at any point before that header write must leave a fully
    readable v1 file (regression: the namelist used to be rewritten in
    place under the v1 header)."""
    rng = numpy.random.RandomState(7)
    frames = [
        [("k%d" % j, rng.rand(4).astype(numpy.float32)) for j in range(3)]
        for _ in range(2)
    ]
    fname = tmp_path / "crash.gsd"
    _make_v1_file(fname, frames, nframes=2)

    class Boom(RuntimeError):
        pass

    with tpgsd.fl.open(fname, "r+") as f:
        real_pwrite = f._fh.pwrite

        def crashing_pwrite(offset, data):
            if offset == 0:  # the final header write
                raise Boom()
            return real_pwrite(offset, data)

        f._fh.pwrite = crashing_pwrite
        try:
            f.upgrade()
        except Boom:
            pass
        f._fh.pwrite = real_pwrite
        f._is_open = False  # skip close-time flush over the patched state
        f._fh.close()

    # the interrupted upgrade must leave an intact v1 file
    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        assert f.pgsd_version == (1, 0)
        assert f.nframes == 2
        for i in range(2):
            for name, arr in frames[i]:
                numpy.testing.assert_array_equal(f.read_chunk(i, name), arr)

    # and a second, uninterrupted upgrade completes normally
    with tpgsd.fl.open(fname, "r+") as f:
        f.upgrade()
    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        assert f.pgsd_version == (2, 0)
        for i in range(2):
            for name, arr in frames[i]:
                numpy.testing.assert_array_equal(f.read_chunk(i, name), arr)
