"""File-layer tests.

Behavioral port of the reference test matrix (reference:
pgsd/pgsd/test/test_fl.py) to the tpgsd API, using the pure-Python reader
as the independent verification backend for every write test.
"""

import io
import pathlib
import pickle
import random

import numpy
import numpy.testing
import pytest

import tpgsd.fl
import tpgsd.pypgsd


def test_create(tmp_path):
    with tpgsd.fl.open(
        name=tmp_path / "test_create.gsd",
        mode="w",
        application="test_create",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        assert f.mode == "w"


@pytest.mark.parametrize(
    "typ",
    [
        numpy.uint8,
        numpy.uint16,
        numpy.uint32,
        numpy.uint64,
        numpy.int8,
        numpy.int16,
        numpy.int32,
        numpy.int64,
        numpy.float32,
        numpy.float64,
    ],
)
def test_dtype_roundtrip(tmp_path, typ, open_mode):
    """All 10 scalar dtypes round-trip, 1-D and 2-D, including zero rows."""
    data1d = numpy.array([1, 2, 3, 4, 5, 127], dtype=typ)
    data2d = numpy.array([[10, 20], [30, 40], [50, 127]], dtype=typ)
    data_zero = numpy.array([], dtype=typ)

    fname = tmp_path / "test_dtype.gsd"
    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test_dtype",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        f.write_chunk(name="data1d", data=data1d)
        f.write_chunk(name="data2d", data=data2d)
        f.write_chunk(name="zero", data=data_zero)
        f.end_frame()

    with tpgsd.fl.open(name=fname, mode=open_mode.read) as f:
        read1d = f.read_chunk(frame=0, name="data1d")
        read2d = f.read_chunk(frame=0, name="data2d")
        zero = f.read_chunk(frame=0, name="zero")
        assert read1d.dtype == typ
        numpy.testing.assert_array_equal(read1d, data1d)
        numpy.testing.assert_array_equal(read2d, data2d)
        assert zero.shape == (0,)
        assert zero.dtype == typ

    # independent verification with the pure-Python reader
    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        numpy.testing.assert_array_equal(f.read_chunk(frame=0, name="data1d"), data1d)
        numpy.testing.assert_array_equal(f.read_chunk(frame=0, name="data2d"), data2d)


def test_metadata(tmp_path, open_mode):
    fname = tmp_path / "test_metadata.gsd"
    data = numpy.array([1, 2, 3, 4, 5, 10012], dtype=numpy.int64)

    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test_metadata",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        assert f.mode == open_mode.write
        for i in range(150):
            f.write_chunk(name="data", data=data)
            f.end_frame()

    with tpgsd.fl.open(name=fname, mode=open_mode.read) as f:
        assert f.name == str(fname)
        assert f.mode == open_mode.read
        assert f.application == "test_metadata"
        assert f.schema == "none"
        assert f.schema_version == (1, 2)
        assert f.pgsd_version == (2, 0)
        assert f.nframes == 150
        assert f.nnames == 1

    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        assert f.name == str(fname)
        assert f.mode == "r"
        assert f.application == "test_metadata"
        assert f.schema == "none"
        assert f.schema_version == (1, 2)
        assert f.pgsd_version == (2, 0)
        assert f.nframes == 150
        assert f.nnames == 1


def test_append(tmp_path, open_mode):
    """Chunks append to existing files across reopen."""
    fname = tmp_path / "test_append.gsd"
    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test_append",
        schema="none",
        schema_version=[1, 2],
    ):
        pass

    data = numpy.array([10], dtype=numpy.int64)
    nframes = 257

    with tpgsd.fl.open(name=fname, mode="a") as f:
        assert f.mode == "a"
        for i in range(nframes):
            data[0] = i
            f.write_chunk(name="data1", data=data)
            data[0] = i * 10
            f.write_chunk(name="data10", data=data)
            f.end_frame()

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode=open_mode.read),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert f.nframes == nframes
            for i in range(nframes):
                assert f.read_chunk(frame=i, name="data1")[0] == i
                assert f.read_chunk(frame=i, name="data10")[0] == i * 10


def test_chunk_exists(tmp_path, open_mode):
    fname = tmp_path / "test_chunk_exists.gsd"
    data = numpy.array([1, 2, 3, 4, 5, 10012], dtype=numpy.int64)
    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        f.write_chunk(name="chunk1", data=data)
        f.end_frame()
        f.write_chunk(name="abcdefg", data=data)
        f.end_frame()
        f.write_chunk(name="test", data=data)
        f.end_frame()

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode=open_mode.read),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert f.chunk_exists(frame=0, name="chunk1")
            assert f.chunk_exists(frame=1, name="abcdefg")
            assert f.chunk_exists(frame=2, name="test")

            assert not f.chunk_exists(frame=1, name="chunk1")
            assert not f.chunk_exists(frame=2, name="abcdefg")
            assert not f.chunk_exists(frame=0, name="test")

            assert not f.chunk_exists(frame=2, name="chunk1")
            assert not f.chunk_exists(frame=0, name="abcdefg")
            assert not f.chunk_exists(frame=1, name="test")

            assert not f.chunk_exists(frame=10, name="chunk1")
            assert not f.chunk_exists(frame=0, name="nonexistent")


def test_readonly_errors(tmp_path, open_mode):
    fname = tmp_path / "test_readonly_errors.gsd"
    data = numpy.array([1, 2, 3, 4, 5, 10012], dtype=numpy.int64)
    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        for _ in range(10):
            f.write_chunk(name="chunk1", data=data)
            f.end_frame()

    with tpgsd.fl.open(name=fname, mode="r") as f:
        with pytest.raises(Exception):
            f.end_frame()
        with pytest.raises(Exception):
            f.write_chunk(name="chunk1", data=data)

    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        with pytest.raises(Exception):
            f.end_frame()
        with pytest.raises(Exception):
            f.write_chunk(name="chunk1", data=data)


def test_dtype_errors(tmp_path, open_mode):
    fname = tmp_path / "test_dtype_errors.gsd"
    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        with pytest.raises(Exception):
            f.write_chunk(
                name="chunk1", data=numpy.array([1, 2, 3], dtype=numpy.complex128)
            )
        with pytest.raises(Exception):
            f.write_chunk(
                name="chunk3",
                data=numpy.zeros([2, 2, 2], dtype=numpy.float32),
            )


def test_namelen(tmp_path, open_mode):
    """application/schema truncate at 63 chars; v2 chunk names do not."""
    app_long = "abcdefga" * 100
    schema_long = "ijklmnop" * 100
    chunk_long = "12345678" * 100
    fname = tmp_path / "test_namelen.gsd"
    data = numpy.array([1, 2, 3, 4, 5, 10012], dtype=numpy.int64)

    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application=app_long,
        schema=schema_long,
        schema_version=[1, 2],
    ) as f:
        assert f.application == app_long[0:63]
        assert f.schema == schema_long[0:63]
        f.write_chunk(name=chunk_long, data=data)
        f.end_frame()

    with tpgsd.fl.open(name=fname, mode=open_mode.read) as f:
        numpy.testing.assert_array_equal(f.read_chunk(0, name=chunk_long), data)

    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        numpy.testing.assert_array_equal(f.read_chunk(0, name=chunk_long), data)


def test_open_modes(tmp_path):
    """All open modes behave as documented."""
    fname = tmp_path / "test_modes.gsd"
    data = numpy.array([1, 2, 3], dtype=numpy.float32)

    # x: exclusive create
    with tpgsd.fl.open(
        name=fname, mode="x", application="a", schema="s", schema_version=[1, 0]
    ) as f:
        f.write_chunk(name="c", data=data)
        f.end_frame()
    with pytest.raises(FileExistsError):
        tpgsd.fl.open(
            name=fname, mode="x", application="a", schema="s", schema_version=[1, 0]
        )

    # r: read existing
    with tpgsd.fl.open(name=fname, mode="r") as f:
        assert f.nframes == 1
        with pytest.raises(Exception):
            f.write_chunk(name="c", data=data)

    # r on nonexistent raises
    with pytest.raises(OSError):
        tpgsd.fl.open(name=tmp_path / "nope.gsd", mode="r")

    # r+: read-write existing
    with tpgsd.fl.open(name=fname, mode="r+") as f:
        f.write_chunk(name="c", data=data)
        f.end_frame()
        assert f.nframes == 2

    # w: overwrite
    with tpgsd.fl.open(
        name=fname, mode="w", application="a", schema="s", schema_version=[1, 0]
    ) as f:
        assert f.nframes == 0

    # a: append, creating if missing
    fname2 = tmp_path / "test_modes_a.gsd"
    with tpgsd.fl.open(
        name=fname2, mode="a", application="a", schema="s", schema_version=[1, 0]
    ) as f:
        f.write_chunk(name="c", data=data)
        f.end_frame()
    with tpgsd.fl.open(name=fname2, mode="a") as f:
        f.write_chunk(name="c", data=data)
        f.end_frame()
        assert f.nframes == 2


def test_find_matching_chunk_names(tmp_path, open_mode):
    fname = tmp_path / "test_find_matching.gsd"
    data = numpy.array([1, 2, 3], dtype=numpy.float32)
    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        f.write_chunk(name="log/A", data=data)
        f.write_chunk(name="log/chunk2", data=data)
        f.end_frame()
        f.write_chunk(name="data/B", data=data)
        f.end_frame()

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode=open_mode.read),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert sorted(f.find_matching_chunk_names("log/")) == [
                "log/A",
                "log/chunk2",
            ]
            assert f.find_matching_chunk_names("data/") == ["data/B"]
            assert sorted(f.find_matching_chunk_names("")) == [
                "data/B",
                "log/A",
                "log/chunk2",
            ]
            assert f.find_matching_chunk_names("notthere") == []


def test_many_names(tmp_path, open_mode):
    """1000 shuffled names x 5 frames round-trip (forces namelist + index growth)."""
    fname = tmp_path / "test_many_names.gsd"
    values = {}
    rng = random.Random(13)

    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        for frame in range(5):
            names = ["data/" + str(i) for i in range(1000)]
            rng.shuffle(names)
            for name in names:
                value = rng.random()
                values[(frame, name)] = value
                f.write_chunk(
                    name=name, data=numpy.array([value], dtype=numpy.float64)
                )
            f.end_frame()

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode=open_mode.read),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert f.nframes == 5
            assert f.nnames == 1000
            for (frame, name), value in values.items():
                assert f.read_chunk(frame=frame, name=name)[0] == value


def test_namelist_full(tmp_path):
    """At most 65535 unique names fit (ids are uint16).

    Drives all 65,535 names through the real write_chunk/_append_name
    path, with periodic end_frame flushes so the namelist grows and
    relocates at scale (reference: test_fl.py:558-571 exercises the
    limit; pgsd.c:1284-1301 the relocation).
    """
    fname = tmp_path / "test_namelist_full.gsd"
    data = numpy.array([1], dtype=numpy.uint8)
    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        for i in range(65535):
            f.write_chunk(name="n%05d" % i, data=data)
            # flush every 16k names: forces several namelist
            # grow-and-relocate cycles through the committed path
            if i % 16384 == 16383:
                f.end_frame()
                f.flush()
        with pytest.raises(RuntimeError):
            f.write_chunk(name="one_too_many", data=data)
        f.end_frame()

    # reopen with both readers: all 65,535 names survived relocation.
    # Names land in the frame whose flush committed them: 16,384 per frame.
    with tpgsd.fl.open(name=fname, mode="r") as f:
        assert f.nnames == 65535
        for i in (0, 1, 16383, 16384, 40000, 65534):
            assert f.chunk_exists(frame=i // 16384, name="n%05d" % i)
    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        assert f.nnames == 65535
        numpy.testing.assert_array_equal(f.read_chunk(3, "n65534"), data)

    # appending to the full file still refuses a 65,536th name
    with tpgsd.fl.open(name=fname, mode="r+") as f:
        with pytest.raises(RuntimeError):
            f.write_chunk(name="one_too_many", data=data)


def test_zero_size_chunks(tmp_path, open_mode):
    fname = tmp_path / "test_zero.gsd"
    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        f.write_chunk(name="empty", data=numpy.array([], dtype=numpy.float32))
        f.end_frame()

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode=open_mode.read),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert f.chunk_exists(frame=0, name="empty")
            d = f.read_chunk(frame=0, name="empty")
            assert d.shape == (0,)
            assert d.dtype == numpy.float32


def test_utf8_filenames(tmp_path, open_mode):
    fname = tmp_path / "tëst_ütf8_😀.gsd"
    data = numpy.array([1, 2, 3], dtype=numpy.float32)
    with tpgsd.fl.open(
        name=fname,
        mode=open_mode.write,
        application="test",
        schema="none",
        schema_version=[1, 2],
    ) as f:
        f.write_chunk(name="dät/ä", data=data)
        f.end_frame()

    with tpgsd.fl.open(name=fname, mode=open_mode.read) as f:
        numpy.testing.assert_array_equal(f.read_chunk(0, "dät/ä"), data)


def test_read_after_write_same_handle(tmp_path):
    """Chunks of completed frames are readable on the writing handle."""
    fname = tmp_path / "test_raw.gsd"
    data = numpy.array([7, 8, 9], dtype=numpy.int32)
    for mode in ("w", "x", "a", "r+"):
        target = tmp_path / ("raw_" + mode.replace("+", "p") + ".gsd")
        if mode == "r+":
            with tpgsd.fl.open(
                name=target, mode="w", application="t", schema="none",
                schema_version=[1, 0],
            ):
                pass
        with tpgsd.fl.open(
            name=target,
            mode=mode,
            application="t",
            schema="none",
            schema_version=[1, 0],
        ) as f:
            f.write_chunk(name="d", data=data)
            f.end_frame()
            assert f.chunk_exists(frame=0, name="d")
            numpy.testing.assert_array_equal(f.read_chunk(0, "d"), data)


def test_buffered_small_chunks(tmp_path):
    """write_all=False small chunks take the buffered path and still read back."""
    fname = tmp_path / "test_buffered.gsd"
    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        for i in range(100):
            f.write_chunk(
                name="small",
                data=numpy.array([i], dtype=numpy.uint32),
                write_all=False,
            )
            f.write_chunk(
                name="big",
                data=numpy.arange(i, i + 64, dtype=numpy.float64),
                write_all=True,
            )
            f.end_frame()
        # buffered chunk of a completed frame is findable on the write handle
        assert f.chunk_exists(frame=7, name="small")
        assert f.read_chunk(7, "small")[0] == 7

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode="r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert f.nframes == 100
            for i in range(100):
                assert f.read_chunk(i, "small")[0] == i
                numpy.testing.assert_array_equal(
                    f.read_chunk(i, "big"),
                    numpy.arange(i, i + 64, dtype=numpy.float64),
                )


def test_tuning_properties(tmp_path):
    fname = tmp_path / "test_tuning.gsd"
    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        assert f.maximum_write_buffer_size == 64 * 1024 * 1024
        assert f.index_entries_to_buffer == 256 * 1024
        f.maximum_write_buffer_size = 1024
        f.index_entries_to_buffer = 8
        assert f.maximum_write_buffer_size == 1024
        assert f.index_entries_to_buffer == 8
        with pytest.raises(ValueError):
            f.maximum_write_buffer_size = 0
        with pytest.raises(ValueError):
            f.index_entries_to_buffer = -1


def test_pickle_readonly(tmp_path):
    fname = tmp_path / "test_pickle.gsd"
    data = numpy.array([1, 2, 3], dtype=numpy.float32)
    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        f.write_chunk(name="d", data=data)
        f.end_frame()
        with pytest.raises(Exception):
            pickle.dumps(f)

    with tpgsd.fl.open(name=fname, mode="r") as f:
        f2 = pickle.loads(pickle.dumps(f))
        numpy.testing.assert_array_equal(f2.read_chunk(0, "d"), data)
        f2.close()

    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        f2 = pickle.loads(pickle.dumps(f))
        numpy.testing.assert_array_equal(f2.read_chunk(0, "d"), data)
        f2.close()


def test_pypgsd_in_memory(tmp_path):
    """The pure-Python reader accepts arbitrary file-like objects."""
    fname = tmp_path / "test_inmem.gsd"
    data = numpy.array([[1, 2], [3, 4]], dtype=numpy.float64)
    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        f.write_chunk(name="d", data=data)
        f.end_frame()

    raw = pathlib.Path(fname).read_bytes()
    buf = io.BytesIO(raw)
    buf.name = "in-memory"
    with tpgsd.pypgsd.PGSDFile(buf) as f:
        numpy.testing.assert_array_equal(f.read_chunk(0, "d"), data)


def test_not_a_gsd_file(tmp_path):
    fname = tmp_path / "junk.gsd"
    fname.write_bytes(b"this is not a gsd file, not even 256 bytes? " * 40)
    with pytest.raises(RuntimeError):
        tpgsd.fl.open(name=fname, mode="r")
    with pytest.raises(RuntimeError):
        tpgsd.pypgsd.PGSDFile(open(str(fname), "rb"))


def test_truncated_file(tmp_path):
    """A file torn mid-frame is readable up to the last committed frame."""
    fname = tmp_path / "test_torn.gsd"
    data = numpy.arange(1024, dtype=numpy.float64)
    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        for _ in range(3):
            f.write_chunk(name="d", data=data)
            f.end_frame()

    # append data bytes for a 4th frame but never commit index entries:
    # readers must still see exactly 3 frames
    with open(fname, "ab") as raw:
        raw.write(data.tobytes())

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode="r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            assert f.nframes == 3
            numpy.testing.assert_array_equal(f.read_chunk(2, "d"), data)


def test_sharded_write_chunk(tmp_path):
    """The distributed write_chunk API: per-shard counts vector + rank."""
    fname = tmp_path / "test_sharded.gsd"
    counts = numpy.array([3, 2, 4], dtype=numpy.uint64)
    full = numpy.arange(9 * 2, dtype=numpy.float32).reshape(9, 2)
    splits = numpy.split(full, numpy.cumsum(counts)[:-1].astype(int))

    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        # emulate each rank's call in a single process
        for rank, shard in enumerate(splits):
            f._pending_index_entries = 0  # one logical chunk, not three
            if rank > 0:
                f._frame_index.pop()  # keep a single index entry
                f._file_size -= full.nbytes
            f.write_chunk(name="d", data=shard, offset=counts, rank=rank)
        f.end_frame()

    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        numpy.testing.assert_array_equal(f.read_chunk(0, "d"), full)


def test_write_chunk_shards(tmp_path):
    """Single-controller multi-shard write: one entry, batched pwrites."""
    fname = tmp_path / "test_shards.gsd"
    counts = [3, 2, 4]
    full = numpy.arange(9 * 3, dtype=numpy.float64).reshape(9, 3)
    offs = numpy.concatenate([[0], numpy.cumsum(counts)[:-1]]).astype(int)
    shards = [
        (int(o), full[o : o + c]) for o, c in zip(offs, counts)
    ]

    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        f.write_chunk_shards("d", shards, M=3, type_code=10)
        f.end_frame()

    for opener in (
        lambda: tpgsd.fl.open(name=fname, mode="r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")),
    ):
        with opener() as f:
            numpy.testing.assert_array_equal(f.read_chunk(0, "d"), full)


def test_read_chunk_stripe(tmp_path):
    """r_all=True reads just one shard's row stripe."""
    fname = tmp_path / "test_stripe.gsd"
    full = numpy.arange(10 * 3, dtype=numpy.float32).reshape(10, 3)
    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        f.write_chunk(name="d", data=full)
        f.end_frame()

    with tpgsd.fl.open(name=fname, mode="r") as f:
        stripe = f.read_chunk(0, "d", N=4, M=3, offset=5, r_all=True)
        numpy.testing.assert_array_equal(stripe, full[5:9])


@pytest.mark.validate
def test_largefile(tmp_path):
    """>2 GB chunk support (reference: pgsd/pgsd/test/test_largefile.py)."""
    fname = tmp_path / "test_large.gsd"
    for n in (2**27, 2**28 + 1):
        data = numpy.arange(n, dtype=numpy.uint32)
        with tpgsd.fl.open(
            name=fname, mode="w", application="t", schema="none",
            schema_version=[1, 0],
        ) as f:
            f.write_chunk(name="d", data=data)
            f.end_frame()
        with tpgsd.fl.open(name=fname, mode="r") as f:
            out = f.read_chunk(0, "d")
            assert out[-1] == n - 1
            assert out.shape == (n,)
        del data


def test_durable_mode(tmp_path):
    """durable=True inserts fsync barriers at flush; file stays valid."""
    fname = tmp_path / "durable.gsd"
    with tpgsd.fl.open(
        fname, "w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        assert f.durable is False
        f.durable = True
        for i in range(3):
            f.write_chunk("d", numpy.full(100, i, numpy.int32))
            f.end_frame()
    with tpgsd.pypgsd.PGSDFile(open(str(fname), "rb")) as f:
        assert f.nframes == 3
        numpy.testing.assert_array_equal(
            f.read_chunk(2, "d"), numpy.full(100, 2, numpy.int32)
        )


def test_read_all_chunks_batched_and_filtered(tmp_path):
    """One batched read returns every chunk of a frame; the ``names``
    filter restricts I/O to the requested chunks (read_log's path -
    it must not read a frame's bulk data to extract scalar columns)."""
    fname = tmp_path / "batched.gsd"
    with tpgsd.fl.open(
        fname, "w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        for frame in range(3):
            f.write_chunk("big", numpy.full((1000, 3), frame, numpy.float32))
            f.write_chunk("log/e", numpy.array([frame * 2.0]))
            f.write_chunk("step", numpy.array([frame], numpy.uint64))
            f.end_frame()

    with tpgsd.fl.open(fname, "r") as f:
        # full frame: every chunk, correct values/shapes
        out = f.read_all_chunks(1)
        assert sorted(out) == ["big", "log/e", "step"]
        numpy.testing.assert_array_equal(
            out["big"], numpy.full((1000, 3), 1, numpy.float32)
        )
        assert out["log/e"][0] == 2.0 and out["step"][0] == 1

        # the contiguous fast path returns views into one span; they
        # remain valid and independent after the dict is dropped
        big = out["big"]
        del out
        assert big[0, 0] == 1.0

        # filtered: only the requested names are returned
        out = f.read_all_chunks(2, names=["log/e", "step"])
        assert sorted(out) == ["log/e", "step"]
        assert out["log/e"][0] == 4.0 and out["step"][0] == 2
        assert f.read_all_chunks(0, names=["absent"]) == {}
