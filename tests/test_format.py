"""Byte-level format contract tests.

These assert the exact on-disk layout independently of the reader/writer
pair, pinning bit-compatibility with GSD v2 (reference spec:
pgsd/doc/pgsd.tex:341-606 and pgsd/pgsd/pypgsd.py:50-54).
"""

import struct

import numpy
import pytest

import tpgsd.fl
from tpgsd.format import structs, validate


def test_header_layout():
    assert structs.HEADER_SIZE == 256
    h = structs.new_header("app", "schema", structs.make_version(1, 4))
    raw = structs.pack_header(h)
    # unpack with the independent struct-string spec
    fields = struct.unpack("QQQQQII64s64s80s", raw)
    assert fields[0] == 0x65DF65DF65DF65DF
    assert fields[1] == 256  # index_location
    assert fields[2] == 128  # index_allocated_entries
    assert fields[3] == 256 + 128 * 32  # namelist_location
    assert fields[4] == 1024 // 64  # namelist_allocated_entries
    assert fields[5] == (1 << 16) | 4  # schema_version
    assert fields[6] == (2 << 16) | 0  # pgsd_version v2.0
    assert fields[7].rstrip(b"\x00") == b"app"
    assert fields[8].rstrip(b"\x00") == b"schema"
    assert fields[9] == b"\x00" * 80


def test_index_entry_layout():
    assert structs.INDEX_ENTRY_SIZE == 32
    e = numpy.zeros(1, dtype=structs.INDEX_ENTRY_DTYPE)
    e[0] = (7, 100, 4096, 3, 11, 9, 0)
    raw = structs.pack_index(e)
    assert struct.unpack("QQqIHBB", raw) == (7, 100, 4096, 3, 11, 9, 0)


def test_type_codes():
    expect = {
        1: "uint8", 2: "uint16", 3: "uint32", 4: "uint64",
        5: "int8", 6: "int16", 7: "int32", 8: "int64",
        9: "float32", 10: "float64",
    }
    for code, name in expect.items():
        assert structs.TYPE_TO_DTYPE[code] == numpy.dtype(name)
        assert structs.sizeof_type(code) == numpy.dtype(name).itemsize
    assert structs.sizeof_type(0) == 0
    assert structs.sizeof_type(11) == 0


def test_make_version():
    assert structs.make_version(2, 0) == 2 << 16
    assert structs.split_version(structs.make_version(3, 7)) == (3, 7)


def test_new_file_byte_layout(tmp_path):
    """A fresh file is exactly header + zeroed 128-entry index + 1024B namelist."""
    fname = tmp_path / "layout.gsd"
    with tpgsd.fl.open(
        name=fname, mode="w", application="a", schema="s", schema_version=[1, 0]
    ):
        pass
    raw = fname.read_bytes()
    assert len(raw) == 256 + 128 * 32 + 1024
    assert raw[256:] == b"\x00" * (128 * 32 + 1024)
    h = structs.unpack_header(raw[:256])
    validate.validate_header(h, file_size=len(raw))


def test_namelist_pack_parse_v2():
    names = ["alpha", "log/β", "c"]
    block = validate.pack_namelist_v2(names, 128)
    assert len(block) == 128
    parsed, used = validate.parse_namelist(block, structs.make_version(2, 0))
    assert parsed == names
    assert used == sum(len(n.encode()) + 1 for n in names)


def test_namelist_parse_v1():
    block = b"first" + b"\x00" * 59 + b"second" + b"\x00" * 58 + b"\x00" * 64
    parsed, used = validate.parse_namelist(block, structs.make_version(1, 0))
    assert parsed == ["first", "second"]
    assert used == 128


def test_find_index_end():
    idx = structs.new_index_block(8)
    assert validate.find_index_end(idx) == 0
    idx["location"][:3] = [256, 512, 1024]
    assert validate.find_index_end(idx) == 3
    idx["location"][:] = 1
    assert validate.find_index_end(idx) == 8


def test_entry_validation():
    e = numpy.zeros(1, dtype=structs.INDEX_ENTRY_DTYPE)[0]
    assert not validate.entry_valid(e)  # type 0, M 0, location 0
    good = numpy.array([(0, 4, 256, 1, 0, 9, 0)], dtype=structs.INDEX_ENTRY_DTYPE)[0]
    assert validate.entry_valid(good)
    assert validate.entry_valid(good, n_names=1)
    assert not validate.entry_valid(good, n_names=0)  # id out of range
    bad_flags = good.copy()
    bad_flags["flags"] = 1
    assert not validate.entry_valid(bad_flags)


def test_sort_index():
    entries = numpy.array(
        [(1, 0, 9, 1, 2, 1, 0), (0, 0, 9, 1, 5, 1, 0), (1, 0, 9, 1, 0, 1, 0),
         (0, 0, 9, 1, 1, 1, 0)],
        dtype=structs.INDEX_ENTRY_DTYPE,
    )
    s = validate.sort_index(entries)
    keys = [(int(x["frame"]), int(x["id"])) for x in s]
    assert keys == [(0, 1), (0, 5), (1, 0), (1, 2)]


def test_reject_future_version():
    h = structs.new_header("a", "s", 0)
    h["pgsd_version"] = structs.make_version(3, 0)
    with pytest.raises(validate.InvalidVersionError):
        validate.validate_header(h)


def test_accept_legacy_v03():
    h = structs.new_header("a", "s", 0)
    h["pgsd_version"] = structs.make_version(0, 3)
    validate.validate_header(h)
    h["pgsd_version"] = structs.make_version(0, 2)
    with pytest.raises(validate.InvalidVersionError):
        validate.validate_header(h)


def test_grow_reserved():
    from tpgsd.fl import _grow_reserved

    assert _grow_reserved(1024, 100) == 1024
    assert _grow_reserved(1024, 1024) == 1024
    assert _grow_reserved(1024, 1025) == 2048
    # reference doubles again when needed == new (pgsd/pgsd/pgsd.c:500-504)
    assert _grow_reserved(1024, 2048) == 4096
    assert _grow_reserved(1024, 5000) == 8192


def test_index_bounds_check_overflow_safe():
    """A corrupt entry whose N*M*itemsize wraps uint64 must be rejected
    by the vectorized block check exactly like the scalar entry_valid
    (regression: uint64 wrap used to let it pass, with overflow
    RuntimeWarnings)."""
    import warnings

    # fields: (frame, N, location, M, id, type, flags); type 10 = f8
    huge = numpy.array(
        [(0, 1 << 61, 256, 8, 0, 10, 0)],
        dtype=structs.INDEX_ENTRY_DTYPE,
    )
    assert not validate.entry_valid(huge[0], file_size=10_000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # overflow warnings are failures
        with pytest.raises(validate.FileCorruptError):
            validate.validate_index_block(huge, 1, file_size=10_000)

    # sane entries of every size still pass with the division-based check
    good = numpy.array(
        [(0, 4, 256, 3, 0, 9, 0)],
        dtype=structs.INDEX_ENTRY_DTYPE,
    )
    validate.validate_index_block(good, 1, file_size=256 + 4 * 3 * 4)
    with pytest.raises(validate.FileCorruptError):
        validate.validate_index_block(good, 1, file_size=256 + 4 * 3 * 4 - 1)

    # negative location (i64) must be rejected in both paths
    neg = good.copy()
    neg["location"] = -8
    assert not validate.entry_valid(neg[0], file_size=10_000)
    with pytest.raises(validate.FileCorruptError):
        validate.validate_index_block(neg, 1, file_size=10_000)
