"""Corruption-detection matrix: every validated invariant gets a
deliberately broken file.

(reference checks: pgsd/pgsd/pgsd.c:414-450 entry validation,
661-689 monotone frames, 1504-1529 header validation)
"""

import os
import struct

import numpy
import pytest

import tpgsd.fl
import tpgsd.pypgsd
from tpgsd.format import (
    FileCorruptError,
    InvalidVersionError,
    NotAGSDFileError,
)

HEADER_FMT = "QQQQQII64s64s80s"


def _make_file(tmp_path, name="good.gsd"):
    path = tmp_path / name
    with tpgsd.fl.open(
        path, "w", application="t", schema="none", schema_version=[1, 0]
    ) as f:
        f.write_chunk("alpha", numpy.arange(8, dtype=numpy.int32))
        f.end_frame()
        f.write_chunk("beta", numpy.arange(4, dtype=numpy.float32))
        f.end_frame()
    return path


def _patch(path, offset, data):
    with open(path, "r+b") as f:
        f.seek(offset)
        f.write(data)


def _openers(path):
    return (
        lambda: tpgsd.fl.open(path, "r"),
        lambda: tpgsd.pypgsd.PGSDFile(open(str(path), "rb")),
    )


def test_bad_magic(tmp_path):
    path = _make_file(tmp_path)
    _patch(path, 0, b"\x00" * 8)
    for opener in _openers(path):
        with pytest.raises(NotAGSDFileError):
            opener()


def test_future_version_rejected(tmp_path):
    path = _make_file(tmp_path)
    _patch(path, 44, struct.pack("I", (3 << 16) | 0))
    for opener in _openers(path):
        with pytest.raises(InvalidVersionError):
            opener()


def test_ancient_version_rejected(tmp_path):
    path = _make_file(tmp_path)
    _patch(path, 44, struct.pack("I", (0 << 16) | 2))  # v0.2 (only 0.3 legal)
    for opener in _openers(path):
        with pytest.raises(InvalidVersionError):
            opener()


def test_index_past_eof(tmp_path):
    path = _make_file(tmp_path)
    _patch(path, 8, struct.pack("Q", 1 << 40))  # index_location
    for opener in _openers(path):
        with pytest.raises((FileCorruptError, IOError)):
            opener()


def test_namelist_past_eof(tmp_path):
    path = _make_file(tmp_path)
    _patch(path, 24, struct.pack("Q", 1 << 40))  # namelist_location
    for opener in _openers(path):
        with pytest.raises((FileCorruptError, IOError)):
            opener()


def test_entry_nonzero_flags(tmp_path):
    path = _make_file(tmp_path)
    _patch(path, 256 + 31, b"\x07")  # first index entry's flags byte
    for opener in _openers(path):
        with pytest.raises(FileCorruptError):
            opener()


def test_entry_bad_type_code(tmp_path):
    path = _make_file(tmp_path)
    _patch(path, 256 + 30, b"\xfe")  # type byte
    for opener in _openers(path):
        with pytest.raises(FileCorruptError):
            opener()


def test_entry_data_past_eof(tmp_path):
    path = _make_file(tmp_path)
    _patch(path, 256 + 8, struct.pack("Q", 1 << 40))  # entry N (rows)
    for opener in _openers(path):
        with pytest.raises(FileCorruptError):
            opener()


def test_nonmonotone_frames(tmp_path):
    path = _make_file(tmp_path)
    # first entry claims frame 9 while the second stays at a lower frame
    _patch(path, 256 + 0, struct.pack("Q", 9))
    for opener in _openers(path):
        with pytest.raises(FileCorruptError):
            opener()


def test_torn_frame_invisible(tmp_path):
    """Bytes appended after the last index commit (a torn frame) must
    be invisible: the file opens clean with the committed frame count."""
    path = _make_file(tmp_path)
    with open(path, "ab") as f:
        f.write(b"\xde\xad" * 4096)  # orphan data, never indexed
    for opener in _openers(path):
        with opener() as handle:
            assert handle.nframes == 2
            numpy.testing.assert_array_equal(
                handle.read_chunk(0, "alpha"),
                numpy.arange(8, dtype=numpy.int32),
            )


def test_zeroed_index_tail_is_clean_eof(tmp_path):
    """location == 0 sentinel terminates the index scan without error."""
    path = _make_file(tmp_path)
    with tpgsd.fl.open(path, "r") as f:
        assert f.nframes == 2  # sanity: sentinel respected


class TestVerifyWalk:
    """fsck-style verify(): full-file integrity walk."""

    def _write(self, path, frames=3):
        import tpgsd.fl

        with tpgsd.fl.open(
            path, "w", application="t", schema="none", schema_version=(1, 0)
        ) as f:
            for i in range(frames):
                f.write_chunk(
                    "data/a", numpy.arange(64, dtype=numpy.float32) + i
                )
                f.write_chunk("data/b", numpy.arange(8, dtype=numpy.uint32))
                f.end_frame()

    def test_clean_file_verifies(self, tmp_path):
        from tpgsd.pypgsd import verify

        path = str(tmp_path / "clean.gsd")
        self._write(path)
        with open(path, "rb") as fh:
            r = verify(fh)
        assert r["ok"], r["errors"]
        assert r["frames"] == 3
        assert r["chunks"] == 6
        assert r["data_bytes"] == 3 * (64 * 4 + 8 * 4)

    def test_truncated_data_detected(self, tmp_path):
        from tpgsd.pypgsd import verify

        path = str(tmp_path / "trunc.gsd")
        self._write(path)
        # chop bytes off the end: some chunk data now extends past EOF
        size = os.path.getsize(path)
        with open(path, "r+b") as fh:
            fh.truncate(size - 40)
        with open(path, "rb") as fh:
            r = verify(fh)
        assert not r["ok"]
        # caught either by the bounds validator or the deep read
        assert any(
            "EOF" in e or "short" in e or "invalid" in e for e in r["errors"]
        ), r["errors"]

    def test_corrupt_index_entry_detected(self, tmp_path):
        from tpgsd.format import HEADER_SIZE, INDEX_ENTRY_DTYPE, unpack_header
        from tpgsd.pypgsd import verify

        path = str(tmp_path / "badidx.gsd")
        self._write(path)
        with open(path, "r+b") as fh:
            hdr = unpack_header(fh.read(HEADER_SIZE))
            loc = int(hdr["index_location"])
            fh.seek(loc)
            entry = numpy.frombuffer(
                fh.read(INDEX_ENTRY_DTYPE.itemsize), dtype=INDEX_ENTRY_DTYPE
            ).copy()
            entry["type"] = 200  # invalid type code
            fh.seek(loc)
            fh.write(entry.tobytes())
        with open(path, "rb") as fh:
            r = verify(fh)
        assert not r["ok"]
        assert any("invalid" in e for e in r["errors"]), r["errors"]

    def test_cli_verify(self, tmp_path, capsys):
        import tpgsd.__main__ as cli

        path = str(tmp_path / "cli.gsd")
        self._write(path, frames=1)
        import sys as _sys

        old = _sys.argv
        try:
            _sys.argv = ["tpgsd", "verify", path]
            with pytest.raises(SystemExit) as e:
                cli.main()
            assert e.value.code == 0
        finally:
            _sys.argv = old
        out = capsys.readouterr().out
        assert "OK" in out and "1 frames" in out
