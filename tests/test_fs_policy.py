"""Shared-filesystem semantics policy for the direct multi-process path.

The reference delegates concurrent-writer deployment semantics to
MPI-IO and its Lustre-aware drivers (reference: pgsd/pgsd/pgsd.h:449,
pgsd/INSTALLING.rst:127-135); tpgsd states the policy explicitly
(docs/parallel.md, "Shared-filesystem semantics") and detects the
filesystem class at open time (tpgsd/parallel/fs.py).
"""

import warnings

import numpy
import pytest

import tpgsd.fl
from tpgsd.parallel import direct_write_policy, filesystem_kind
from tpgsd.parallel import fs as fs_mod


MOUNTS = [
    ("/", "ext4"),
    ("/mnt/nfs", "nfs4"),
    ("/mnt/lustre", "lustre"),
    ("/mnt/gcs", "fuse.gcsfuse"),
    ("/mnt/smb", "cifs"),
    ("/mnt/nfs/local-bind", "ext4"),  # longest prefix must win
    ("/mnt/weird", "frobfs"),
]


@pytest.mark.parametrize(
    "path,kind",
    [
        ("/home/u/t.gsd", "local"),
        ("/mnt/nfs/t.gsd", "network"),
        ("/mnt/nfs/local-bind/t.gsd", "local"),
        ("/mnt/lustre/t.gsd", "parallel"),
        ("/mnt/gcs/t.gsd", "objectstore"),
        ("/mnt/smb/t.gsd", "network"),
        ("/mnt/weird/t.gsd", "unknown"),
    ],
)
def test_filesystem_kind(path, kind, monkeypatch):
    # paths under test do not exist; realpath must not resolve them away
    monkeypatch.setattr(fs_mod.os.path, "realpath", lambda p: p)
    assert filesystem_kind(path, mounts=MOUNTS) == kind


def test_direct_write_policy(monkeypatch):
    monkeypatch.setattr(fs_mod.os.path, "realpath", lambda p: p)
    # single process: always direct, regardless of filesystem
    assert direct_write_policy("/mnt/gcs/t.gsd", 1, mounts=MOUNTS)[0] == "direct"
    assert direct_write_policy("/home/t.gsd", 8, mounts=MOUNTS)[0] == "direct"
    assert (
        direct_write_policy("/mnt/lustre/t.gsd", 8, mounts=MOUNTS)[0]
        == "direct"
    )
    p, reason = direct_write_policy("/mnt/nfs/t.gsd", 2, mounts=MOUNTS)
    assert p == "direct-warn" and "ComposedFrameWriter" in reason
    p, reason = direct_write_policy("/mnt/gcs/t.gsd", 2, mounts=MOUNTS)
    assert p == "compose" and "ComposedFrameWriter" in reason


def test_warn_if_risky(monkeypatch):
    monkeypatch.setattr(fs_mod.os.path, "realpath", lambda p: p)
    with pytest.warns(RuntimeWarning, match="close-to-open"):
        assert (
            fs_mod.warn_if_risky("/mnt/nfs/t.gsd", 4, mounts=MOUNTS)
            == "direct-warn"
        )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # local FS: no warning
        assert fs_mod.warn_if_risky("/t.gsd", 4, mounts=MOUNTS) == "direct"


def test_proc_mounts_classifies_tmpdir(tmp_path):
    """The real /proc/mounts parse classifies the test scratch dir as a
    safe direct target (local or parallel on any CI machine)."""
    kind = filesystem_kind(tmp_path)
    assert kind in ("local", "parallel", "unknown")
    policy, _ = direct_write_policy(tmp_path / "t.gsd", 4)
    assert policy in ("direct", "direct-warn")


class _FakeComm:
    """Rank-0 view of a 2-process comm; collectives degenerate to local
    values (enough to drive PGSDFile.__init__ through the advisory)."""

    rank, size = 0, 2

    def allgather(self, value):
        return [value, value]

    def bcast(self, value, root=0):
        return value

    def barrier(self):
        pass

    def allreduce_sum(self, value):
        return value

    def allreduce_max(self, value):
        return value


def test_fl_open_warns_on_risky_fs(tmp_path, monkeypatch):
    """A multi-process writable handle emits the advisory when the file
    lands on a network filesystem; a local one stays silent."""
    nfs_mounts = [("/", "nfs4")]
    monkeypatch.setattr(fs_mod, "_read_proc_mounts", lambda: nfs_mounts)
    with pytest.warns(RuntimeWarning, match="ComposedFrameWriter"):
        f = tpgsd.fl.PGSDFile(
            tmp_path / "t.gsd", "w", application="t", schema="none",
            schema_version=(1, 0), comm=_FakeComm(),
        )
    f.write_chunk("a", numpy.arange(4, dtype=numpy.uint8))
    f.end_frame()
    f.close()

    local_mounts = [("/", "ext4")]
    monkeypatch.setattr(fs_mod, "_read_proc_mounts", lambda: local_mounts)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        f = tpgsd.fl.PGSDFile(
            tmp_path / "t2.gsd", "w", application="t", schema="none",
            schema_version=(1, 0), comm=_FakeComm(),
        )
        f.close()


def test_overmount_same_point_last_wins(monkeypatch):
    """/proc/mounts lists mounts in order; a later mount on the SAME
    point shadows the earlier one — the effective filesystem is the
    last entry, and misclassifying it would silence the NFS warning on
    exactly the unsafe case."""
    monkeypatch.setattr(fs_mod.os.path, "realpath", lambda p: p)
    over = [("/", "ext4"), ("/data", "ext4"), ("/data", "nfs4")]
    assert filesystem_kind("/data/t.gsd", mounts=over) == "network"
    # and the reverse: NFS later overmounted by a local fs is safe
    back = [("/", "ext4"), ("/data", "nfs4"), ("/data", "ext4")]
    assert filesystem_kind("/data/t.gsd", mounts=back) == "local"


def test_no_mount_table_platform_does_not_warn(monkeypatch):
    """Hosts without /proc/mounts (macOS & co) must not warn on every
    multi-process open — there is nothing to classify against."""
    monkeypatch.setattr(fs_mod, "_read_proc_mounts", lambda: [])
    policy, reason = direct_write_policy("/Users/u/t.gsd", 8)
    assert policy == "direct"
    assert "no mount table" in reason
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> failure
        assert fs_mod.warn_if_risky("/Users/u/t.gsd", 8) == "direct"
