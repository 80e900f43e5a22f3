"""The reference-layout `pgsd` package must work as a drop-in alias."""

import numpy


def test_pgsd_alias_roundtrip(tmp_path):
    import pgsd.fl
    import pgsd.hoomd
    import pgsd.pypgsd

    path = tmp_path / "alias.gsd"
    with pgsd.hoomd.open(path, mode="w") as traj:
        frame = pgsd.hoomd.Frame()
        frame.particles.N = 3
        frame.particles.position = numpy.eye(3, dtype=numpy.float32)
        frame.particles.slength = numpy.full(3, 0.2, numpy.float32)
        traj.append(frame)

    with pgsd.fl.open(path, "r") as f:
        assert f.schema == "hoomd"
    with pgsd.pypgsd.PGSDFile(open(str(path), "rb")) as f:
        numpy.testing.assert_array_equal(
            f.read_chunk(0, "particles/position"), numpy.eye(3, dtype=numpy.float32)
        )

    import pgsd

    assert pgsd.__version__
