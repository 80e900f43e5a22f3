"""HOOMD schema layer tests.

Behavioral port of the reference matrix (reference:
pgsd/pgsd/test/test_hoomd.py) with a working append() - which the
reference disables (pgsd/pgsd/hoomd.py:568).
"""

import pickle

import numpy
import numpy.testing
import pytest

import tpgsd.fl
import tpgsd.hoomd
import tpgsd.pypgsd


def create_frame(i):
    frame = tpgsd.hoomd.Frame()
    frame.configuration.step = i * 10
    frame.particles.N = 4
    frame.particles.position = numpy.array(
        [[i, 2, 3], [4, 5, 6], [7, 8, 9], [10, 11, 12]], dtype=numpy.float32
    )
    return frame


def test_create_and_len(tmp_path, open_mode):
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.write) as hf:
        assert len(hf) == 0
        hf.extend(create_frame(i) for i in range(5))
        assert len(hf) == 5


def test_default_values(tmp_path, open_mode):
    """An empty frame materializes every documented default on read."""
    frame = tpgsd.hoomd.Frame()
    frame.particles.N = 3
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.write) as hf:
        hf.append(frame)

    for opener in (
        lambda: tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.read),
        lambda: tpgsd.hoomd.HOOMDTrajectory(
            tpgsd.pypgsd.PGSDFile(open(str(tmp_path / "t.gsd"), "rb"))
        ),
    ):
        with opener() as hf:
            s = hf[0]
            assert s.configuration.step == 0
            assert s.configuration.dimensions == 3
            numpy.testing.assert_array_equal(
                s.configuration.box, numpy.array([1, 1, 1, 0, 0, 0], numpy.float32)
            )
            p = s.particles
            assert p.N == 3
            assert p.types == ["A"]
            assert p.type_shapes == [{}]
            numpy.testing.assert_array_equal(p.typeid, numpy.zeros(3, numpy.uint32))
            numpy.testing.assert_array_equal(p.mass, numpy.ones(3, numpy.float32))
            numpy.testing.assert_array_equal(p.charge, numpy.zeros(3, numpy.float32))
            numpy.testing.assert_array_equal(p.diameter, numpy.ones(3, numpy.float32))
            numpy.testing.assert_array_equal(p.body, numpy.full(3, -1, numpy.int32))
            numpy.testing.assert_array_equal(p.position, numpy.zeros((3, 3), numpy.float32))
            numpy.testing.assert_array_equal(
                p.orientation,
                numpy.tile([1, 0, 0, 0], (3, 1)).astype(numpy.float32),
            )
            numpy.testing.assert_array_equal(p.velocity, numpy.zeros((3, 3), numpy.float32))
            # SPH extension field defaults (reference: pgsd/pgsd/hoomd.py:175-182)
            numpy.testing.assert_array_equal(p.slength, numpy.ones(3, numpy.float32))
            numpy.testing.assert_array_equal(p.density, numpy.zeros(3, numpy.float32))
            numpy.testing.assert_array_equal(p.pressure, numpy.zeros(3, numpy.float32))
            numpy.testing.assert_array_equal(p.energy, numpy.zeros(3, numpy.float32))
            for aux in (p.auxiliary1, p.auxiliary2, p.auxiliary3, p.auxiliary4):
                numpy.testing.assert_array_equal(aux, numpy.zeros((3, 3), numpy.float32))
            numpy.testing.assert_array_equal(p.image, numpy.zeros((3, 3), numpy.int32))
            # default arrays are non-writable
            assert not p.position.flags.writeable
            # bond containers default empty
            assert s.bonds.N == 0
            assert s.constraints.N == 0


def test_roundtrip_and_fallback(tmp_path, open_mode):
    """Non-default values round-trip; later frames fall back to frame 0."""
    frame0 = tpgsd.hoomd.Frame()
    frame0.configuration.step = 10000
    frame0.configuration.dimensions = 2
    frame0.configuration.box = [4, 5, 6, 1.0, 0.5, 0.25]
    p = frame0.particles
    p.N = 2
    p.types = ["B", "A"]
    p.typeid = [1, 0]
    p.mass = [2, 3]
    p.position = [[1, 2, 3], [4, 5, 6]]
    p.velocity = [[-1, -2, -3], [-4, -5, -6]]
    p.slength = [0.1, 0.2]
    p.density = [1000.0, 998.0]
    p.pressure = [5.0, 6.0]
    p.energy = [7.0, 8.0]
    p.auxiliary1 = [[1, 0, 0], [0, 1, 0]]
    p.image = [[1, 0, 0], [0, 0, -1]]
    frame0.bonds.N = 1
    frame0.bonds.types = ["bondA"]
    frame0.bonds.typeid = [0]
    frame0.bonds.group = [[0, 1]]
    frame0.constraints.N = 1
    frame0.constraints.value = [1.5]
    frame0.constraints.group = [[0, 1]]

    # frame 1: only step and position change
    frame1 = tpgsd.hoomd.Frame()
    frame1.configuration.step = 10001
    frame1.particles.N = 2
    frame1.particles.types = ["B", "A"]
    frame1.particles.position = [[9, 9, 9], [8, 8, 8]]

    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.write) as hf:
        hf.extend([frame0, frame1])

    for opener in (
        lambda: tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.read),
        lambda: tpgsd.hoomd.HOOMDTrajectory(
            tpgsd.pypgsd.PGSDFile(open(str(tmp_path / "t.gsd"), "rb"))
        ),
    ):
        with opener() as hf:
            s0 = hf[0]
            assert s0.configuration.step == 10000
            assert s0.configuration.dimensions == 2
            numpy.testing.assert_array_almost_equal(
                s0.configuration.box, [4, 5, 6, 1.0, 0.5, 0.25]
            )
            assert s0.particles.types == ["B", "A"]
            numpy.testing.assert_array_equal(s0.particles.typeid, [1, 0])
            numpy.testing.assert_array_equal(s0.particles.mass, [2, 3])
            numpy.testing.assert_array_equal(
                s0.particles.position, [[1, 2, 3], [4, 5, 6]]
            )
            numpy.testing.assert_array_almost_equal(s0.particles.slength, [0.1, 0.2])
            numpy.testing.assert_array_equal(s0.particles.density, [1000.0, 998.0])
            numpy.testing.assert_array_equal(s0.bonds.group, [[0, 1]])
            assert s0.bonds.types == ["bondA"]
            numpy.testing.assert_array_equal(s0.constraints.value, [1.5])

            s1 = hf[1]
            assert s1.configuration.step == 10001
            # changed in frame 1
            numpy.testing.assert_array_equal(
                s1.particles.position, [[9, 9, 9], [8, 8, 8]]
            )
            # everything else falls back to frame 0
            assert s1.configuration.dimensions == 2
            numpy.testing.assert_array_equal(s1.particles.mass, [2, 3])
            numpy.testing.assert_array_equal(s1.particles.density, [1000.0, 998.0])
            assert s1.particles.types == ["B", "A"]
            # frame 1 was created with bonds.N == 0, which differs from
            # frame 0 and therefore overrides it on read
            assert s1.bonds.N == 0
            assert s1.bonds.group.shape == (0, 2)


def test_iteration_and_slicing(tmp_path, open_mode):
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.write) as hf:
        hf.extend(create_frame(i) for i in range(20))

    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.read) as hf:
        assert len(hf) == 20
        steps = [s.configuration.step for s in hf]
        assert steps == [i * 10 for i in range(20)]

        assert hf[-1].configuration.step == 190
        with pytest.raises(IndexError):
            hf[20]
        with pytest.raises(IndexError):
            hf[-21]
        with pytest.raises(TypeError):
            hf["frame"]

        view = hf[5:10]
        assert len(view) == 5
        assert view[0].configuration.step == 50
        subview = view[1:3]
        assert len(subview) == 2
        assert subview[1].configuration.step == 70
        assert [s.configuration.step for s in view] == [50, 60, 70, 80, 90]


def test_state(tmp_path, open_mode):
    snap0 = tpgsd.hoomd.Frame()
    snap0.state["hpmc/sphere/radius"] = [2.0]
    snap0.state["hpmc/sphere/orientable"] = [1]

    snap1 = tpgsd.hoomd.Frame()
    snap1.state["hpmc/convex_polyhedron/N"] = [3]
    snap1.state["hpmc/convex_polyhedron/vertices"] = [
        [-1, -1, -1],
        [0, 1, 1],
        [1, 0, 0],
    ]

    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.write) as hf:
        hf.extend([snap0, snap1])

    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.read) as hf:
        assert len(hf) == 2
        s = hf[0]
        numpy.testing.assert_array_equal(s.state["hpmc/sphere/radius"], [2.0])
        numpy.testing.assert_array_equal(s.state["hpmc/sphere/orientable"], [1])
        s = hf[1]
        numpy.testing.assert_array_equal(s.state["hpmc/convex_polyhedron/N"], [3])
        numpy.testing.assert_array_equal(
            s.state["hpmc/convex_polyhedron/vertices"],
            snap1.state["hpmc/convex_polyhedron/vertices"],
        )


def test_log(tmp_path, open_mode):
    snap0 = tpgsd.hoomd.Frame()
    snap0.log["particles/net_force"] = [[1, 2, 3], [4, 5, 6]]
    snap0.log["particles/pair_lj_energy"] = [0, -5, -8, -3]
    snap0.log["value/potential_energy"] = [10]
    snap0.log["value/pressure"] = [-3]

    snap1 = tpgsd.hoomd.Frame()
    snap1.log["particles/pair_lj_energy"] = [1, 2, -4, -10]
    snap1.log["value/pressure"] = [5]

    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.write) as hf:
        hf.extend([snap0, snap1])

    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.read) as hf:
        s = hf[0]
        numpy.testing.assert_array_equal(
            s.log["particles/net_force"], snap0.log["particles/net_force"]
        )
        numpy.testing.assert_array_equal(s.log["value/pressure"], [-3])
        s = hf[1]
        # unspecified entries pull from frame 0
        numpy.testing.assert_array_equal(
            s.log["particles/net_force"], snap0.log["particles/net_force"]
        )
        numpy.testing.assert_array_equal(s.log["value/potential_energy"], [10])
        # specified entries are from frame 1
        numpy.testing.assert_array_equal(
            s.log["particles/pair_lj_energy"], [1, 2, -4, -10]
        )
        numpy.testing.assert_array_equal(s.log["value/pressure"], [5])


def test_read_log(tmp_path):
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="w") as hf:
        for i in range(4):
            frame = tpgsd.hoomd.Frame()
            frame.configuration.step = i
            frame.log["value/energy"] = [float(i * 2)]
            frame.log["particles/force"] = [[i, 0, 0], [0, i, 0]]
            hf.append(frame)

    logs = tpgsd.hoomd.read_log(tmp_path / "t.gsd")
    numpy.testing.assert_array_equal(logs["configuration/step"], [0, 1, 2, 3])
    numpy.testing.assert_array_equal(logs["log/value/energy"], [0, 2, 4, 6])
    assert logs["log/particles/force"].shape == (4, 2, 3)
    numpy.testing.assert_array_equal(
        logs["log/particles/force"][2], [[2, 0, 0], [0, 2, 0]]
    )

    scalars = tpgsd.hoomd.read_log(tmp_path / "t.gsd", scalar_only=True)
    assert "log/particles/force" not in scalars
    numpy.testing.assert_array_equal(scalars["log/value/energy"], [0, 2, 4, 6])


def test_read_log_warns_on_late_quantities(tmp_path):
    """Quantities first logged after frame 0 cannot form a full time
    series; the reference drops them SILENTLY (reference:
    pgsd/pgsd/hoomd.py:1045-1050) - tpgsd names them in a warning."""
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="w") as hf:
        for i in range(3):
            frame = tpgsd.hoomd.Frame()
            frame.configuration.step = i
            frame.log["value/energy"] = [float(i)]
            if i > 0:
                frame.log["value/late"] = [float(i * 10)]
            hf.append(frame)

    with pytest.warns(RuntimeWarning, match="log/value/late"):
        logs = tpgsd.hoomd.read_log(tmp_path / "t.gsd")
    assert "log/value/late" not in logs
    numpy.testing.assert_array_equal(logs["log/value/energy"], [0, 1, 2])


def test_late_appearing_log_chunk(tmp_path):
    """A log quantity first written at frame 2 must not crash frames
    that omit it: frame 0 has no value to fall back to, so the quantity
    is simply absent there.  The reference indexes frame 0's log dict
    unconditionally and raises KeyError on exactly this file
    (reference: pgsd/pgsd/hoomd.py:885-896)."""
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="w") as hf:
        for i in range(5):
            frame = tpgsd.hoomd.Frame()
            frame.configuration.step = i
            frame.log["value/always"] = [float(i)]
            if i == 2:
                frame.log["value/late"] = [42.0]
            hf.append(frame)

    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="r") as traj:
        # frame 4 omits value/late and frame 0 lacks it: absent, no crash
        f4 = traj[4]
        assert "value/late" not in f4.log
        numpy.testing.assert_array_equal(f4.log["value/always"], [4.0])
        # the frame that wrote it still reads it
        numpy.testing.assert_array_equal(traj[2].log["value/late"], [42.0])
        # frame-0 fallback still applies to quantities frame 0 HAS:
        # read frame 0 first (caches the initial frame), then a frame
        # omitting value/always would take frame 0's value - unchanged
        assert "value/late" not in traj[0].log
        f3 = traj[3]
        assert "value/late" not in f3.log


def test_pickle(tmp_path, open_mode):
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode=open_mode.write) as traj:
        traj.extend(create_frame(i) for i in range(20))
        with pytest.raises(pickle.PickleError):
            pickle.dumps(traj)
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="r") as traj:
        pkl = pickle.dumps(traj)
        with pickle.loads(pkl) as hf:
            assert len(hf) == 20
            assert hf[3].configuration.step == 30


@pytest.mark.parametrize(
    "container", ["particles", "bonds", "angles", "dihedrals", "impropers", "pairs"]
)
def test_no_duplicate_types(tmp_path, container):
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="w") as hf:
        snap = tpgsd.hoomd.Frame()
        getattr(snap, container).types = ["A", "B", "B", "C"]
        with pytest.raises(ValueError):
            hf.append(snap)


def test_type_shapes(tmp_path):
    frame = tpgsd.hoomd.Frame()
    frame.particles.N = 2
    frame.particles.types = ["A", "B"]
    frame.particles.type_shapes = [
        {"type": "Sphere", "diameter": 2.0},
        {"type": "Polygon", "vertices": [[0, 0], [1, 1], [1, 0]]},
    ]
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="w") as hf:
        hf.append(frame)
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="r") as hf:
        s = hf[0]
        assert s.particles.type_shapes == frame.particles.type_shapes


def test_2d_dimension_inference(tmp_path):
    frame = tpgsd.hoomd.Frame()
    frame.configuration.box = [5, 5, 0, 0, 0, 0]
    assert frame.configuration.dimensions == 2
    frame2 = tpgsd.hoomd.Frame()
    frame2.configuration.box = [5, 5, 5, 0, 0, 0]
    assert frame2.configuration.dimensions == 3


def test_truncate(tmp_path):
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="w") as hf:
        hf.extend(create_frame(i) for i in range(10))
        assert len(hf) == 10
        hf.truncate()
        assert len(hf) == 0
        hf.append(create_frame(0))
        assert len(hf) == 1
    with tpgsd.hoomd.open(tmp_path / "t.gsd", mode="r") as hf:
        assert len(hf) == 1


def test_wrong_schema_rejected(tmp_path):
    with tpgsd.fl.open(
        name=tmp_path / "t.gsd", mode="w", application="a",
        schema="not_hoomd", schema_version=[1, 0],
    ):
        pass
    with pytest.raises(RuntimeError):
        tpgsd.hoomd.open(tmp_path / "t.gsd", mode="r")


def test_sph_fields_roundtrip(tmp_path):
    """The SPH extension fields round-trip (the reference's reason to exist)."""
    n = 100
    rng = numpy.random.RandomState(0)
    frame = tpgsd.hoomd.Frame()
    frame.particles.N = n
    frame.particles.position = rng.rand(n, 3).astype(numpy.float32)
    frame.particles.velocity = rng.rand(n, 3).astype(numpy.float32)
    frame.particles.slength = numpy.full(n, 0.05, numpy.float32)
    frame.particles.density = rng.rand(n).astype(numpy.float32) * 1000
    frame.particles.pressure = rng.rand(n).astype(numpy.float32)
    frame.particles.energy = rng.rand(n).astype(numpy.float32)
    frame.particles.auxiliary1 = rng.rand(n, 3).astype(numpy.float32)

    with tpgsd.hoomd.open(tmp_path / "sph.gsd", mode="w") as hf:
        hf.append(frame)

    with tpgsd.hoomd.HOOMDTrajectory(
        tpgsd.pypgsd.PGSDFile(open(str(tmp_path / "sph.gsd"), "rb"))
    ) as hf:
        s = hf[0]
        for field in ("position", "velocity", "slength", "density",
                      "pressure", "energy", "auxiliary1"):
            numpy.testing.assert_array_equal(
                getattr(s.particles, field), getattr(frame.particles, field)
            )


def test_topology_roundtrip(tmp_path):
    """Bond/angle/dihedral/improper/pair/constraint containers round-trip.

    The reference defines BondData but never attaches it to Frame
    (reference: pgsd/pgsd/hoomd.py:450-453); tpgsd wires the full
    upstream topology set in.
    """
    rng = numpy.random.RandomState(11)
    frame = tpgsd.hoomd.Frame()
    frame.particles.N = 10
    frame.particles.position = rng.rand(10, 3).astype(numpy.float32)

    frame.bonds.N = 4
    frame.bonds.types = ["b1", "b2"]
    frame.bonds.typeid = numpy.array([0, 1, 1, 0], numpy.uint32)
    frame.bonds.group = rng.randint(0, 10, (4, 2)).astype(numpy.int32)

    frame.angles.N = 3
    frame.angles.types = ["a"]
    frame.angles.typeid = numpy.zeros(3, numpy.uint32)
    frame.angles.group = rng.randint(0, 10, (3, 3)).astype(numpy.int32)

    frame.dihedrals.N = 2
    frame.dihedrals.types = ["d"]
    frame.dihedrals.typeid = numpy.zeros(2, numpy.uint32)
    frame.dihedrals.group = rng.randint(0, 10, (2, 4)).astype(numpy.int32)

    frame.impropers.N = 1
    frame.impropers.types = ["i"]
    frame.impropers.typeid = numpy.zeros(1, numpy.uint32)
    frame.impropers.group = rng.randint(0, 10, (1, 4)).astype(numpy.int32)

    frame.pairs.N = 2
    frame.pairs.types = ["p"]
    frame.pairs.typeid = numpy.zeros(2, numpy.uint32)
    frame.pairs.group = rng.randint(0, 10, (2, 2)).astype(numpy.int32)

    frame.constraints.N = 2
    frame.constraints.value = numpy.array([1.5, 2.5], numpy.float32)
    frame.constraints.group = rng.randint(0, 10, (2, 2)).astype(numpy.int32)

    fname = tmp_path / "topology.gsd"
    with tpgsd.hoomd.open(fname, mode="w") as traj:
        traj.append(frame)

    with tpgsd.hoomd.open(fname, mode="r") as traj:
        s = traj[0]
        assert s.bonds.N == 4
        assert s.bonds.types == ["b1", "b2"]
        numpy.testing.assert_array_equal(s.bonds.group, frame.bonds.group)
        assert s.angles.group.shape == (3, 3)
        assert s.dihedrals.group.shape == (2, 4)
        assert s.impropers.group.shape == (1, 4)
        assert s.pairs.group.shape == (2, 2)
        numpy.testing.assert_array_equal(
            s.constraints.value, frame.constraints.value
        )
        numpy.testing.assert_array_equal(
            s.constraints.group, frame.constraints.group
        )


def test_extend(tmp_path):
    """extend() appends every frame from an iterable."""
    frames = []
    for i in range(4):
        f = tpgsd.hoomd.Frame()
        f.particles.N = 3
        f.particles.position = numpy.full((3, 3), float(i), numpy.float32)
        frames.append(f)

    fname = tmp_path / "extend.gsd"
    with tpgsd.hoomd.open(fname, mode="w") as traj:
        traj.extend(frames)
    with tpgsd.hoomd.open(fname, mode="r") as traj:
        assert len(traj) == 4
        numpy.testing.assert_array_equal(
            traj[3].particles.position, numpy.full((3, 3), 3.0)
        )
