"""Tests for tools/pgsd2vtu.py: VTU conversion without pyevtk.

(reference converter: test_pgsd2vtu.py, pgsd/doc/pgsd.tex:1226-1265)
"""

import base64
import pathlib
import sys
import xml.etree.ElementTree as ET

import numpy
import numpy.testing
import pytest

import tpgsd.hoomd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tools"))
import pgsd2vtu  # noqa: E402


@pytest.fixture
def traj_file(tmp_path):
    path = tmp_path / "traj.gsd"
    with tpgsd.hoomd.open(path, mode="w") as traj:
        for i in range(3):
            frame = tpgsd.hoomd.Frame()
            frame.particles.N = 5
            frame.particles.position = (
                numpy.arange(15, dtype=numpy.float32).reshape(5, 3) + i
            )
            frame.particles.velocity = numpy.ones((5, 3), numpy.float32) * i
            frame.particles.density = numpy.full(5, 1000.0 + i, numpy.float32)
            frame.particles.pressure = numpy.full(5, 7.0, numpy.float32)
            frame.particles.slength = numpy.full(5, 0.1, numpy.float32)
            traj.append(frame)
    return path


def _parse_binary_dataarray(elem):
    blob = base64.b64decode(elem.text.strip())
    nbytes = int(numpy.frombuffer(blob[:8], numpy.uint64)[0])
    dtype = {
        "Float32": numpy.float32,
        "Float64": numpy.float64,
        "Int64": numpy.int64,
        "UInt8": numpy.uint8,
    }[elem.get("type")]
    data = numpy.frombuffer(blob[8 : 8 + nbytes], dtype)
    ncomp = int(elem.get("NumberOfComponents", "1"))
    return data.reshape(-1, ncomp) if ncomp > 1 else data


def test_convert_all_frames(traj_file, tmp_path):
    outdir = tmp_path / "vtu"
    written = pgsd2vtu.convert(str(traj_file), outdir=str(outdir), quiet=True)
    assert len(written) == 3
    assert [pathlib.Path(w).name for w in written] == [
        "traj_00001.vtu",
        "traj_00002.vtu",
        "traj_00003.vtu",
    ]

    tree = ET.parse(written[1])
    root = tree.getroot()
    piece = root.find("./UnstructuredGrid/Piece")
    assert piece.get("NumberOfPoints") == "5"
    assert piece.get("NumberOfCells") == "5"

    points = _parse_binary_dataarray(piece.find("./Points/DataArray"))
    numpy.testing.assert_allclose(
        points, numpy.arange(15, dtype=numpy.float32).reshape(5, 3) + 1
    )

    arrays = {
        e.get("Name"): e for e in piece.findall("./PointData/DataArray")
    }
    assert set(arrays) == {"density", "pressure", "slength", "velocity"}
    numpy.testing.assert_allclose(
        _parse_binary_dataarray(arrays["density"]), numpy.full(5, 1001.0)
    )
    vel = _parse_binary_dataarray(arrays["velocity"])
    assert vel.shape == (5, 3)

    types = _parse_binary_dataarray(piece.find("./Cells/DataArray[@Name='types']"))
    assert (types == 1).all()  # VTK_VERTEX


def test_convert_ascii_and_slice(traj_file, tmp_path):
    outdir = tmp_path / "vtu_ascii"
    written = pgsd2vtu.convert(
        str(traj_file),
        outdir=str(outdir),
        frames=slice(1, 3),
        fields=["density"],
        ascii_format=True,
        quiet=True,
    )
    assert len(written) == 2
    tree = ET.parse(written[0])
    piece = tree.getroot().find("./UnstructuredGrid/Piece")
    dens = piece.find("./PointData/DataArray[@Name='density']")
    assert dens.get("format") == "ascii"
    values = numpy.array(dens.text.split(), dtype=numpy.float64)
    numpy.testing.assert_allclose(values, numpy.full(5, 1001.0))


def test_cli_main(traj_file, tmp_path, capsys):
    outdir = tmp_path / "vtu_cli"
    pgsd2vtu.main([str(traj_file), "-o", str(outdir), "--frames", "0:1"])
    out = capsys.readouterr().out
    assert "Frame 1: N=5" in out
    assert (outdir / "traj_00001.vtu").exists()
