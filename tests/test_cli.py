"""CLI tests: ``python -m tpgsd`` subcommands.

The reference CLI is REPL-only and untestable without a tty
(reference: pgsd/pgsd/__main__.py:52-85); tpgsd adds scriptable
``info``/``dump`` subcommands and drives ``read`` through stdin.
"""

import subprocess
import sys

import numpy
import pytest

import tpgsd.hoomd


@pytest.fixture
def sample_file(tmp_path):
    path = tmp_path / "cli_sample.gsd"
    with tpgsd.hoomd.open(path, mode="w") as traj:
        frame = tpgsd.hoomd.Frame()
        frame.particles.N = 4
        frame.particles.position = numpy.arange(12, dtype=numpy.float32).reshape(4, 3)
        frame.particles.density = numpy.array([1.0, 2.0, 3.0, 4.0], numpy.float32)
        traj.append(frame)
    return path


def _run(args, **kw):
    return subprocess.run(
        [sys.executable, "-m", "tpgsd"] + args,
        capture_output=True,
        text=True,
        timeout=120,
        **kw,
    )


def test_version():
    result = _run(["--version"])
    assert result.returncode == 0
    assert result.stdout.startswith("tpgsd ")


def test_no_subcommand_prints_usage():
    result = _run([])
    assert result.returncode == 2


def test_info(sample_file):
    result = _run(["info", str(sample_file)])
    assert result.returncode == 0
    assert "schema: hoomd" in result.stdout
    assert "frames: 1" in result.stdout
    assert "particles/position" in result.stdout
    assert "[4 x 3] float32" in result.stdout


def test_dump(sample_file):
    result = _run(["dump", str(sample_file), "-n", "particles/density", "-f", "0"])
    assert result.returncode == 0
    assert "1." in result.stdout and "4." in result.stdout


def test_dump_missing_chunk_errors(sample_file):
    result = _run(["dump", str(sample_file), "-n", "no/such"])
    assert result.returncode == 1
    assert "Error" in result.stderr


def test_read_repl_hoomd(sample_file):
    result = _run(
        ["read", str(sample_file)],
        input="print('NFRAMES', len(traj), handle.schema)\n",
    )
    assert result.returncode == 0
    assert "NFRAMES 1 hoomd" in result.stdout
    # code.interact writes the banner to stderr
    assert "Number of frames: 1" in result.stderr


def test_read_repl_schema_none(sample_file):
    result = _run(
        ["read", str(sample_file), "-s", "none"],
        input="print('NN', handle.nnames)\n",
    )
    assert result.returncode == 0
    assert "NN" in result.stdout


def test_read_missing_file_errors(tmp_path):
    result = _run(["read", str(tmp_path / "nope.gsd")])
    assert result.returncode == 1
    assert "Error" in result.stderr


def test_convert_subcommand(sample_file, tmp_path):
    outdir = tmp_path / "vtu_out"
    result = _run(
        ["convert", str(sample_file), "-o", str(outdir), "--fields", "density"]
    )
    assert result.returncode == 0, result.stderr
    assert "Frame 1: N=4" in result.stdout
    assert (outdir / "cli_sample_00001.vtu").exists()


def test_package_version_matches_pyproject():
    """tpgsd.version is the application string written into every file
    header; a desync with pyproject silently mislabels trajectories."""
    import os
    import re

    import tpgsd

    root = os.path.join(os.path.dirname(__file__), os.pardir)
    text = open(os.path.join(root, "pyproject.toml")).read()
    m = re.search(r'^version = "([^"]+)"', text, re.M)
    assert m and m.group(1) == tpgsd.version
