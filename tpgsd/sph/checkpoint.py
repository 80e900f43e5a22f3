"""Checkpoint / resume for simulation dump loops.

The trajectory file *is* the checkpoint (the reference notes the same
usage for restart files, reference: pgsd/pgsd/pgsd.h:442-449): every
``end_frame`` is a durable, crash-consistent restart point, and append
mode continues exactly after the last complete frame
(reference: pgsd/pgsd/pgsd.c:1630-1639 frame-counter derivation).

:func:`resume` re-derives each device shard's rows from the index and
the target sharding - the "resume must re-derive per-shard offsets"
requirement (SURVEY.md section 5) - and returns a sharded
:class:`~tpgsd.sph.step.SPHState` plus the writer positioned to append.
"""

import numpy

from ..parallel.shard_io import ShardedFrameWriter, ShardedTrajectoryReader
from .step import SPHState


def _require_density(f, last, name):
    """Guard for continuity-mode resume: the last frame must carry the
    ``particles/density`` chunk (the evolved density IS state there -
    re-summing it from positions would discard the advected field)."""
    if not f.chunk_exists(last, "particles/density"):
        raise ValueError(
            "density_mode='continuity' resume needs a particles/density "
            "chunk in the last frame of %s - dump aux.rho alongside "
            "positions, or seed with tpgsd.sph.init_density instead"
            % (name,)
        )


def resume(
    name,
    sharding=None,
    mesh=None,
    extra_chunks=(),
    application="tpgsd.sph",
    density_mode="summation",
):
    """Resume a dump loop from the last complete frame of ``name``.

    Args:
        name: trajectory file path (must exist and hold >= 1 frame).
        sharding: target sharding for the state arrays (default: row
            sharding over the default mesh).
        mesh: mesh to build the default sharding from.
        extra_chunks: additional chunk names to load alongside
            position/velocity.
        density_mode: pass ``"continuity"`` to also load the last
            frame's ``particles/density`` chunk into ``state.rho`` (the
            carried density a continuity-mode stepper needs; raises if
            the frame has none).

    Returns:
        ``(state, step, writer, extras)``: the sharded
        :class:`SPHState` of the last frame, its ``configuration/step``
        value (or ``nframes - 1``), a :class:`ShardedFrameWriter` opened
        in append mode whose next ``write_frame`` lands at
        ``frame == nframes``, and a dict of the extra chunks.
    """
    continuity = density_mode == "continuity"
    with ShardedTrajectoryReader(name, sharding=sharding, mesh=mesh) as reader:
        if reader.nframes == 0:
            raise ValueError("cannot resume from an empty trajectory: " + str(name))
        last = reader.nframes - 1
        want = ["particles/position", "particles/velocity"]
        if continuity:
            _require_density(reader.file, last, name)
            want.append("particles/density")
        chunks = reader.read_frame(last, want + list(extra_chunks))
        if reader.file.chunk_exists(last, "configuration/step"):
            step = int(reader.file.read_chunk(last, "configuration/step")[0])
        else:
            step = last
    state = SPHState(
        x=chunks["particles/position"],
        v=chunks["particles/velocity"],
        rho=chunks["particles/density"] if continuity else None,
    )
    writer = ShardedFrameWriter(name, mode="a", application=application)
    extras = {k: chunks[k] for k in extra_chunks}
    return state, step, writer, extras


def resume_distributed(
    name,
    grid,
    mesh,
    capacity=None,
    application="tpgsd.sph",
    decomp_axis=0,
    density_mode="summation",
):
    """Resume the slab-decomposed distributed loop from a trajectory.

    Reads the last complete frame, re-partitions the particles into
    slab ownership for ``mesh`` (the device count / slab layout may
    DIFFER from the run that wrote the file - ownership is re-derived
    from positions, the distributed analogue of the reference's
    "reopen with P ranks" append constraint, which this lifts), and
    returns everything the loop needs to continue.  ``decomp_axis``
    selects x- (0) or y-slabs (1), matching the step builder's.
    ``density_mode="continuity"`` also re-slabs the last frame's
    ``particles/density`` chunk into ``DistState.rho`` - the carried
    density migrates with its particle through the re-partition.

    Returns:
        ``(dist_state, capacity, step, writer)``: a
        :class:`~tpgsd.sph.distributed.DistState` sharded over
        ``mesh``, the chosen per-device slot capacity, the last
        ``configuration/step`` value, and an append-positioned
        :class:`ShardedFrameWriter`.
    """
    from .. import fl
    from .distributed import distribute_state

    continuity = density_mode == "continuity"
    rho = None
    with fl.open(name, "r") as f:
        if f.nframes == 0:
            raise ValueError("cannot resume from an empty trajectory: " + str(name))
        last = f.nframes - 1
        x = numpy.asarray(f.read_chunk(last, "particles/position"))
        v = numpy.asarray(f.read_chunk(last, "particles/velocity"))
        if continuity:
            _require_density(f, last, name)
            rho = numpy.asarray(f.read_chunk(last, "particles/density"))
        if f.chunk_exists(last, "configuration/step"):
            step = int(f.read_chunk(last, "configuration/step")[0])
        else:
            step = last
    dist, cap = distribute_state(
        SPHState(x=x, v=v, rho=rho), grid, mesh, capacity=capacity,
        decomp_axis=decomp_axis,
    )
    writer = ShardedFrameWriter(name, mode="a", application=application)
    return dist, cap, step, writer


def resume_distributed2d(
    name,
    grid,
    mesh,
    capacity=None,
    application="tpgsd.sph",
    density_mode="summation",
):
    """Resume the 2-D block-decomposed loop from a trajectory.

    The ``(px, py)`` analogue of :func:`resume_distributed`: block
    ownership is re-derived from the last frame's positions, so the
    mesh shape may differ from the writing run's (including resuming a
    1-D-slab-written file onto a 2-D mesh, or vice versa - the file
    records global state only).  ``density_mode="continuity"`` also
    re-blocks the last frame's ``particles/density`` chunk into
    ``DistState.rho``.

    Returns:
        ``(dist_state, capacity, step, writer)`` as
        :func:`resume_distributed`, with the state sharded over both
        mesh axes.
    """
    from .. import fl
    from .distributed2d import distribute_state_2d

    continuity = density_mode == "continuity"
    rho = None
    with fl.open(name, "r") as f:
        if f.nframes == 0:
            raise ValueError("cannot resume from an empty trajectory: " + str(name))
        last = f.nframes - 1
        x = numpy.asarray(f.read_chunk(last, "particles/position"))
        v = numpy.asarray(f.read_chunk(last, "particles/velocity"))
        if continuity:
            _require_density(f, last, name)
            rho = numpy.asarray(f.read_chunk(last, "particles/density"))
        if f.chunk_exists(last, "configuration/step"):
            step = int(f.read_chunk(last, "configuration/step")[0])
        else:
            step = last
    dist, cap = distribute_state_2d(
        SPHState(x=x, v=v, rho=rho), grid, mesh, capacity=capacity
    )
    writer = ShardedFrameWriter(name, mode="a", application=application)
    return dist, cap, step, writer


def resume_distributed3d(
    name,
    grid,
    mesh,
    capacity=None,
    application="tpgsd.sph",
    density_mode="summation",
):
    """Resume the 3-D block-decomposed loop from a trajectory.

    The ``(px, py, pz)`` analogue of :func:`resume_distributed`: block
    ownership is re-derived from the last frame's positions, so the
    mesh shape (and even its dimensionality - 1-D slab, 2-D or 3-D
    block) may differ from the writing run's; the file records global
    state only.  ``density_mode="continuity"`` also re-blocks the last
    frame's ``particles/density`` chunk into ``DistState.rho``.

    Returns:
        ``(dist_state, capacity, step, writer)`` as
        :func:`resume_distributed`, with the state sharded over all
        three mesh axes.
    """
    from .. import fl
    from .distributed3d import distribute_state_3d

    continuity = density_mode == "continuity"
    rho = None
    with fl.open(name, "r") as f:
        if f.nframes == 0:
            raise ValueError("cannot resume from an empty trajectory: " + str(name))
        last = f.nframes - 1
        x = numpy.asarray(f.read_chunk(last, "particles/position"))
        v = numpy.asarray(f.read_chunk(last, "particles/velocity"))
        if continuity:
            _require_density(f, last, name)
            rho = numpy.asarray(f.read_chunk(last, "particles/density"))
        if f.chunk_exists(last, "configuration/step"):
            step = int(f.read_chunk(last, "configuration/step")[0])
        else:
            step = last
    dist, cap = distribute_state_3d(
        SPHState(x=x, v=v, rho=rho), grid, mesh, capacity=capacity
    )
    writer = ShardedFrameWriter(name, mode="a", application=application)
    return dist, cap, step, writer
