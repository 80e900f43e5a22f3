"""Sharded chunk write/read: ``jax.Array`` <-> GSD file stripes.

Write path: each addressable shard of an axis-0-sharded array pwrites its
rows at ``chunk_location + row_start * M * itemsize`` - the precomputed
offset protocol that replaces the reference's per-rank
``MPI_File_write_at`` (reference: pgsd/pgsd/pgsd.c:2225-2237).  One index
entry describes the global chunk; the controller process commits it.

Read path: each device's stripe is pread into a host buffer and placed on
its device; ``jax.make_array_from_single_device_arrays`` reassembles the
global array with the writer's partitioning (zero gather traffic).
"""

import logging

import numpy

from ..format.structs import DTYPE_TO_TYPE, TYPE_TO_DTYPE

logger = logging.getLogger("tpgsd.parallel")


def gsd_storable(arr):
    """Coerce ``arr`` to a GSD-storable dtype (single policy for every
    writer): bfloat16/void floats -> float32, oddball ints -> int32."""
    if numpy.dtype(arr.dtype) in DTYPE_TO_TYPE:
        return arr
    target = numpy.float32 if numpy.dtype(arr.dtype).kind in "fV" else numpy.int32
    return numpy.asarray(arr, dtype=target)


def infer_particles_n(chunks, static):
    """Fill ``static['particles/N']`` from the first particles/* chunk
    when absent - the shared first-frame convention of every frame
    writer."""
    n_chunk = next(
        (v for k, v in chunks.items() if k.startswith("particles/")), None
    )
    if n_chunk is not None and "particles/N" not in static:
        static["particles/N"] = numpy.array(
            [n_chunk.shape[0]], dtype=numpy.uint32
        )
    return static


def _is_jax_array(x):
    try:
        import jax

        return isinstance(x, jax.Array)
    except Exception:
        return False


def array_shards(array):
    """Decompose an array into ``[(row_start, host_ndarray), ...]``.

    * numpy/array-like: one shard at row 0.
    * ``jax.Array`` sharded on axis 0: one shard per addressable device,
      deduplicated by row range (replication over other mesh axes writes
      each row range once).
    * ``jax.Array`` sharded on any other axis: materialized whole (with a
      warning) - the file format stripes rows, not columns.

    Device-to-host transfer happens here (`numpy.asarray` on each shard is
    the D2H DMA); everything downstream is host-side positioned I/O.
    """
    if not _is_jax_array(array):
        arr = numpy.asarray(array)
        return [(0, arr)], arr.shape

    shape = tuple(array.shape)
    # detect non-axis-0 sharding: any shard whose non-leading index is not
    # the full slice
    shards = []
    seen_ranges = set()
    for shard in array.addressable_shards:
        idx = shard.index
        row_slice = idx[0] if len(idx) > 0 else slice(None)
        for other in idx[1:]:
            if other != slice(None, None, None):
                logger.warning(
                    "array sharded on a non-leading axis; gathering to host"
                )
                return [(0, numpy.asarray(array))], shape
        start = row_slice.start or 0
        stop = row_slice.stop if row_slice.stop is not None else shape[0]
        if (start, stop) in seen_ranges:
            continue  # replica of a row range already captured
        seen_ranges.add((start, stop))
        shards.append((int(start), numpy.asarray(shard.data)))
    shards.sort(key=lambda s: s[0])
    return shards, shape


def write_sharded_chunk(file, name, array, n_rows=None):
    """Write ``array`` (jax or numpy, 1-D or 2-D) as one chunk of the
    current frame of ``file`` (a writable :class:`tpgsd.fl.PGSDFile`).

    Every host writes only its addressable shards; the index entry records
    the global shape.

    Args:
        n_rows: true global row count when ``array`` carries zero padding
            from :func:`tpgsd.parallel.mesh.pad_rows` (padding rows past
            ``n_rows`` are stripped and never reach the file).
    """
    shards, shape = array_shards(array)
    if len(shape) > 2:
        raise ValueError("GSD can only write 1 or 2 dimensional arrays: " + name)
    N_global = shape[0] if shape else 1
    M = shape[1] if len(shape) == 2 else 1

    if n_rows is not None and n_rows != N_global:
        if n_rows > N_global:
            raise ValueError("n_rows exceeds the array's row count: " + name)
        N_global = int(n_rows)
        clipped = []
        for start, arr in shards:
            valid = min(arr.shape[0], N_global - start)
            if valid > 0:
                clipped.append((start, arr[:valid]))
        shards = clipped

    if shards:
        dtype = numpy.dtype(shards[0][1].dtype)
    else:
        dtype = numpy.dtype(numpy.asarray(array).dtype)
    # jax default float is float32; bfloat16 has no GSD code - upcast
    if dtype not in DTYPE_TO_TYPE:
        shards = [(o, gsd_storable(a)) for o, a in shards]
        dtype = numpy.dtype(shards[0][1].dtype) if shards else numpy.dtype(
            gsd_storable(numpy.asarray(array)).dtype
        )
    type_code = DTYPE_TO_TYPE[dtype]

    norm = []
    for start, arr in shards:
        arr = numpy.ascontiguousarray(arr).reshape(-1, M)
        norm.append((start, arr))
    file.write_chunk_shards(name, norm, M=M, type_code=type_code, N_global=N_global)


def read_sharded_chunk(file, frame, name, sharding, pad=False):
    """Read a chunk directly into a sharded ``jax.Array``.

    Each addressable device's row stripe is read independently at its
    precomputed offset and placed on that device;
    ``jax.make_array_from_single_device_arrays`` assembles the global
    array - no host-side gather, no device-side reshuffle.

    Args:
        file: readable PGSDFile (fl or pypgsd).
        frame (int): frame index.
        name (str): chunk name.
        sharding: ``jax.sharding.Sharding`` describing the desired
            partitioning (axis 0 over devices).
        pad (bool): when the row count does not divide the shard count,
            zero-pad the trailing shard (the result's leading dim is
            rounded up; pair with the writer's ``n_rows``).

    Returns:
        ``jax.Array`` with the given sharding.
    """
    import jax

    chunk = file._find_chunk(frame, name)
    if chunk is None:
        raise KeyError(
            "frame %s / chunk %s not found in: %s" % (frame, name, file.name)
        )
    N = int(chunk["N"])
    M = int(chunk["M"])
    dtype = TYPE_TO_DTYPE[int(chunk["type"])]

    n_shards = getattr(sharding, "num_devices", None) or len(sharding.device_set)
    N_out = N
    if N % n_shards != 0:
        if not pad:
            raise ValueError(
                "chunk %s has %d rows, not divisible by %d shards; "
                "pass pad=True to zero-pad the trailing shard" % (name, N, n_shards)
            )
        N_out = N + ((-N) % n_shards)
    global_shape = (N_out, M) if M > 1 else (N_out,)

    location = int(chunk["location"])
    itemsize = dtype.itemsize

    index_map = sharding.addressable_devices_indices_map(global_shape)
    # preallocate every device's (zero-padded) stripe, then fill all
    # valid ranges with ONE batched positioned read when the backend
    # supports it (tpgsd.fl over the native handle does)
    stripes = []
    reads = []
    for device, idx in index_map.items():
        row_slice = idx[0] if idx else slice(None)
        start = row_slice.start or 0
        stop = row_slice.stop if row_slice.stop is not None else N_out
        rows = stop - start
        valid = max(0, min(rows, N - start))
        buf = numpy.zeros(rows * M, dtype=dtype)
        if valid > 0:
            reads.append((start, valid, buf[: valid * M]))
        stripes.append((device, buf, rows))

    batched = getattr(getattr(file, "_fh", None), "pread_many", None)
    if batched is not None:
        batched(
            [
                (location + start * M * itemsize, view)
                for start, valid, view in reads
            ]
        )
    else:
        for start, valid, view in reads:
            out = file.read_chunk(frame, name, N=valid, M=M, offset=start, r_all=True)
            view[:] = numpy.asarray(out).reshape(-1)

    buffers = []
    for device, buf, rows in stripes:
        stripe = buf.reshape(rows, M) if M > 1 else buf
        buffers.append(jax.device_put(stripe, device))
    return jax.make_array_from_single_device_arrays(global_shape, sharding, buffers)


class ShardedTrajectoryReader:
    """Read trajectory frames back as sharded ``jax.Array`` dicts.

    The read-side pair of :class:`ShardedFrameWriter`: each frame's
    chunks are pread as per-device row stripes at their precomputed
    offsets and reassembled with the requested sharding - no host-side
    gather, no device-side reshuffle (the "zero-copy into sharded
    jax.Arrays" capability; per-stripe fan-out mirrors the reference's
    all-ranks strided read, reference: pgsd/pgsd/pgsd.c:2496-2534).

    Example:
        reader = ShardedTrajectoryReader(path, sharding)
        state = reader.read_frame(-1, ["particles/position",
                                       "particles/velocity"])
    """

    def __init__(self, name, sharding=None, mesh=None):
        """Open ``name`` read-only.

        Args:
            sharding: target ``jax.sharding.Sharding`` (axis 0).  When
                None, one is built from ``mesh`` (or the default 1-D
                mesh over all devices).
        """
        from .. import fl

        if sharding is None:
            from .mesh import make_mesh, row_sharding

            sharding = row_sharding(mesh if mesh is not None else make_mesh())
        self.sharding = sharding
        self.file = fl.open(name, "r")

    @property
    def nframes(self):
        return self.file.nframes

    def __len__(self):
        return self.file.nframes

    def chunk_names(self, prefix=""):
        return self.file.find_matching_chunk_names(prefix)

    def read_frame(self, frame, names, pad=True):
        """Read ``names`` of frame ``frame`` (negative indexes from the
        end) into sharded arrays; returns ``dict name -> jax.Array``."""
        if frame < 0:
            frame += self.file.nframes
        return {
            name: read_sharded_chunk(
                self.file, frame, name, self.sharding, pad=pad
            )
            for name in names
        }

    def close(self):
        self.file.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()


class ShardedFrameWriter:
    """Stream frames of sharded device arrays into a hoomd-schema file.

    The production dump path: you hand it a dict of ``jax.Array`` chunks
    each step; it writes every shard at its offset and completes the frame.
    Unlike :class:`tpgsd.hoomd.HOOMDTrajectory` there is no default/dedup
    scan - every passed chunk is written - which is what a fixed-cadence
    simulation dump wants (the reference's C write loop works the same
    way: pgsd/scripts/benchmark-write.cc:86-130).

    Example:
        writer = ShardedFrameWriter(path, static={"configuration/box": box})
        for step in range(n):
            state = sph_step(state)
            writer.write_frame(
                {"particles/position": state.x, "particles/velocity": state.v},
                step=step,
            )
        writer.close()
    """

    def __init__(
        self,
        name,
        mode="w",
        application="tpgsd.parallel",
        schema="hoomd",
        schema_version=(1, 4),
        static=None,
        comm=None,
    ):
        from .. import fl

        if comm is None:
            from .comm import default_comm

            comm = default_comm()
        self.file = fl.open(
            name,
            mode,
            application=application,
            schema=schema,
            schema_version=list(schema_version),
            comm=comm,
        )
        self._static = dict(static or {})
        self._static_written = False

    def write_frame(self, chunks, step=None):
        """Write one frame: every chunk in ``chunks`` plus, on the first
        frame, the static chunks (box, types, N, ...).

        Args:
            chunks: dict mapping chunk name -> jax/numpy array.
            step: optional ``configuration/step`` value.
        """
        if step is not None:
            self.file.write_chunk(
                "configuration/step",
                numpy.array([step], dtype=numpy.uint64),
                write_all=False,
            )
        if not self._static_written:
            infer_particles_n(chunks, self._static)
            for name, value in self._static.items():
                self.file.write_chunk(name, numpy.asarray(value), write_all=False)
            self._static_written = True
        batch = getattr(self.file, "batched_writes", None)
        if batch is not None:
            # combine the frame's chunk writes into one threaded batch
            with batch():
                for name, array in chunks.items():
                    write_sharded_chunk(self.file, name, array)
        else:
            for name, array in chunks.items():
                write_sharded_chunk(self.file, name, array)
        self.file.end_frame()

    def flush(self):
        self.file.flush()

    def close(self):
        self.file.close()

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self.close()
