"""Headline benchmark: parallel trajectory write throughput.

Mirrors the reference's benchmark-write workload - 17 chunk names x 100
frames x 8 MiB per chunk ~ 14.26 GB total (reference:
pgsd/scripts/benchmark-write.cc:20-130 uses 2^20 float64 per key; here the
same byte count is 2^21 float32, the TPU-native dtype) - driven through
the tpgsd production dump path:

* frame data is produced ON the accelerator every frame (fresh bytes, no
  host caching),
* the async dump runtime (``tpgsd.io_runtime``) overlaps each frame's
  device->host DMA with the previous frame's positioned file writes,
* every chunk lands at its precomputed offset with one index entry.

Baseline: 167.0 MB/s - the reference's published single-node number
(reference: CHANGELOG.md:172-189; flat across 1/2/4/8 ranks, disk-bound).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N/167.0}

Environment knobs:
    TPGSD_BENCH_FRAMES  frames to write (default 100, the reference count)
    TPGSD_BENCH_KEYS    chunk names per frame (default 17)
    TPGSD_BENCH_BYTES   bytes per chunk (default 8 MiB)
    TPGSD_BENCH_DIR     directory for the scratch file (default $TMPDIR)
    TPGSD_BENCH_SYNC    "1" = skip the async runtime (serialized dump)
"""

import json
import os
import sys
import tempfile
import time

BASELINE_MB_S = 167.0


def _device_producer(n_keys, n_elems):
    """Jitted per-frame data producer on the accelerator (or None)."""
    try:
        import jax
        import jax.numpy as jnp
    except Exception:
        return None, "numpy"

    @jax.jit
    def produce(seed):
        key = jax.random.PRNGKey(seed)
        return jax.random.uniform(key, (n_keys, n_elems), jnp.float32)

    # warm up: compile + first device->host transfer (the first D2H pays a
    # one-time transfer-path setup cost that must not pollute the timing)
    import numpy

    block = jax.block_until_ready(produce(0))
    numpy.asarray(block[0])
    return produce, jax.default_backend()


def run():
    frames = int(os.environ.get("TPGSD_BENCH_FRAMES", 100))
    n_keys = int(os.environ.get("TPGSD_BENCH_KEYS", 17))
    chunk_bytes = int(os.environ.get("TPGSD_BENCH_BYTES", 8 << 20))
    bench_dir = os.environ.get("TPGSD_BENCH_DIR", tempfile.gettempdir())
    sync = os.environ.get("TPGSD_BENCH_SYNC", "0") == "1"
    n_elems = chunk_bytes // 4  # float32

    import numpy

    from tpgsd.io_runtime import AsyncDumpRunner
    from tpgsd.parallel import ShardedFrameWriter

    produce, backend = _device_producer(n_keys, n_elems)
    if produce is None:
        rng = numpy.random.RandomState(0)
        fixed = rng.rand(n_keys, n_elems).astype(numpy.float32)

        def produce(seed):
            return fixed

    names = ["data/k%02d" % i for i in range(n_keys)]
    bytes_per_frame = n_keys * chunk_bytes
    total_bytes = bytes_per_frame * frames

    path = os.path.join(bench_dir, "tpgsd_bench_write.gsd")
    try:
        start = time.perf_counter()
        writer = ShardedFrameWriter(
            path, application="tpgsd.bench", schema="none", schema_version=(1, 0)
        )
        if sync:
            for f in range(frames):
                block = produce(f)
                writer.write_frame(
                    {name: block[i] for i, name in enumerate(names)}
                )
            writer.close()
        else:
            with AsyncDumpRunner(writer, depth=2) as dump:
                for f in range(frames):
                    block = produce(f)
                    dump.submit({name: block[i] for i, name in enumerate(names)})
        elapsed = time.perf_counter() - start

        # readback verification (reference: benchmark-write.cc:176-190)
        import tpgsd.fl

        with tpgsd.fl.open(name=path, mode="r") as f:
            assert f.nframes == frames, f.nframes
            assert f.nnames == n_keys, f.nnames
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass

    mb_s = total_bytes / 1e6 / elapsed
    print(
        json.dumps(
            {
                "metric": "parallel write throughput (%d keys x %d frames x %d MiB, %s-resident, overlapped)"
                % (n_keys, frames, chunk_bytes >> 20, backend),
                "value": round(mb_s, 1),
                "unit": "MB/s",
                "vs_baseline": round(mb_s / BASELINE_MB_S, 3),
            }
        )
    )
    print(
        "# %.2f GB in %.1f s (%d frames, %.1f ms/frame)"
        % (total_bytes / 1e9, elapsed, frames, elapsed / frames * 1e3),
        file=sys.stderr,
    )


if __name__ == "__main__":
    run()
