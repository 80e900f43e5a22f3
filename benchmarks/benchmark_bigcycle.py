#!/usr/bin/env python3
"""Single-chip production cycle at dense-layout-exceeds-HBM scale.

The BASELINE.md north-star workload on ONE chip: an SPH dam break whose
dense cell layout is far larger than HBM (1e8 particles ~ 40 GB of
dense planes vs 16 GB on v5e), run via the slab-sequential step
(``tpgsd.sph.bigstep``), with HOOMD frames streamed through the async
dump runtime, a mid-run close + ``resume()``, and a final fsck
(``tpgsd.pypgsd.PGSDFile.verify``).

    python benchmarks/benchmark_bigcycle.py --n-side 400 --slabs 32 \
        --steps 6 --dump-every 3 --resume-steps 2

Reports steps/s, sustained dump MB/s, and the fsck verdict.  On
tunneled runtimes the D2H link (~30 MB/s) dominates dump time; the
steps/s number is the compute-side truth either way.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-side", type=int, default=400)
    p.add_argument("--slabs", type=int, default=32)
    p.add_argument("--steps", type=int, default=4)
    p.add_argument("--dump-every", type=int, default=3)
    p.add_argument("--resume-steps", type=int, default=1)
    p.add_argument("--file", default="bigcycle.gsd")
    p.add_argument("--keep", action="store_true")
    p.add_argument(
        "--dump-keys", default="position,velocity,density",
        help="comma list of position,velocity,density,pressure",
    )
    p.add_argument("--spill", action="store_true",
                   help="two-tier spill slot layout: main tier at 1.15x "
                        "the densest initial cell (vs the single-tier "
                        "1.5x) + a flag-skipped spill tier")
    args = p.parse_args(argv)

    import jax
    import numpy

    from tpgsd.io_runtime import AsyncDumpRunner
    from tpgsd.parallel import ShardedFrameWriter
    from tpgsd.sph import dam_break, make_slab_step_fn, resume

    t0 = time.perf_counter()
    db = dam_break(
        n_side=args.n_side, capacity="auto", on_device=True,
        capacity_headroom=1.15 if args.spill else 1.5,
    )
    print(
        "n=%.3e dims=%s capacity=%d slabs=%d (built %.0f s)"
        % (db.n, db.grid.dims, db.grid.capacity, args.slabs,
           time.perf_counter() - t0),
        flush=True,
    )
    # donate the state: without donation two full states plus the
    # step's working set exceed HBM at 1e8.  Donation means dumped
    # arrays must be fetched to host numpy BEFORE the next step call
    # (the donated buffer is reused) - sync D2H below.
    step = jax.jit(
        make_slab_step_fn(
            db.grid, db.params, n_slabs=args.slabs,
            spill=args.spill, use_pallas="auto" if not args.spill else True,
        ),
        donate_argnums=0,
    )

    keys = args.dump_keys.split(",")

    def frame_of(state, rho, pres):
        # synchronous D2H: the state buffers are donated to the next
        # step call, so they must be safely on the host first
        f = {}
        if "position" in keys:
            f["particles/position"] = numpy.asarray(state.x)
        if "velocity" in keys:
            f["particles/velocity"] = numpy.asarray(state.v)
        if "density" in keys:
            f["particles/density"] = numpy.asarray(rho)
        if "pressure" in keys:
            f["particles/pressure"] = numpy.asarray(pres)
        return f

    t0 = time.perf_counter()
    state, (rho, pres, covf, wovf) = step(db.state)
    jax.block_until_ready(state.x)
    print(
        "compile+first step %.0f s  cell_ovf=%d win_ovf=%d"
        % (time.perf_counter() - t0, int(covf), int(wovf)),
        flush=True,
    )

    # ---- phase 1: simulate + overlapped dumps ----
    t0 = time.perf_counter()
    step_s = 0.0
    with AsyncDumpRunner(ShardedFrameWriter(args.file), depth=2) as dump:
        for i in range(1, args.steps):
            ts = time.perf_counter()
            state, (rho, pres, covf, wovf) = step(state)
            jax.block_until_ready(state.x)
            if i % args.dump_every == 0:
                td = time.perf_counter()
                dump.submit(frame_of(state, rho, pres), step=i)
                print(
                    "    D2H+enqueue %.0f s" % (time.perf_counter() - td),
                    flush=True,
                )
            step_s += time.perf_counter() - ts
            print(
                "  step %d: %.1f s (ovf %d/%d)"
                % (i, time.perf_counter() - ts, int(covf), int(wovf)),
                flush=True,
            )
        dump.flush()
    wall = time.perf_counter() - t0
    s = dump.stats
    print(
        "phase1: %d steps in %.0f s (%.1f s/step compute), "
        "%d frames %.2f GB, dump %.1f MB/s sustained"
        % (
            args.steps - 1,
            wall,
            step_s / max(args.steps - 1, 1),
            s.frames,
            s.bytes / 1e9,
            s.bytes / 1e6 / wall,
        ),
        flush=True,
    )

    # ---- phase 2: resume and continue ----
    # free phase 1's device references first: state + rho + pres are
    # ~3.2 GB at 1e8 and the resumed state needs that room
    del state, rho, pres
    state2, last_step, writer, _ = resume(args.file)
    print(
        "resumed at step %d (%d frames)" % (last_step, writer.file.nframes),
        flush=True,
    )
    with AsyncDumpRunner(writer, depth=2) as dump:
        for i in range(args.resume_steps):
            state2, (rho, pres, covf, wovf) = step(state2)
        dump.submit(frame_of(state2, rho, pres), step=int(last_step) + args.resume_steps)
        dump.flush()
    print("post-resume frames: %d" % dump.stats.frames, flush=True)

    # ---- phase 3: fsck ----
    import tpgsd.pypgsd

    with open(args.file, "rb") as fh:
        report = tpgsd.pypgsd.verify(fh, deep=True)
    print(
        "fsck: %d frames %d chunks %.2f GB, %s"
        % (
            report["frames"],
            report["chunks"],
            report["data_bytes"] / 1e9,
            "CLEAN" if report["ok"] else report["errors"],
        ),
        flush=True,
    )

    if not args.keep:
        try:
            os.unlink(args.file)
        except OSError:
            pass
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
