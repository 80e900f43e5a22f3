#!/usr/bin/env python3
"""SPH stepper benchmark: steps/sec and particle-steps/sec.

Runs the dam-break workload with the jnp pair loops and (optionally)
the Pallas windowed-stencil kernels, reporting wall time per step after
a warm-up.  The frame-producer speed bounds the overlapped dump rate
(BASELINE north star: frames/sec with the SPH step fully overlapped).

    python benchmarks/benchmark_sph.py --n-side 20 --steps 30 --pallas
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def bench_step(step, state, steps):
    """Per-step wall time with FORCED device completion.

    ``block_until_ready`` can return before the device finishes on
    tunneled/remote runtimes, so each step is forced by reading back a
    scalar reduction of the new state; the standalone readback cost is
    measured and subtracted.
    """
    import jax
    import jax.numpy as jnp

    def force(s):
        return float(jnp.sum(s.x))

    state, aux = step(state)  # compile + first run
    force(state)
    # scalar readback costs tens of ms on tunneled runtimes; measure it
    # and amortize it over `steps` chained steps per forced readback
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        force(state)
    base = (time.perf_counter() - t0) / reps

    t0 = time.perf_counter()
    for _ in range(steps):
        state, aux = step(state)
    force(state)  # forces the whole chain
    per = (time.perf_counter() - t0 - base) / steps
    return max(per, 1e-9), state


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n-side", type=int, default=20)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--block", type=int, default=32, help="jnp cell block")
    p.add_argument("--pallas", action="store_true",
                   help="also benchmark the Pallas kernels")
    p.add_argument("--pallas-block", type=int, default=8)
    p.add_argument("--capacity", default="auto",
                   help='cell slot capacity (int or "auto", the default: '
                        "sized to the initial lattice occupancy)")
    p.add_argument("--slabs", type=int, default=0, metavar="S",
                   help="also benchmark the slab-sequential big step "
                        "with S slabs (0 = skip)")
    p.add_argument("--spill", action="store_true",
                   help="also benchmark the two-tier spill layout "
                        "(main tier sized at 1.15x the densest initial "
                        "cell instead of the single-tier 1.5x)")
    p.add_argument("--decomp", choices=["slab", "2d", "3d"], default=None,
                   help="also benchmark the explicit domain decomposition "
                        "(shard_map + ppermute halos + migration) on a "
                        "best-fit mesh over the available devices - on one "
                        "device this measures the pure halo-machinery "
                        "overhead vs the global step")
    p.add_argument("--density-mode", choices=["summation", "continuity"],
                   default="summation",
                   help="density formulation for the jnp/pallas/spill/"
                        "decomp rows (continuity seeds rho with "
                        "init_density; the fused accel+drho kernels)")
    p.add_argument("--cpu", type=int, default=0, metavar="N",
                   help="force N virtual CPU devices")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu)

    from tpgsd.sph import dam_break, init_density, make_step_fn

    cap = args.capacity if args.capacity == "auto" else int(args.capacity)
    db = dam_break(n_side=args.n_side, capacity=cap)
    if args.density_mode == "continuity":
        db = db._replace(state=init_density(db.state, db.grid, db.params))
    print(
        "backend=%s particles=%d cells=%s capacity=%d"
        % (jax.default_backend(), db.n, db.grid.dims, db.grid.capacity)
    )

    # the builder default is now the champion auto config; this row is
    # the explicit jnp reference, so pin the path
    step = jax.jit(make_step_fn(db.grid, db.params, block=args.block,
                                use_pallas=False, density_mode=args.density_mode))
    dt, _ = bench_step(step, db.state, args.steps)
    print(
        "jnp    : %8.2f ms/step  %12.3g particle-steps/s"
        % (dt * 1e3, db.n / dt)
    )

    if args.pallas:
        step_p = jax.jit(
            make_step_fn(
                db.grid, db.params, use_pallas=True, spill=False,
                pallas_block=args.pallas_block,
                density_mode=args.density_mode,
            )
        )
        dt_p, _ = bench_step(step_p, db.state, args.steps)
        print(
            "pallas : %8.2f ms/step  %12.3g particle-steps/s  (%.2fx)"
            % (dt_p * 1e3, db.n / dt_p, dt / dt_p)
        )

    if args.spill:
        import numpy
        from tpgsd.sph.cells import auto_capacity

        ka = auto_capacity(
            numpy.asarray(db.state.x), (0.0, 0.0, 0.0), db.box,
            2.0 * db.params.h, headroom=1.15,
        )
        ka = min(max(ka, 24), 64)  # the packed-tier supported range
        step_sp = jax.jit(
            make_step_fn(
                db.grid._replace(capacity=ka), db.params,
                use_pallas=True, spill=True,
                density_mode=args.density_mode,
            )
        )
        dt_sp, _ = bench_step(step_sp, db.state, args.steps)
        print(
            "spill%-3d: %7.2f ms/step  %12.3g particle-steps/s  (%.2fx)"
            % (ka, dt_sp * 1e3, db.n / dt_sp, dt / dt_sp)
        )

    if args.decomp:
        import numpy
        from tpgsd.parallel import make_mesh, make_mesh2d, make_mesh3d
        from tpgsd.sph import (
            distribute_state,
            distribute_state_2d,
            distribute_state_3d,
            make_distributed_step_fn,
            make_distributed2d_step_fn,
            make_distributed3d_step_fn,
        )

        n_dev = len(jax.devices())
        dims = db.grid.dims
        nd = {"slab": 1, "2d": 2, "3d": 3}[args.decomp]
        best = [(1,) * nd]

        def rec(ax, rem, cur):
            if ax == nd:
                key = (int(numpy.prod(cur)), -sum(cur))
                if key > (int(numpy.prod(best[0])), -sum(best[0])):
                    best[0] = tuple(cur)
                return
            for d in range(1, rem + 1):
                if rem % d == 0 and dims[ax] % d == 0:
                    rec(ax + 1, rem // d, cur + [d])

        rec(0, n_dev, [])
        shape = best[0]
        if nd == 1:
            mesh = make_mesh(n_devices=shape[0])
            dist, dcap = distribute_state(db.state, db.grid, mesh)
            builder = make_distributed_step_fn
        elif nd == 2:
            mesh = make_mesh2d(shape=shape)
            dist, dcap = distribute_state_2d(db.state, db.grid, mesh)
            builder = make_distributed2d_step_fn
        else:
            mesh = make_mesh3d(shape=shape)
            dist, dcap = distribute_state_3d(db.state, db.grid, mesh)
            builder = make_distributed3d_step_fn
        step_d = builder(db.grid, db.params, mesh, capacity=dcap,
                         use_pallas=False,
                         density_mode=args.density_mode)
        dt_d, _ = bench_step(step_d, dist, args.steps)
        print(
            "%s%-5s: %7.2f ms/step  %12.3g particle-steps/s  "
            "(%.2fx vs global; mesh %s, %d slots/device)"
            % (args.decomp, str(shape), dt_d * 1e3, db.n / dt_d,
               dt / dt_d, shape, dcap)
        )
        if args.spill:
            # the champion at scale: spill kernels inside the
            # decomposed block step (main tier at 1.15x typical
            # occupancy, per-device 2K-slot layout)
            import numpy as _np
            from tpgsd.sph.cells import auto_capacity as _ac

            ka = _ac(
                _np.asarray(db.state.x), (0.0, 0.0, 0.0), db.box,
                2.0 * db.params.h, headroom=1.15,
            )
            ka = min(max(ka, 24), 64)
            step_ds = builder(
                db.grid._replace(capacity=ka), db.params, mesh,
                capacity=dcap, use_pallas=True, spill=True,
                density_mode=args.density_mode,
            )
            dt_ds, _ = bench_step(step_ds, dist, args.steps)
            print(
                "%s+spill%-2d: %7.2f ms/step  %12.3g particle-steps/s  "
                "(%.2fx vs global)"
                % (args.decomp, ka, dt_ds * 1e3, db.n / dt_ds, dt / dt_ds)
            )

    if args.slabs:
        from tpgsd.sph import make_slab_step_fn

        step_s = jax.jit(
            make_slab_step_fn(db.grid, db.params, n_slabs=args.slabs,
                              spill=False)
        )
        dt_s, _ = bench_step(step_s, db.state, args.steps)
        print(
            "slab%-3d: %8.2f ms/step  %12.3g particle-steps/s"
            % (args.slabs, dt_s * 1e3, db.n / dt_s)
        )


if __name__ == "__main__":
    main()
