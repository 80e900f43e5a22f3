"""Multi-chip SPH: the step jitted over a sharded particle axis.

The particle arrays carry ``NamedSharding(mesh, P("shard"))``; XLA/GSPMD
inserts the collectives for the scatter into the (replicated) cell layout
and back - the annotate-and-let-XLA-place-comms recipe.  Numerical results
must match the single-device run bit-for-bit modulo reduction order.
"""

import numpy
import numpy.testing
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from tpgsd.parallel import make_mesh  # noqa: E402
from tpgsd.sph import SPHState, dam_break, make_step_fn  # noqa: E402


def test_sharded_step_matches_single_device():
    db = dam_break(n_side=6)
    n = db.n
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("shard"))

    # pad particle count to the mesh size
    pad = (-n) % 8
    x = jnp.pad(db.state.x, ((0, pad), (0, 0)))
    # park padding particles in a far corner, motionless and isolated
    x = x.at[n:].set(jnp.asarray(db.box, jnp.float32) * 0.999)
    v = jnp.pad(db.state.v, ((0, pad), (0, 0)))

    step = make_step_fn(db.grid, db.params)

    # single device rollout
    state = SPHState(x=x, v=v)
    s1 = state
    step_j = jax.jit(step)
    for _ in range(5):
        s1, aux1 = step_j(s1)

    # sharded rollout
    step_sharded = jax.jit(
        step,
        in_shardings=(SPHState(x=sharding, v=sharding),),
        out_shardings=(
            SPHState(x=sharding, v=sharding),
            (sharding, sharding, None),
        ),
    )
    s2 = SPHState(x=jax.device_put(x, sharding), v=jax.device_put(v, sharding))
    for _ in range(5):
        s2, aux2 = step_sharded(s2)

    assert s2.x.sharding.is_equivalent_to(sharding, s2.x.ndim)
    numpy.testing.assert_allclose(
        numpy.asarray(s1.x)[:n], numpy.asarray(s2.x)[:n], rtol=2e-4, atol=2e-5
    )
    numpy.testing.assert_allclose(
        numpy.asarray(s1.v)[:n], numpy.asarray(s2.v)[:n], rtol=2e-3, atol=2e-4
    )
    numpy.testing.assert_allclose(
        numpy.asarray(aux1[0])[:n], numpy.asarray(aux2[0])[:n], rtol=2e-4
    )


def test_sharded_dump_loop(tmp_path):
    """The full coupled loop: sharded SPH step + sharded frame dump."""
    import tpgsd.hoomd
    from tpgsd.parallel import ShardedFrameWriter

    db = dam_break(n_side=6)
    n = db.n
    mesh = make_mesh()
    sharding = NamedSharding(mesh, P("shard"))
    pad = (-n) % 8
    x = jnp.pad(db.state.x, ((0, pad), (0, 0)))
    x = x.at[n:].set(jnp.asarray(db.box, jnp.float32) * 0.999)
    v = jnp.pad(db.state.v, ((0, pad), (0, 0)))

    step = jax.jit(
        make_step_fn(db.grid, db.params),
        in_shardings=(SPHState(x=sharding, v=sharding),),
        out_shardings=(
            SPHState(x=sharding, v=sharding),
            (sharding, sharding, None),
        ),
    )

    state = SPHState(x=jax.device_put(x, sharding), v=jax.device_put(v, sharding))
    fname = tmp_path / "dam.gsd"
    from tpgsd.parallel.shard_io import write_sharded_chunk

    import tpgsd.fl

    with tpgsd.fl.open(
        name=fname, mode="w", application="t", schema="hoomd", schema_version=[1, 4]
    ) as f:
        f.write_chunk(
            "particles/N", numpy.array([n], numpy.uint32), write_all=False
        )
        for i in range(3):
            state, (rho, p, _) = step(state)
            write_sharded_chunk(f, "particles/position", state.x, n_rows=n)
            write_sharded_chunk(f, "particles/velocity", state.v, n_rows=n)
            write_sharded_chunk(f, "particles/density", rho, n_rows=n)
            write_sharded_chunk(f, "particles/pressure", p, n_rows=n)
            f.end_frame()

    with tpgsd.hoomd.open(fname, mode="r") as traj:
        assert len(traj) == 3
        s = traj[2]
        assert s.particles.N == n
        assert s.particles.position.shape == (n, 3)
        assert numpy.isfinite(s.particles.position).all()
        assert numpy.isfinite(s.particles.density).all()
        numpy.testing.assert_allclose(
            s.particles.position, numpy.asarray(state.x)[:n], rtol=1e-6
        )
