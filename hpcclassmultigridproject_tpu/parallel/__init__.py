from hpcclassmultigridproject_tpu.parallel.distributed import (
    fetch,
    initialize,
    is_multiprocess,
    make_global,
)
from hpcclassmultigridproject_tpu.parallel.halo import smooth_distributed
from hpcclassmultigridproject_tpu.parallel.mesh import factor_2d, make_mesh
from hpcclassmultigridproject_tpu.parallel.sharding import (
    level_shardings,
    shard_hierarchy,
    shard_level_data,
)

import jax

from hpcclassmultigridproject_tpu.mg.timestepper import timestepper


def distributed_run(model, mesh, min_local: int = 64):
    """Run a model's full timestepped solve block-partitioned over `mesh`.

    Fine levels are 2-D block-sharded (halo exchange + psum norms inserted by
    GSPMD over ICI); coarse levels agglomerate to replicated.  Returns
    (uT, stats) with uT sharded over the mesh.

    Under a multi-process runtime (jax.distributed initialized,
    parallel/distributed.py) the model's host-local setup arrays are first
    lifted to global jax.Arrays with their level shardings, so the same
    single-controller program runs across hosts (ICI within a host, DCN
    collectives across — GSPMD inserts both).
    """
    from hpcclassmultigridproject_tpu.parallel.sharding import (
        level_shardings,
        shard_level_data,
    )

    shardings = level_shardings(model.levels, mesh, min_local)
    nsteps, cfg = model.problem.num_steps, model.solver

    from hpcclassmultigridproject_tpu.core.layout import crop_field

    n = model.problem.n
    levels, fine_hi, u0 = model.levels, model.fine_hi, model.u0
    if jax.process_count() > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from hpcclassmultigridproject_tpu.parallel.distributed import make_global

        repl = NamedSharding(mesh, P())

        def glob_level(level, s):
            # padded-grid fields carry the level sharding; everything else
            # (the dense coarse inverse) is replicated
            pick = lambda a: s if a.shape == level.padded else repl
            return jax.tree.map(lambda a: make_global(a, pick(a)), level)

        levels = tuple(glob_level(l, s) for l, s in zip(levels, shardings))
        if fine_hi is not None:
            fine_hi = glob_level(fine_hi, shardings[0])
        u0 = make_global(u0, shardings[0])

    @jax.jit
    def run(levels, fine_hi, u0):
        levels = tuple(
            shard_level_data(l, s) for l, s in zip(levels, shardings)
        )
        if fine_hi is not None:
            fine_hi = shard_level_data(fine_hi, shardings[0])
        u0 = jax.lax.with_sharding_constraint(u0, shardings[0])
        uT, stats = timestepper(
            levels, u0, nsteps, cfg, fine_hi=fine_hi, shardings=shardings
        )
        return crop_field(uT, n), stats

    return run(levels, fine_hi, u0)


__all__ = [
    "smooth_distributed",
    "factor_2d",
    "make_mesh",
    "level_shardings",
    "shard_hierarchy",
    "shard_level_data",
    "distributed_run",
    "initialize",
    "is_multiprocess",
    "make_global",
    "fetch",
]
