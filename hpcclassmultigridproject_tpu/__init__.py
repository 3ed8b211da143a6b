"""hpcclassmultigridproject_tpu — a TPU-native geometric-multigrid framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
soniareilly/HPCClassMultigridProject (an NYU HPC-class 2-D advection–diffusion
Crank–Nicolson multigrid solver in C++/OpenMP/CUDA; see SURVEY.md).

Layer map (TPU-first):
  core/       grid geometry, problem setup, stencil coefficient fields
  ops/        level kernels (smooth, residual, rhs, transfer) — jnp reference
              implementations plus fused Pallas TPU kernels under ops/pallas
  sparse/     explicit-matrix path: CSR/BSR SpMV + Galerkin RAP coarse operators
  mg/         level hierarchy, V/W-cycles, coarse solves, CN timestepper
  parallel/   device-mesh domain decomposition (GSPMD shardings, shard_map halo
              exchange, coarse-level agglomeration)
  models/     problem families (advection–diffusion flagship, Poisson)
  utils/      io / timing / checkpointing
  native/     C++ host runtime: bit-faithful CPU oracle kernels (ctypes)
"""

__version__ = "0.1.0"

from hpcclassmultigridproject_tpu.config import ProblemConfig, SolverConfig
from hpcclassmultigridproject_tpu.mg.levels import Level, build_hierarchy
from hpcclassmultigridproject_tpu.mg.cycle import mg_cycle, mg_solve
from hpcclassmultigridproject_tpu.mg.timestepper import timestepper

__all__ = [
    "ProblemConfig",
    "SolverConfig",
    "Level",
    "build_hierarchy",
    "mg_cycle",
    "mg_solve",
    "timestepper",
]
