from hpcclassmultigridproject_tpu.mg.levels import Level, build_fine_level, build_hierarchy
from hpcclassmultigridproject_tpu.mg.cycle import (
    fmg_solve,
    mg_cycle,
    mg_solve,
    mg_solve_fixed,
)
from hpcclassmultigridproject_tpu.mg.refine import refined_solve
from hpcclassmultigridproject_tpu.mg.timestepper import timestepper

__all__ = [
    "Level", "build_fine_level", "build_hierarchy",
    "fmg_solve", "mg_cycle", "mg_solve", "mg_solve_fixed", "refined_solve",
    "timestepper",
]
