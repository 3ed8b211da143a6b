from hpcclassmultigridproject_tpu.mg.levels import Level, build_hierarchy
from hpcclassmultigridproject_tpu.mg.cycle import mg_cycle, mg_solve
from hpcclassmultigridproject_tpu.mg.timestepper import timestepper

__all__ = ["Level", "build_hierarchy", "mg_cycle", "mg_solve", "timestepper"]
