from hpcclassmultigridproject_tpu.models.advection_diffusion import AdvectionDiffusion
from hpcclassmultigridproject_tpu.models.poisson import (
    Poisson,
    build_poisson_hierarchy,
    poisson_level,
)

__all__ = [
    "AdvectionDiffusion",
    "Poisson",
    "build_poisson_hierarchy",
    "poisson_level",
]
