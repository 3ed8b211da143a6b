from hpcclassmultigridproject_tpu.models.advection_diffusion import AdvectionDiffusion

__all__ = ["AdvectionDiffusion"]
