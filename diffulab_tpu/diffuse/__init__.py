from diffulab_tpu.diffuse.diffuser import Diffuser
from diffulab_tpu.diffuse.edm import EDM
from diffulab_tpu.diffuse.flow import Flow
from diffulab_tpu.diffuse.gaussian_diffusion import GaussianDiffusion
from diffulab_tpu.diffuse.schedules import (
    betas_for_alpha_bar,
    extract_into_tensor,
    get_variance_schedule,
    shift_timestep,
    space_timesteps,
)

__all__ = [
    "Diffuser",
    "EDM",
    "Flow",
    "GaussianDiffusion",
    "betas_for_alpha_bar",
    "extract_into_tensor",
    "get_variance_schedule",
    "shift_timestep",
    "space_timesteps",
]
