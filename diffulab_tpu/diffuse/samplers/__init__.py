from diffulab_tpu.diffuse.samplers.common import FlowSampler, GaussianSampler, Sampler, StepResult
from diffulab_tpu.diffuse.samplers.flow import Euler, EulerMaruyama, Heun, UniPC
from diffulab_tpu.diffuse.samplers.gaussian import DDIM, DDPM

__all__ = [
    "DDIM",
    "DDPM",
    "Euler",
    "EulerMaruyama",
    "Heun",
    "FlowSampler",
    "GaussianSampler",
    "Sampler",
    "StepResult",
    "UniPC",
]
