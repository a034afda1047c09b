"""Network architectures (layer L1): denoisers, embedders, vision towers,
REPA encoders, reward models, and the shared NN primitives in ``nn``.

Submodules are imported lazily to keep optional heavy deps (HF torch weight
porting) out of the core import path.
"""

from diffulab_tpu.networks import nn

__all__ = ["nn"]
