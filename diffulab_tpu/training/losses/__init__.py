from diffulab_tpu.training.losses.common import LossFunction
from diffulab_tpu.training.losses.repa import RepaLoss

__all__ = ["LossFunction", "RepaLoss"]
