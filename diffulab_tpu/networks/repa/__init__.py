from diffulab_tpu.networks.repa.common import REPA
from diffulab_tpu.networks.repa.dinov2 import DinoV2
from diffulab_tpu.networks.repa.dinov3 import DinoV3
from diffulab_tpu.networks.repa.perceiver_resampler import PerceiverResampler

__all__ = ["REPA", "DinoV2", "DinoV3", "PerceiverResampler"]
