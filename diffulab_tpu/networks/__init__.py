"""Network architectures (layer L1): denoisers, embedders, vision towers,
REPA encoders, reward models, and the shared NN primitives in ``nn``
(re-exports mirror reference src/diffulab/networks/__init__.py:1-22)."""

from diffulab_tpu.networks import nn
from diffulab_tpu.networks.denoisers.common import Denoiser
from diffulab_tpu.networks.denoisers.ddt import DDT
from diffulab_tpu.networks.denoisers.mmdit import MMDiT
from diffulab_tpu.networks.denoisers.sprint import SprintDiT
from diffulab_tpu.networks.denoisers.unet import UNetModel
from diffulab_tpu.networks.embedders.common import ContextEmbedder, ContextEmbedderOutput
from diffulab_tpu.networks.embedders.hf_text import (
    QwenTextEmbedder,
    SD3TextEmbedder,
    SmolVLMTextEmbedder,
)
from diffulab_tpu.networks.embedders.precomputed import PrecomputedEmbedder
from diffulab_tpu.networks.repa.common import REPA
from diffulab_tpu.networks.repa.dinov2 import DinoV2
from diffulab_tpu.networks.repa.dinov3 import DinoV3
from diffulab_tpu.networks.repa.perceiver_resampler import PerceiverResampler
from diffulab_tpu.networks.rewards.common import RewardModel
from diffulab_tpu.networks.rewards.grpo import PrefGRPORewardModel
from diffulab_tpu.networks.vision_towers.common import VisionTower
from diffulab_tpu.networks.vision_towers.dc_ae import DCAE
from diffulab_tpu.networks.vision_towers.flux2 import Flux2VAE

__all__ = [
    "DCAE",
    "DDT",
    "MMDiT",
    "REPA",
    "ContextEmbedder",
    "ContextEmbedderOutput",
    "Denoiser",
    "DinoV2",
    "DinoV3",
    "Flux2VAE",
    "PerceiverResampler",
    "PrecomputedEmbedder",
    "PrefGRPORewardModel",
    "QwenTextEmbedder",
    "RewardModel",
    "SD3TextEmbedder",
    "SmolVLMTextEmbedder",
    "SprintDiT",
    "UNetModel",
    "VisionTower",
    "nn",
]
