from diffulab_tpu.networks.embedders.common import ContextEmbedder, ContextEmbedderOutput
from diffulab_tpu.networks.embedders.precomputed import PrecomputedEmbedder
from diffulab_tpu.networks.embedders.trainable import TrainableTextEmbedder, byte_tokenize

__all__ = [
    "ContextEmbedder",
    "ContextEmbedderOutput",
    "PrecomputedEmbedder",
    "TrainableTextEmbedder",
    "byte_tokenize",
]
