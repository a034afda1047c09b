from diffulab_tpu.networks.embedders.common import ContextEmbedder, ContextEmbedderOutput
from diffulab_tpu.networks.embedders.precomputed import PrecomputedEmbedder

__all__ = ["ContextEmbedder", "ContextEmbedderOutput", "PrecomputedEmbedder"]
