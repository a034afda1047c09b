from diffulab_tpu.config.compose import compose_config, load_yaml
from diffulab_tpu.config.instantiate import instantiate

__all__ = ["compose_config", "instantiate", "load_yaml"]
