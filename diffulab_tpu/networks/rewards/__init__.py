from diffulab_tpu.networks.rewards.common import RewardModel
from diffulab_tpu.networks.rewards.grpo import PrefGRPORewardModel

__all__ = ["PrefGRPORewardModel", "RewardModel"]
