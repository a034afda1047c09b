from diffulab_tpu.training.meters import AverageMeter
from diffulab_tpu.training.trainer import BaseTrainer, Trainer

__all__ = ["AverageMeter", "BaseTrainer", "Trainer"]
