from diffulab_tpu.data.base import BaseDataset, BatchData
from diffulab_tpu.data.cifar10 import CIFAR10Dataset
from diffulab_tpu.data.folder import ImageFolderDataset
from diffulab_tpu.data.loader import DataLoader
from diffulab_tpu.data.mnist import MNISTDataset
from diffulab_tpu.data.synthetic import SyntheticShapesDataset

__all__ = ["BaseDataset", "BatchData", "CIFAR10Dataset", "DataLoader", "ImageFolderDataset", "MNISTDataset", "SyntheticShapesDataset"]
