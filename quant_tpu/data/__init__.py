"""Input pipelines.

The reference wraps torchvision datasets in a QuantDataLoader ABC
(quant/data/data_loaders.py:18-61). Here datasets are read natively from
their on-disk binary formats (MNIST idx, CIFAR pickle, ImageNet folder)
into host numpy arrays, augmented with vectorized numpy ops, and streamed
as ready-to-device NHWC float32 batches. No framework dependency on torch.
"""

from quant_tpu.data.loaders import (
    QuantDataLoader,
    MNISTDataLoader,
    CIFAR10DataLoader,
    CIFAR100DataLoader,
    ImageNetDataLoader,
    SyntheticDataLoader,
    DATASET_REGISTRY,
)

__all__ = [
    'QuantDataLoader', 'MNISTDataLoader', 'CIFAR10DataLoader',
    'CIFAR100DataLoader', 'ImageNetDataLoader', 'SyntheticDataLoader',
    'DATASET_REGISTRY',
]
