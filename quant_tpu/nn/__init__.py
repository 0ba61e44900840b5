"""flax.linen modules: quantized layers and model families.

State design (the functional answer to the reference's `register_buffer`
caching and EMA modules, SURVEY.md §7 hard-part 3):

* ``params``       — trainable parameters (kernels, biases, BN affine).
* ``batch_stats``  — BatchNorm running statistics (flax convention).
* ``quant_state``  — quantizer state: cached per-out-channel weight scales
  (reference weight_quantization.py buffers) and activation-scale EMA
  (reference MovingAverage buffers). Updated only when the collection is
  marked mutable in `Module.apply` — which the train step does and the eval
  step does not, reproducing the reference's train-computes/eval-reuses
  contract without any in-place mutation races.
"""

from quant_tpu.nn.layers import (
    ActivationQuantizer,
    BatchNorm,
    Conv,
    Dense,
    QuantConv2d,
    WeightQuantizer,
    scheme_num_scales,
    validate_scheme,
)
from quant_tpu.nn.lenet import QLeNet5
from quant_tpu.nn.resnet import (
    QResNet,
    RegularBasicBlock,
    RegularBottleneckBlock,
    XnorBasicBlock,
    XnorBottleneckBlock,
)

MODEL_REGISTRY = {
    'lenet5': QLeNet5,
    'resnet': QResNet,
}

__all__ = [
    'ActivationQuantizer', 'BatchNorm', 'Conv', 'Dense', 'QuantConv2d',
    'WeightQuantizer', 'scheme_num_scales', 'validate_scheme',
    'QLeNet5', 'QResNet', 'RegularBasicBlock', 'RegularBottleneckBlock',
    'XnorBasicBlock', 'XnorBottleneckBlock',
    'MODEL_REGISTRY',
]
