"""LeNet-5 model family (reference quant/models/lenet.py in apple/ml-quant).

Structure parity (lenet.py:67-94): fp conv1 -> relu -> BN(affine=False,
eps=1e-4) -> maxpool -> BN -> QUANTIZED conv2 -> relu -> maxpool -> fp fc1
-> relu -> fp fc2 -> log_softmax. First and last layers stay full
precision, the standard binary-net convention.

TPU-first: NHWC layout; the flatten before fc1 therefore interleaves
channels differently than torch's NCHW flatten — irrelevant to accuracy
since fc1 is learned.
"""

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from quant_tpu.nn.layers import BatchNorm, Conv, Dense, QuantConv2d
from quant_tpu.ops.conv import max_pool2d


class QLeNet5(nn.Module):
    """LeNet-5 with a quantized second conv layer."""

    conv1_filters: int = 20
    conv2_filters: int = 50
    output_classes: int = 10
    x_quant: str = 'fp'
    w_quant: str = 'fp'
    clamp: Optional[dict[str, Any]] = None
    moving_average_mode: str = 'off'
    moving_average_momentum: float = 0.99
    solver_mode: str = 'exact'
    inference_mode: str = 'dense'
    eval_dtype: Optional[Any] = None
    train_dtype: Optional[Any] = None
    pass_fusion: bool = True
    sign_compute: str = 'auto'
    calibrate: bool = False
    # Threshold-folded serving: bn_conv2 (affine-free BN directly
    # before the quantized conv2) folds into per-channel thresholds in
    # packed_params (nn/export.fold_xnor_thresholds); requires binary
    # activations + EMA scales, like the xnor ResNet blocks.
    bn_fold: bool = False

    def _fold(self, train: bool) -> bool:
        return (self.bn_fold and not train
                and self.inference_mode == 'packed'
                and self.w_quant != 'fp' and self.x_quant != 'fp')

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dt = self.eval_dtype if not train else self.train_dtype
        if dt is not None:
            x = x.astype(dt)
        fold = self._fold(train)
        # First layer full precision (reference lenet.py:80-83).
        x = Conv(self.conv1_filters, 5, stride=1, dtype=dt, name='conv1')(x)
        x = BatchNorm(momentum=0.1, epsilon=1e-4, affine=False,
                      name='bn_conv1')(nn.relu(x), train)
        x = max_pool2d(x, kernel_size=2, stride=2)

        # Quantized conv2 preceded by BN (reference lenet.py:85-86).
        if not fold:
            x = BatchNorm(momentum=0.1, epsilon=1e-4, affine=False,
                          name='bn_conv2')(x, train)
        x = QuantConv2d(
            self.conv2_filters, 5,
            x_quant=self.x_quant, w_quant=self.w_quant, clamp=self.clamp,
            stride=1,
            moving_average_mode=self.moving_average_mode,
            moving_average_momentum=self.moving_average_momentum,
            solver_mode=self.solver_mode,
            inference_mode=self.inference_mode,
            eval_dtype=dt,
            train_dtype=self.train_dtype,
            pass_fusion=self.pass_fusion,
            sign_compute=self.sign_compute,
            calibrate=self.calibrate,
            bn_folded=fold,
            name='conv2',
        )(x, train)
        x = nn.relu(x)
        x = max_pool2d(x, kernel_size=2, stride=2)

        x = x.reshape(x.shape[0], -1)  # (N, 4*4*conv2_filters)
        x = Dense(self.conv2_filters * self.output_classes, dtype=dt,
                  name='fc1')(x)
        x = nn.relu(x)
        # Last layer full precision (reference lenet.py:92-94).
        x = Dense(self.output_classes, dtype=dt, name='fc2')(x)
        return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)
