"""QResNet model family (reference quant/models/resnet.py in apple/ml-quant).

Parity map:
  * RegularBasicBlock (resnet.py:28-97): conv->BN->nonlin ordering,
    bias-free quantized 3x3 convs, fp 1x1+BN downsample shortcut.
  * XnorBasicBlock (resnet.py:100-190): XNOR-Net BN->quant-conv->nonlin
    ordering, biased 3x3 convs, optional Bi-Real double shortcut.
  * QResNet (resnet.py:193-397): fp conv1 stem (+BN+relu+optional maxpool),
    four stages of 2x-widening blocks with per-stage quant config, fp
    global-avg-pool + linear head. Full-precision stem / shortcuts / head
    is the standard binary-net accuracy recipe (Bi-Real Net).

TPU-first: NHWC layout throughout; blocks are flax modules returning pure
outputs; BN statistics live in 'batch_stats', quantizer scales in
'quant_state'.
"""

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from quant_tpu.nn.layers import BatchNorm, Conv, PReLU, QuantConv2d
from quant_tpu.ops.conv import global_avg_pool, max_pool2d


def _nonlin(name: str, module_name: str) -> Callable:
    if name == 'relu':
        return nn.relu
    if name == 'prelu':
        # torch PReLU: single shared slope initialized to 0.25.
        return PReLU(negative_slope_init=0.25, name=module_name)
    if name == 'identity':
        return lambda x: x
    raise ValueError(f'Non-linearity {name} is not supported.')


class _Shortcut(nn.Module):
    """Full-precision 1x1 conv + BN downsample (reference resnet.py:78-89)."""

    planes: int
    stride: int
    use_bias: bool
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.stride == 1 and x.shape[-1] == self.planes:
            return x
        y = Conv(self.planes, 1, stride=self.stride, use_bias=self.use_bias,
                 dtype=self.dtype, name='conv')(x)
        return BatchNorm(dtype=self.dtype, name='norm')(y, train)


class RegularBasicBlock(nn.Module):
    """conv->BN->nonlin basic block with quantized 3x3 convs."""

    planes: int
    x_quant: str
    w_quant: str
    nonlins: Sequence[str]
    stride: int = 1
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
    # Serving with export-time BN folding (nn/export.fold_bn_into_packed):
    # eval-mode BN is a per-out-channel affine that is ALREADY inside the
    # packed conv's scale epilogue (w_scales *= gamma/sqrt(var+eps),
    # b_fold) — skip the separate BN pass. conv->BN ordering only; the
    # Xnor blocks (BN precedes the conv) ignore this flag.
    bn_fold: bool = False

    def _fold(self, train: bool) -> bool:
        return (self.bn_fold and not train
                and self.inference_mode == 'packed'
                and self.w_quant != 'fp')

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if len(self.nonlins) != 2:
            raise ValueError('There should be 2 non-linearities.')
        dt = self.eval_dtype if not train else self.train_dtype
        fold = self._fold(train)
        qconv = dict(
            x_quant=self.x_quant, w_quant=self.w_quant, clamp=self.clamp,
            moving_average_mode=self.moving_average_mode,
            moving_average_momentum=self.moving_average_momentum,
            solver_mode=self.solver_mode,
            inference_mode=self.inference_mode, eval_dtype=dt,
            train_dtype=self.train_dtype,
            pass_fusion=self.pass_fusion,
            sign_compute=self.sign_compute,
            calibrate=self.calibrate,
            bn_folded=fold,
            use_bias=False, padding=1,
        )
        out = QuantConv2d(self.planes, 3, stride=self.stride,
                          name='conv1', **qconv)(x, train)
        if not fold:
            out = BatchNorm(dtype=dt, name='bn1')(out, train)
        out = _nonlin(self.nonlins[0], 'nonlin1')(out)
        out = QuantConv2d(self.planes, 3, stride=1,
                          name='conv2', **qconv)(out, train)
        if not fold:
            out = BatchNorm(dtype=dt, name='bn2')(out, train)
        out = out + _Shortcut(self.planes, self.stride, use_bias=False,
                              dtype=dt, name='shortcut')(x, train)
        return _nonlin(self.nonlins[1], 'nonlin2')(out)


class XnorBasicBlock(nn.Module):
    """BN->quant-conv->nonlin block (XNOR-Net ordering), optional Bi-Real
    double shortcut (reference resnet.py:100-190)."""

    planes: int
    x_quant: str
    w_quant: str
    nonlins: Sequence[str]
    stride: int = 1
    double_shortcut: bool = False
    # Serving with export-time THRESHOLD folding
    # (nn/export.fold_xnor_thresholds): Xnor ordering puts BN before
    # the conv, where its eval affine feeds only clamp+sign extraction
    # — folded into per-channel thresholds in packed_params, so the BN
    # modules are skipped and the BN'd map is never materialized.
    # Requires binary activations + an EMA moving-average mode.
    bn_fold: bool = False
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

    def _fold(self, train: bool) -> bool:
        return (self.bn_fold and not train
                and self.inference_mode == 'packed'
                and self.w_quant != 'fp' and self.x_quant != 'fp')

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if len(self.nonlins) != 2:
            raise ValueError('There should be 2 non-linearities.')
        dt = self.eval_dtype if not train else self.train_dtype
        fold = self._fold(train)
        qconv = dict(
            x_quant=self.x_quant, w_quant=self.w_quant, clamp=self.clamp,
            moving_average_mode=self.moving_average_mode,
            moving_average_momentum=self.moving_average_momentum,
            solver_mode=self.solver_mode,
            inference_mode=self.inference_mode, eval_dtype=dt,
            train_dtype=self.train_dtype,
            pass_fusion=self.pass_fusion,
            sign_compute=self.sign_compute,
            calibrate=self.calibrate,
            bn_folded=fold,
            use_bias=True, padding=1,
        )
        shortcut = _Shortcut(self.planes, self.stride, use_bias=True,
                             dtype=dt, name='shortcut')

        out1 = x if fold else BatchNorm(dtype=dt, name='bn1')(x, train)
        out1 = QuantConv2d(self.planes, 3, stride=self.stride,
                           name='conv1', **qconv)(out1, train)
        out1 = _nonlin(self.nonlins[0], 'nonlin1')(out1)
        if self.double_shortcut:
            out1 = out1 + shortcut(x, train)

        out2 = out1 if fold else BatchNorm(dtype=dt, name='bn2')(out1,
                                                                 train)
        out2 = QuantConv2d(self.planes, 3, stride=1,
                           name='conv2', **qconv)(out2, train)
        if self.double_shortcut:
            return _nonlin(self.nonlins[1], 'nonlin2')(out2) + out1
        out2 = out2 + shortcut(x, train)
        return _nonlin(self.nonlins[1], 'nonlin2')(out2)


class RegularBottleneckBlock(nn.Module):
    """1x1-reduce -> 3x3 -> 1x1-expand bottleneck (ResNet-50 family),
    conv->BN->nonlin ordering.

    Beyond-reference extension: apple/ml-quant ships only basic blocks
    (resnet.py:28-190); this adds the deeper family with the same
    quantization contract — quantized convs, fp 1x1+BN shortcut, fp
    stem/head handled by QResNet. `nonlins` keeps the reference's
    two-entry schema: nonlins[0] follows bn1/bn2 (internal), nonlins[1]
    is the post-residual activation.
    """

    expansion = 4

    planes: int
    x_quant: str
    w_quant: str
    nonlins: Sequence[str]
    stride: int = 1
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
    bn_fold: bool = False  # see RegularBasicBlock.bn_fold

    def _fold(self, train: bool) -> bool:
        return (self.bn_fold and not train
                and self.inference_mode == 'packed'
                and self.w_quant != 'fp')

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if len(self.nonlins) != 2:
            raise ValueError('There should be 2 non-linearities.')
        dt = self.eval_dtype if not train else self.train_dtype
        fold = self._fold(train)
        qconv = dict(
            x_quant=self.x_quant, w_quant=self.w_quant, clamp=self.clamp,
            moving_average_mode=self.moving_average_mode,
            moving_average_momentum=self.moving_average_momentum,
            solver_mode=self.solver_mode,
            inference_mode=self.inference_mode, eval_dtype=dt,
            train_dtype=self.train_dtype,
            pass_fusion=self.pass_fusion,
            sign_compute=self.sign_compute,
            calibrate=self.calibrate,
            bn_folded=fold,
            use_bias=False,
        )
        out = QuantConv2d(self.planes, 1, stride=1, padding=0,
                          name='conv1', **qconv)(x, train)
        if not fold:
            out = BatchNorm(dtype=dt, name='bn1')(out, train)
        out = _nonlin(self.nonlins[0], 'nonlin1')(out)
        out = QuantConv2d(self.planes, 3, stride=self.stride, padding=1,
                          name='conv2', **qconv)(out, train)
        if not fold:
            out = BatchNorm(dtype=dt, name='bn2')(out, train)
        out = _nonlin(self.nonlins[0], 'nonlin2')(out)
        out = QuantConv2d(self.planes * self.expansion, 1, stride=1,
                          padding=0, name='conv3', **qconv)(out, train)
        if not fold:
            out = BatchNorm(dtype=dt, name='bn3')(out, train)
        out = out + _Shortcut(self.planes * self.expansion, self.stride,
                              use_bias=False, dtype=dt,
                              name='shortcut')(x, train)
        return _nonlin(self.nonlins[1], 'nonlin3')(out)


class XnorBottleneckBlock(nn.Module):
    """Bottleneck with XNOR-Net ordering: BN -> quant-conv -> nonlin per
    sub-conv, biased convs, single fp shortcut around the whole block.

    Bi-Real's double shortcut is defined for equal-width basic blocks
    only; the 1x1 reduce/expand convs change channel counts, so
    double_shortcut=True raises rather than silently approximating.
    """

    expansion = 4

    planes: int
    x_quant: str
    w_quant: str
    nonlins: Sequence[str]
    stride: int = 1
    double_shortcut: bool = False
    # Threshold folding, as in XnorBasicBlock.bn_fold.
    bn_fold: bool = False
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

    def _fold(self, train: bool) -> bool:
        return (self.bn_fold and not train
                and self.inference_mode == 'packed'
                and self.w_quant != 'fp' and self.x_quant != 'fp')

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if len(self.nonlins) != 2:
            raise ValueError('There should be 2 non-linearities.')
        if self.double_shortcut:
            raise ValueError(
                'double_shortcut is only defined for basic blocks '
                '(channel counts change inside a bottleneck).')
        dt = self.eval_dtype if not train else self.train_dtype
        fold = self._fold(train)
        qconv = dict(
            x_quant=self.x_quant, w_quant=self.w_quant, clamp=self.clamp,
            moving_average_mode=self.moving_average_mode,
            moving_average_momentum=self.moving_average_momentum,
            solver_mode=self.solver_mode,
            inference_mode=self.inference_mode, eval_dtype=dt,
            train_dtype=self.train_dtype,
            pass_fusion=self.pass_fusion,
            sign_compute=self.sign_compute,
            calibrate=self.calibrate,
            bn_folded=fold,
            use_bias=True,
        )
        out = x if fold else BatchNorm(dtype=dt, name='bn1')(x, train)
        out = QuantConv2d(self.planes, 1, stride=1, padding=0,
                          name='conv1', **qconv)(out, train)
        out = _nonlin(self.nonlins[0], 'nonlin1')(out)
        if not fold:
            out = BatchNorm(dtype=dt, name='bn2')(out, train)
        out = QuantConv2d(self.planes, 3, stride=self.stride, padding=1,
                          name='conv2', **qconv)(out, train)
        out = _nonlin(self.nonlins[0], 'nonlin2')(out)
        if not fold:
            out = BatchNorm(dtype=dt, name='bn3')(out, train)
        out = QuantConv2d(self.planes * self.expansion, 1, stride=1,
                          padding=0, name='conv3', **qconv)(out, train)
        out = out + _Shortcut(self.planes * self.expansion, self.stride,
                              use_bias=True, dtype=dt,
                              name='shortcut')(x, train)
        return _nonlin(self.nonlins[1], 'nonlin3')(out)


_BLOCKS = {
    'regular': RegularBasicBlock,
    'xnor': XnorBasicBlock,
    'regular_bottleneck': RegularBottleneckBlock,
    'xnor_bottleneck': XnorBottleneckBlock,
}


class QResNet(nn.Module):
    """ResNet with per-stage quantization config.

    Constructor args mirror the reference's YAML arch_config
    (resnet.py:216-247): layer0 configures the fp stem, layer1..layer4 each
    carry {x_quant, w_quant, clamp, double_shortcut?} for their stage,
    num_blocks the per-stage depth, nonlins the two block non-linearities.

    block: 'regular' | 'xnor' (basic, reference parity) or
    'regular_bottleneck' | 'xnor_bottleneck' (ResNet-50-family extension;
    e.g. num_blocks [3,4,6,3] + block 'regular_bottleneck' = ResNet-50).
    """

    block: str
    layer0: dict[str, Any]
    layer1: dict[str, Any]
    layer2: dict[str, Any]
    layer3: dict[str, Any]
    layer4: Optional[dict[str, Any]]
    nonlins: Sequence[str]
    num_blocks: Sequence[int]
    output_classes: int
    moving_average_mode: str = 'off'
    moving_average_momentum: float = 0.99
    solver_mode: str = 'exact'
    inference_mode: str = 'dense'
    eval_dtype: Optional[Any] = None
    train_dtype: Optional[Any] = None
    pass_fusion: bool = True
    sign_compute: str = 'auto'
    calibrate: bool = False
    # Serve with export-time-folded BN (requires packed_params produced
    # by nn/export.fold_bn_into_packed for the conv->BN families, or
    # nn/export.fold_xnor_thresholds for the BN->conv xnor families).
    bn_fold: bool = False
    stem_s2d: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.block not in _BLOCKS:
            raise ValueError(f'Block {self.block} is not supported.')
        block_cls = _BLOCKS[self.block]
        if self.remat and train:
            # Per-block rematerialization (jax.checkpoint): the backward
            # pass recomputes each block's activations instead of keeping
            # them in HBM — peak activation memory drops from O(depth) to
            # O(1 block), buying larger per-chip batches for ~1/3 extra
            # forward FLOPs. YAML: arch_config.remat: true.
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        dt = self.eval_dtype if not train else self.train_dtype
        if dt is not None:
            x = x.astype(dt)
        width = self.layer0['n_in_channels']
        x = Conv(width, self.layer0['kernel_size'],
                 stride=self.layer0['stride'], padding=self.layer0['padding'],
                 use_bias=self.layer0['bias'], dtype=dt,
                 s2d=self.stem_s2d, name='conv1')(x)
        x = nn.relu(BatchNorm(dtype=dt, name='bn1')(x, train))
        mp = self.layer0['maxpool']
        if mp['type'] == 'maxpool2d':
            x = max_pool2d(x, kernel_size=mp['kernel_size'],
                           stride=mp['stride'], padding=mp['padding'])
        elif mp['type'] != 'identity':
            raise ValueError(f"maxpool type {mp['type']} is not supported.")

        stages = [(self.layer1, width, 1), (self.layer2, 2 * width, 2),
                  (self.layer3, 4 * width, 2)]
        if self.layer4 is not None:
            stages.append((self.layer4, 8 * width, 2))

        for s, (cfg, planes, first_stride) in enumerate(stages):
            cfg = dict(cfg)
            block_kwargs = dict(
                planes=planes,
                x_quant=cfg.pop('x_quant'),
                w_quant=cfg.pop('w_quant'),
                clamp=cfg.pop('clamp', None),
                nonlins=tuple(self.nonlins),
                moving_average_mode=self.moving_average_mode,
                moving_average_momentum=self.moving_average_momentum,
                solver_mode=self.solver_mode,
                inference_mode=self.inference_mode,
                eval_dtype=self.eval_dtype,
                train_dtype=self.train_dtype,
                pass_fusion=self.pass_fusion,
                sign_compute=self.sign_compute,
                calibrate=self.calibrate,
                bn_fold=self.bn_fold,
                **cfg,  # e.g. double_shortcut for xnor blocks
            )
            for b in range(self.num_blocks[s]):
                x = block_cls(
                    stride=first_stride if b == 0 else 1,
                    name=f'layer{s + 1}_block{b}',
                    **block_kwargs,
                )(x, train)

        x = global_avg_pool(x)
        from quant_tpu.nn.layers import Dense
        logits = Dense(self.output_classes, dtype=dt, name='fc')(x)
        return logits.astype(jnp.float32)
