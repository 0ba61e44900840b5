"""Quantized layers: scheme registry, quantizer modules, QuantConv2d.

Reference parity map:
  * scheme strings 'fp' | 'ls-1' | 'ls-2' | 'ls-T' | 'gf-k'
    (quant/binary/binary_conv.py:99-145 in apple/ml-quant)
  * WeightQuantizer   — caches per-out-channel scales while training and
    reuses them in eval (quant/binary/weight_quantization.py)
  * ActivationQuantizer — per-sample scales with moving-average modes
    off / eval_only / train_and_eval
    (quant/binary/activation_quantization.py:19-102,
     quant/utils/moving_average.py:27-39)
  * QuantConv2d       — conv2d(w_quant(w), x_quant(clamp(x)))
    (quant/binary/binary_conv.py:161-173)

TPU-first notes: layouts are NHWC/HWIO; quantizer scale state lives in the
'quant_state' flax collection (explicit state-in/state-out, no buffer
mutation); parameter init matches torch's Conv2d/Linear defaults
(uniform(-1/sqrt(fan_in), +1/sqrt(fan_in))) so QAT dynamics track the
reference's published configs.
"""

import re
from typing import Any, Callable, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from quant_tpu.ops import quantize as Q
from quant_tpu.ops.conv import _pair, conv2d, stem_conv_s2d

IntOr2 = Union[int, Sequence[int]]

_LS_SCALES = {'fp': 0, 'ls-1': 1, 'ls-2': 2, 'ls-T': 1}


def validate_scheme(scheme: str) -> None:
    """Raise on invalid scheme strings (reference binary_conv.py:99-101)."""
    if scheme not in _LS_SCALES and not re.fullmatch(r'gf-\d+', scheme):
        raise ValueError(
            f'Scheme {scheme} is invalid. Please see docs for valid schemes.')


def scheme_num_scales(scheme: str) -> int:
    """Number of scale vectors (k) a scheme tracks."""
    validate_scheme(scheme)
    if scheme in _LS_SCALES:
        return _LS_SCALES[scheme]
    return int(scheme.split('-')[1])


def _quantize_with_scheme(scheme: str, x: jax.Array,
                          vs: Optional[jax.Array], skip: int,
                          solver_mode: str) -> tuple[jax.Array, jax.Array]:
    """Dispatch to the pure quantizer function for `scheme`."""
    if scheme == 'fp':
        return Q.quantizer_fp(x, vs)
    if scheme == 'ls-1':
        return Q.quantizer_ls_1(x, vs[0] if vs is not None else None)
    if scheme == 'ls-2':
        return Q.quantizer_ls_2(x, vs, skip=skip, mode=solver_mode)
    if scheme == 'ls-T':
        return Q.quantizer_ls_ternary(x, vs, skip=skip, mode=solver_mode)
    k = scheme_num_scales(scheme)
    return Q.quantizer_gf(x, k, vs)


def torch_conv_kernel_init(dtype: Any = jnp.float32) -> Callable:
    """torch nn.Conv2d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    (kaiming_uniform with a=sqrt(5); fan_in = Cin/groups * kh * kw.)
    """
    return jax.nn.initializers.variance_scaling(
        scale=1.0 / 3.0, mode='fan_in', distribution='uniform', dtype=dtype)


def torch_bias_init(fan_in: int, dtype: Any = jnp.float32) -> Callable:
    """torch Conv2d/Linear bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5) if fan_in > 0 else 0.0

    def init(key, shape, dtype=dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class WeightQuantizer(nn.Module):
    """Quantizes weights per out-channel; caches scales while training.

    The cached (k, out_channels) scale stack is the state_dict-visible
    buffer of the reference (weight_quantization.py:25,48-49,97-98): it is
    written on every training forward (when 'quant_state' is mutable) and
    read back in eval mode.
    """

    scheme: str
    size: int  # number of out-channels
    skip: int = 3
    solver_mode: str = 'exact'

    @nn.compact
    def __call__(self, w_oi: jax.Array, train: bool,
                 return_scales: bool = False) -> object:
        """Quantize w_oi, whose leading axis is the out-channel axis."""
        validate_scheme(self.scheme)
        if self.scheme == 'fp':
            return (w_oi, None) if return_scales else w_oi

        k = scheme_num_scales(self.scheme)
        cached = self.variable('quant_state', 'vs',
                               lambda: jnp.zeros((k, self.size), jnp.float32))
        if train or self.is_initializing():
            vs, w_q = _quantize_with_scheme(
                self.scheme, w_oi, None, self.skip, self.solver_mode)
            if not self.is_initializing():
                cached.value = vs
        else:
            vs = cached.value
            _, w_q = _quantize_with_scheme(
                self.scheme, w_oi, vs, self.skip, self.solver_mode)
        return (w_q, vs) if return_scales else w_q


class ActivationQuantizer(nn.Module):
    """Quantizes activations per sample, with optional scale EMA.

    Moving-average modes (reference activation_quantization.py:19-46):
      * 'off'            — per-batch scales always.
      * 'eval_only'      — track EMA of the batch-mean scales during
                           training; use the EMA only in eval.
      * 'train_and_eval' — track EMA and ALSO re-quantize with it during
                           training. (The reference documents this as racy
                           under DataParallel; here the functional state
                           threading makes it safe by construction.)

    EMA update (reference moving_average.py:27-39): first batch copies,
    later batches blend momentum*old + (1-momentum)*new.
    """

    scheme: str
    moving_average_mode: str = 'off'
    moving_average_momentum: float = 0.99
    skip: int = 3
    solver_mode: str = 'exact'
    # Post-training calibration (observer mode): eval-mode forwards ALSO
    # solve batch scales and blend them into the EMA state — the
    # standard PTQ observer pass. Lets checkpoints trained with
    # moving_average_mode='off' acquire the EMA scales that solve-free
    # packed eval and threshold-folded serving need
    # (nn/export.calibrate_ema_scales). Requires an EMA mode and a
    # mutable 'quant_state'.
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool,
                 return_scales: bool = False) -> object:
        """Quantize x; with return_scales also return the (k, N) scales
        actually used (the packed inference path consumes only the scales
        and re-derives sign planes — the dense x_q is then dead code XLA
        prunes)."""

        def out(x_q, vs):
            return (x_q, vs) if return_scales else x_q

        validate_scheme(self.scheme)
        mode = self.moving_average_mode
        if mode not in ('off', 'eval_only', 'train_and_eval'):
            raise ValueError(f'Invalid moving average mode {mode}.')
        if self.scheme == 'fp':
            return out(x, None)

        k = scheme_num_scales(self.scheme)
        use_ema = mode != 'off'
        if use_ema:
            ema = self.variable('quant_state', 'ema',
                                lambda: jnp.zeros((k,), jnp.float32))
            count = self.variable('quant_state', 'ema_count',
                                  lambda: jnp.zeros((), jnp.int32))

        if train or self.is_initializing():
            batch_vs, x_q = _quantize_with_scheme(
                self.scheme, x, None, self.skip, self.solver_mode)
            used_vs = batch_vs
            if use_ema:
                new = jnp.mean(batch_vs, axis=1)  # (k,) batch-mean scales
                m = self.moving_average_momentum
                blended = jnp.where(count.value > 0,
                                    m * ema.value + (1.0 - m) * new, new)
                if not self.is_initializing():
                    ema.value = blended
                    count.value = count.value + 1
                if mode == 'train_and_eval':
                    used_vs = jnp.broadcast_to(blended[:, None],
                                               (k, x.shape[0]))
                    _, x_q = _quantize_with_scheme(
                        self.scheme, x, used_vs, self.skip, self.solver_mode)
            return out(x_q, used_vs)

        if self.calibrate:
            if not use_ema:
                raise ValueError(
                    "calibrate=True needs an EMA moving_average_mode "
                    "('eval_only'/'train_and_eval') so there is EMA "
                    'state to calibrate.')
            # Observer pass: this x is the EVAL-mode activation (BN on
            # running stats) — exactly what folded/EMA serving will see.
            batch_vs, _ = _quantize_with_scheme(
                self.scheme, x, None, self.skip, self.solver_mode)
            new = jnp.mean(batch_vs, axis=1)
            m = self.moving_average_momentum
            blended = jnp.where(count.value > 0,
                                m * ema.value + (1.0 - m) * new, new)
            ema.value = blended
            count.value = count.value + 1
            vs = jnp.broadcast_to(blended[:, None], (k, x.shape[0]))
            _, x_q = _quantize_with_scheme(
                self.scheme, x, vs, self.skip, self.solver_mode)
            return out(x_q, vs)

        if use_ema:
            vs = jnp.broadcast_to(ema.value[:, None], (k, x.shape[0]))
            _, x_q = _quantize_with_scheme(
                self.scheme, x, vs, self.skip, self.solver_mode)
        else:
            vs, x_q = _quantize_with_scheme(
                self.scheme, x, None, self.skip, self.solver_mode)
        return out(x_q, vs)


class PReLU(nn.Module):
    """PReLU with a single shared slope (torch default), dtype-preserving
    (the slope is cast to the input dtype, so bf16 chains stay bf16)."""

    negative_slope_init: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        slope = self.param(
            'negative_slope',
            lambda key: jnp.asarray(self.negative_slope_init, jnp.float32))
        return jnp.where(x >= 0, x, slope.astype(x.dtype) * x)


class Conv(nn.Module):
    """Full-precision NHWC conv with torch nn.Conv2d default init.

    `dtype` optionally downcasts the computation (params stay fp32);
    used by the bf16 packed-inference path."""

    features: int
    kernel_size: IntOr2
    stride: IntOr2 = 1
    padding: IntOr2 = 0
    use_bias: bool = True
    groups: int = 1
    dtype: Optional[Any] = None
    s2d: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        cin = x.shape[-1]
        kernel = self.param(
            'kernel', torch_conv_kernel_init(),
            (kh, kw, cin // self.groups, self.features))
        bias = None
        if self.use_bias:
            fan_in = (cin // self.groups) * kh * kw
            bias = self.param('bias', torch_bias_init(fan_in),
                              (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        if (self.s2d and (kh, kw) == (7, 7) and _pair(self.stride) == (2, 2)
                and _pair(self.padding) == (3, 3) and self.groups == 1
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            # Exact space-to-depth reformulation — same params, ~7x
            # faster on small-C_in stems (ops/conv.py:stem_conv_s2d).
            return stem_conv_s2d(x, kernel, bias=bias,
                                 preferred_element_type=self.dtype
                                 or jnp.float32)
        return conv2d(x, kernel, stride=self.stride, padding=self.padding,
                      groups=self.groups, bias=bias,
                      preferred_element_type=self.dtype or jnp.float32)


class Dense(nn.Module):
    """Fully-connected layer with torch nn.Linear default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        kernel = self.param('kernel', torch_conv_kernel_init(),
                            (fan_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = x @ kernel
        if self.use_bias:
            bias = self.param('bias', torch_bias_init(fan_in),
                              (self.features,))
            y = y + (bias.astype(self.dtype) if self.dtype else bias)
        return y


class BatchNorm(nn.Module):
    """BatchNorm with torch conventions (momentum is the NEW-stat weight)."""

    momentum: float = 0.1
    epsilon: float = 1e-5
    affine: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,  # flax blends old stats by this
            epsilon=self.epsilon,
            use_bias=self.affine,
            use_scale=self.affine,
            dtype=self.dtype,
            name='bn',
        )(x)


class QuantConv2d(nn.Module):
    """Quantized 2D conv: conv2d(w_quant(w), x_quant(clamp(x))) + bias.

    The computational heart of the framework (reference
    binary_conv.py:48-173). In the dense QAT path the quantized tensors
    (sum_i v_i*b_i) run through the MXU as a normal conv; the packed
    binary-GEMM inference path consumes the same cached 'quant_state'
    scales (see quant_tpu/ops/binary_gemm.py).
    """

    features: int
    kernel_size: IntOr2
    x_quant: str = 'fp'
    w_quant: str = 'fp'
    clamp: Optional[dict[str, Any]] = None
    stride: IntOr2 = 1
    padding: IntOr2 = 0
    use_bias: bool = True
    groups: int = 1
    moving_average_mode: str = 'off'
    moving_average_momentum: float = 0.99
    solver_mode: str = 'exact'
    # 'dense'  — fp-simulated conv (the QAT/oracle path, reference
    #            semantics). 'packed' — eval-mode forwards run the MXU
    #            multi-pass binary conv over bit-packed weight sign planes
    #            (quant_tpu/ops/binary_infer.py). Training always uses the
    #            dense path (gradients need the STE composition).
    inference_mode: str = 'dense'
    # Optional reduced dtype for the packed-inference feature-map chain
    # (e.g. jnp.bfloat16): conv accumulation stays exact f32; everything
    # between convs runs/streams at half the HBM bytes.
    eval_dtype: Optional[Any] = None
    # Collapse the k_a*k_w sign-plane passes of the packed path into ONE
    # conv (binary_infer.quant_conv2d_infer fused=True): multi-bit schemes
    # run at 1-bit speed; single-plane sides stay bit-exact, k>=2 sides
    # incur only bf16 input rounding. False = bit-exact multi-pass.
    pass_fusion: bool = True
    # Optional mixed-precision TRAINING dtype (e.g. jnp.bfloat16 /
    # 'bfloat16'). The quantizer scale solves (sort/cumsum —
    # precision-sensitive) ALWAYS run f32 (ops/quantize.py upcasts);
    # the already-quantized conv operands sum_i v_i*b_i AND the conv
    # output are train_dtype, and the models (QResNet/QLeNet5) extend
    # the same dtype to the whole inter-conv chain — BN, nonlins,
    # shortcuts, stem, head — the standard AMP recipe (BN statistics
    # are still computed in f32 by flax; params, grads, optimizer
    # state and the loss stay f32). On TPU the MXU accumulates f32
    # internally and rounds the output once. Signs survive the cast
    # exactly; scales round to bf16 — extra noise ~0.4%, within QAT's
    # own regime. Halves feature-map/operand HBM bytes end-to-end.
    train_dtype: Optional[Any] = None
    # Set by the conv->BN blocks when serving with export-time-folded
    # BN: the conv consumes packed_params.b_fold and the a-scaled
    # w_scales; mismatches (folded variables without the flag, or the
    # flag without folded variables) raise instead of silently applying
    # BN twice / not at all.
    bn_folded: bool = False
    # Sign-plane conv operand dtype for the packed path: 'int8' (s32
    # accumulation, ~1.5x MXU rate where the toolchain lowers s8 convs,
    # always bit-exact, but loops distinct-scale plane pairs), 'bf16'
    # (f32 accumulation, allows baking multi-scale sides into ONE conv),
    # or 'auto' (default): int8 when both sides have a single effective
    # plane (ls-1 / ls-T — one s8 pass strictly wins), bf16 otherwise
    # (one baked bf16 pass beats k>=2 s8 passes; measured, DESIGN.md).
    sign_compute: str = 'auto'
    # PTQ observer pass: see ActivationQuantizer.calibrate.
    calibrate: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        validate_scheme(self.x_quant)
        validate_scheme(self.w_quant)
        clamp = dict(self.clamp) if self.clamp else {'kind': 'identity'}
        clamp_fn = Q.get_clamp_fn(**clamp)

        x_clamped = clamp_fn(x)
        x_q, x_vs = ActivationQuantizer(
            scheme=self.x_quant,
            moving_average_mode=self.moving_average_mode,
            moving_average_momentum=self.moving_average_momentum,
            solver_mode=self.solver_mode,
            calibrate=self.calibrate,
            name='x_quantizer',
        )(x_clamped, train, return_scales=True)

        kh, kw = (self.kernel_size,) * 2 if isinstance(self.kernel_size, int) \
            else tuple(self.kernel_size)
        cin = x.shape[-1]

        use_packed = (self.inference_mode == 'packed' and not train
                      and not self.is_initializing()
                      and self.w_quant != 'fp' and self.groups == 1)
        # Stripped deployment checkpoint (nn/export.py
        # strip_for_deployment): the fp32 kernel of a packed-served layer
        # is ABSENT — only its packed sign words + scales shipped. Skip
        # the kernel param and the weight quantizer entirely.
        stripped = (use_packed
                    and self.has_variable('packed_params', 'w_packed')
                    and not self.has_variable('params', 'kernel'))
        if stripped:
            w_oi = w_vs = None
        else:
            kernel = self.param(
                'kernel', torch_conv_kernel_init(),
                (kh, kw, cin // self.groups, self.features))
            # Quantize per out-channel: move O (trailing axis of HWIO) to
            # the row axis for the quantizer, then restore.
            w_oi = jnp.moveaxis(kernel, -1, 0)
            w_oi_q, w_vs = WeightQuantizer(
                scheme=self.w_quant, size=self.features,
                solver_mode=self.solver_mode, name='w_quantizer',
            )(w_oi, train, return_scales=True)
            w_q = jnp.moveaxis(w_oi_q, 0, -1)

        bias = None
        if self.use_bias:
            fan_in = (cin // self.groups) * kh * kw
            bias = self.param('bias', torch_bias_init(fan_in),
                              (self.features,))
        if use_packed:
            from quant_tpu.ops import binary_infer as BI
            out_dtype = self.eval_dtype or jnp.float32
            has_fold = self.has_variable('packed_params', 'b_fold')
            has_thresh = self.has_variable('packed_params', 'x_thresh')
            if self.bn_folded and not (has_fold or has_thresh):
                raise ValueError(
                    'bn_fold serving requested but packed_params carry '
                    'no b_fold/x_thresh — run nn.export.'
                    'fold_bn_into_packed (conv->BN families) or '
                    'fold_xnor_thresholds (BN->conv families) on the '
                    'exported variables first.')
            if (has_fold or has_thresh) and not self.bn_folded:
                raise ValueError(
                    'packed_params are BN-folded but the model was not '
                    'cloned with bn_fold=True — applying them through '
                    'the unfolded model would run BN twice.')
            if has_thresh and self.moving_average_mode == 'off':
                raise ValueError(
                    'threshold-folded serving needs EMA activation '
                    "scales (moving_average_mode != 'off'): per-batch "
                    'eval scales require the BN output values the '
                    'folded path never computes.')
            if has_fold:
                # Eval-mode BN folded into this conv at export time
                # (nn/export.py fold_bn_into_packed): w_scales already
                # carry gamma/sqrt(var+eps) and b_fold is the TOTAL
                # post-scale bias (beta - mean*a + a*conv_bias) — the
                # param bias, if any, is already inside it.
                bias = self.get_variable('packed_params', 'b_fold')
            if self.has_variable('packed_params', 'w_packed'):
                # Exported deployment: packed sign words + scales were
                # computed once offline (quant_tpu/nn/export.py) — no
                # per-forward re-quantize/re-pack of the fp kernel.
                w_packed = self.get_variable('packed_params', 'w_packed')
                w_scales = self.get_variable('packed_params', 'w_scales')
            else:
                planes = BI.weight_sign_planes(w_oi, self.w_quant, w_vs)
                w_packed = jnp.stack([
                    BI.pack_weights(jnp.moveaxis(p, 0, -1))
                    for p in planes])
                w_scales = BI.weight_scales_for_planes(self.w_quant, w_vs)
                if self.is_mutable_collection('packed_params'):
                    # Export pass: persist for later applies.
                    self.variable('packed_params', 'w_packed',
                                  lambda: w_packed)
                    self.variable('packed_params', 'w_scales',
                                  lambda: w_scales)
            if self.x_quant == 'fp':
                if has_thresh:
                    raise ValueError(
                        'threshold folding is undefined for fp '
                        'activations (they consume BN output values).')
                return BI.fp_activation_conv_infer(
                    x_clamped, w_packed=w_packed, w_vs=w_scales,
                    in_channels=cin, bias=bias, stride=self.stride,
                    padding=self.padding, out_dtype=out_dtype,
                    fused=self.pass_fusion)
            sign_compute = self.sign_compute
            if sign_compute == 'auto':
                # int8 strictly wins only when each side is ONE conv
                # pass either way: 1 effective activation plane (ls-1,
                # ls-T) x 1 effective weight plane (ls-1, ls-T).
                def n_planes(scheme):
                    if scheme in ('ls-1', 'ls-T'):
                        return 1
                    if scheme.startswith('gf-'):
                        return int(scheme.split('-')[1])
                    return 2  # ls-2
                one_pass = (n_planes(self.x_quant) == 1
                            and n_planes(self.w_quant) == 1)
                sign_compute = 'int8' if one_pass else 'bf16'
            thresh_kw = {}
            if has_thresh:
                # BN->conv fold: planes come from per-channel threshold
                # compares on the RAW input x (the block skipped BN and
                # the clamp is inside the fold's validity condition).
                thresh_kw = dict(
                    x_thresh=self.get_variable('packed_params',
                                               'x_thresh'),
                    x_flip=self.get_variable('packed_params', 'x_flip'),
                    x_va=self.get_variable('packed_params', 'x_va'))
            return BI.quant_conv2d_infer(
                x if has_thresh else x_clamped,
                x_scheme=self.x_quant, x_vs=x_vs,
                w_packed=w_packed, w_vs=w_scales, in_channels=cin,
                bias=bias, stride=self.stride, padding=self.padding,
                w_planes_share_scale=(self.w_quant == 'ls-T'),
                out_dtype=out_dtype, fused=self.pass_fusion,
                compute_dtype=(jnp.int8 if sign_compute == 'int8'
                               else None),
                **thresh_kw)

        pet = jnp.float32
        if train and self.train_dtype is not None:
            # Cast the already-quantized operands (signs survive exactly;
            # scales round once); the conv output STAYS train_dtype (TPU
            # MXU: f32 internal accumulation, one output rounding) so the
            # whole inter-conv chain — BN, nonlins, shortcuts — runs at
            # reduced precision when the model passes train_dtype down,
            # and the backward pass's transposed convs see matching
            # operand dtypes.
            x_q = x_q.astype(self.train_dtype)
            w_q = w_q.astype(self.train_dtype)
            pet = self.train_dtype
            if bias is not None:
                bias = bias.astype(pet)
            return conv2d(x_q, w_q, stride=self.stride,
                          padding=self.padding, groups=self.groups,
                          bias=bias, preferred_element_type=pet)
        out = conv2d(x_q, w_q, stride=self.stride, padding=self.padding,
                     groups=self.groups, bias=bias,
                     preferred_element_type=pet)
        return out.astype(jnp.float32)
