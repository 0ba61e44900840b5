"""Fast binary-conv inference paths.

The dense QAT conv (quant_tpu/ops/conv.py) simulates quantization in fp32,
exactly like the reference (binary_conv.py:161-173). These are the
production inference paths the reference lacks:

* MXU sign-plane path (`binary_conv_int8`): sign planes as {-1,+1}
  tensors in SIGN_COMPUTE_DTYPE; the conv runs on the MXU with exact f32
  accumulation and the least-squares scale epilogue fused by XLA. Weights
  live bit-packed in HBM and are unpacked on the fly (32x less weight HBM
  traffic).

* Multi-pass composition (`quant_conv2d_infer`): a k_a-bit activation
  against a k_w-bit weight decomposes into k_a*k_w binary convs with a
  rank-1 scale epilogue:
      y = sum_{i,j} (vx_i ⊗ vw_j) * conv(bx_i, bw_j)
  with vx per-sample and vw per-out-channel. For ls-T both passes share
  one scale; for ls-2 the second activation plane is sign(x - v1*b1).

Layouts: NHWC activations, HWIO weights, matching the rest of the stack.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp

from quant_tpu.ops.conv import conv2d
from quant_tpu.ops.packing import pack_signs, unpack_signs
from quant_tpu.ops.ste import binary_sign

# Compute dtype for sign-plane convs. bf16 is the robust default: +-1 is
# exact in bf16, products are +-1, and f32 accumulation is integer-exact
# up to 2^24 MACs — far above any conv reduction here — at full MXU bf16
# rate. int8 (2x MXU rate on v5e) is preferable where the toolchain
# supports s8xs8->s32 convs, but the axon remote compiler in this
# environment hangs on them (see .claude/skills/verify/SKILL.md).
SIGN_COMPUTE_DTYPE = jnp.bfloat16


def weight_sign_planes(w_oi: jax.Array, scheme: str,
                       vs: jax.Array) -> list[jax.Array]:
    """Decompose a weight tensor (O leading) into its binary sign planes.

    vs: (k_w, O) cached per-out-channel scales. Returns [plane_j] with
    w_q = sum_j vs[j] * plane_j, each plane in {-1,+1} with O leading.
    """
    o = w_oi.shape[0]

    def per_row(v):
        return v.reshape((o,) + (1,) * (w_oi.ndim - 1))

    if scheme == 'ls-1':
        return [binary_sign(w_oi)]
    if scheme in ('ls-2', 'ls-T'):
        b1 = binary_sign(w_oi)
        b2 = binary_sign(w_oi - per_row(vs[0]) * b1)
        return [b1, b2]
    if scheme.startswith('gf-'):
        k = int(scheme.split('-')[1])
        planes = []
        result = jnp.zeros_like(w_oi)
        for j in range(k):
            b = binary_sign(w_oi - result)
            planes.append(b)
            result = result + per_row(vs[j]) * b
        return planes
    raise ValueError(f'No binary decomposition for scheme {scheme}')


def weight_scales_for_planes(scheme: str, vs: jax.Array) -> jax.Array:
    """Scale stack matching weight_sign_planes' planes ((k_w_planes, O)).

    ls-T shares one scale across both planes (reference
    quantization.py:109-115)."""
    if scheme == 'ls-T':
        return jnp.stack([vs[0], vs[0]])
    return vs


def pack_weights(w: jax.Array) -> jax.Array:
    """Pack an HWIO weight's signs along I: (kh,kw,I,O) -> (kh,kw,Wd,O) i32."""
    w_t = jnp.moveaxis(w, 2, -1)          # (kh, kw, O, I)
    packed = pack_signs(w_t)              # (kh, kw, O, Wd)
    return jnp.moveaxis(packed, -1, 2)    # (kh, kw, Wd, O)


def unpack_weights_int8(packed: jax.Array, in_channels: int,
                        dtype: Any = SIGN_COMPUTE_DTYPE) -> jax.Array:
    """Unpack packed HWIO-sign words to a {-1,+1} HWIO tensor."""
    p_t = jnp.moveaxis(packed, 2, -1)     # (kh, kw, O, Wd)
    signs = unpack_signs(p_t, in_channels, dtype=dtype)
    return jnp.moveaxis(signs, -1, 2)     # (kh, kw, I, O)


def binary_conv_int8(x_signs: jax.Array, w_signs: jax.Array, *,
                     stride: Any = 1, padding: Any = 0) -> jax.Array:
    """Sign-plane conv on the MXU with exact accumulation.

    bf16 operands accumulate in f32 (exact for +-1/+-2 up to 2^24 MACs);
    int8 operands accumulate in s32 (exact, and 2x the MXU rate where
    the toolchain lowers s8 convs — this round's does, see
    tools/probe_r2_results.jsonl conv_s8_small)."""
    acc = jnp.int32 if x_signs.dtype == jnp.int8 else jnp.float32
    return conv2d(x_signs, w_signs, stride=stride, padding=padding,
                  preferred_element_type=acc)


def activation_sign_planes(x: jax.Array, scheme: str, vs: jax.Array,
                           dtype: Any = None) -> tuple[list, list]:
    """Decompose an activation tensor into (sign planes, scale list).

    vs: (k, N) per-sample scales (from the quantizer EMA / batch solve).
    Returns ([plane_i NHWC in `dtype`], [v_i (N,)]) such that
    x_q = sum_i v_i * plane_i.
    """
    dtype = dtype or SIGN_COMPUTE_DTYPE
    n = x.shape[0]

    def per_sample(v):
        return v.reshape((n,) + (1,) * (x.ndim - 1))

    if scheme == 'ls-1':
        return [binary_sign(x).astype(dtype)], [vs[0]]
    if scheme == 'ls-2':
        b1 = binary_sign(x)
        b2 = binary_sign(x - per_sample(vs[0]) * b1)
        return ([b1.astype(dtype), b2.astype(dtype)], [vs[0], vs[1]])
    if scheme == 'ls-T':
        # Both ternary passes share one scale, so the two sign planes fuse
        # into ONE conv over (b1 + b2) in {-2, 0, +2} — exact in bf16/s8
        # and half the conv work of the naive two-pass form.
        b1 = binary_sign(x)
        b2 = binary_sign(x - per_sample(vs[0]) * b1)
        return [(b1 + b2).astype(dtype)], [vs[0]]
    if scheme.startswith('gf-'):
        k = int(scheme.split('-')[1])
        planes, scales = [], []
        result = jnp.zeros_like(x)
        for i in range(k):
            b = binary_sign(x - result)
            planes.append(b.astype(dtype))
            scales.append(vs[i])
            result = result + per_sample(vs[i]) * b
        return planes, scales
    raise ValueError(f'No binary decomposition for scheme {scheme}')


def threshold_sign_planes(x: jax.Array, scheme: str, vs: jax.Array,
                          thresh: jax.Array, flip: jax.Array,
                          va: jax.Array,
                          dtype: Any = None) -> tuple[list, list]:
    """Sign planes of quantize(clamp(BN(x))) computed DIRECTLY from the
    pre-BN tensor x via per-channel thresholds (xnor-ordering fold).

    Eval BN is the per-channel affine y = a*x + b; the clamp preserves
    sign; and each residual plane sign(z - sum_j v_j b_j) equals
    sign(y - sum_j v_j b_j) whenever the running scale sum stays inside
    the clamp box (verified at fold time, nn/export.py). Substituting
    u = x - t with t = -b/a and dividing by |a|:

        b_1 = s * sign(u)                      s = sign(a), per channel
        b_j = s * sign(u - sum_{i<j} va_i p_i) va_i = v_i / |a|
                                               p_i = sign-planes in u

    so the bf16 feature map BN(x) is never materialized — the planes
    are one fused elementwise compare-chain on the previous conv's raw
    output. Epilogue scales stay the quantizer's EMA per-sample scales
    (vs), exactly as in activation_sign_planes.

    Args:
        x: RAW pre-BN NHWC activations.
        vs: (k, N) per-sample scales (EMA broadcast).
        thresh: (C,) per-channel thresholds t = -b/a.
        flip: (C,) per-channel sign(a) in {-1, +1}.
        va: (k, C) per-channel normalized plane scales v_i / |a|.
    Returns ([plane NHWC in dtype], [v (N,)]) as activation_sign_planes.
    """
    dtype = dtype or SIGN_COMPUTE_DTYPE
    u = x - thresh.astype(x.dtype)
    s = flip.astype(x.dtype)

    if scheme == 'ls-1':
        return [(s * binary_sign(u)).astype(dtype)], [vs[0]]
    if scheme in ('ls-2', 'ls-T'):
        p1 = binary_sign(u)
        p2 = binary_sign(u - va[0].astype(x.dtype) * p1)
        if scheme == 'ls-T':
            # Shared scale: the two planes merge into one {-2,0,+2} op.
            return [(s * (p1 + p2)).astype(dtype)], [vs[0]]
        return ([(s * p1).astype(dtype), (s * p2).astype(dtype)],
                [vs[0], vs[1]])
    if scheme.startswith('gf-'):
        k = int(scheme.split('-')[1])
        planes, out_scales = [], []
        resid = jnp.zeros_like(u)
        for i in range(k):
            p = binary_sign(u - resid)
            planes.append((s * p).astype(dtype))
            out_scales.append(vs[i])
            if i + 1 < k:
                resid = resid + va[i].astype(x.dtype) * p
        return planes, out_scales
    raise ValueError(f'No threshold decomposition for scheme {scheme}')


def quant_conv2d_infer(x: jax.Array, *,
                       x_scheme: str, x_vs: jax.Array,
                       w_packed: jax.Array, w_vs: jax.Array,
                       in_channels: int,
                       bias: Optional[jax.Array] = None,
                       stride: Any = 1, padding: Any = 0,
                       clamp_fn: Optional[Any] = None,
                       w_planes_share_scale: bool = False,
                       out_dtype: Any = jnp.float32,
                       fused: bool = True,
                       compute_dtype: Any = None,
                       x_thresh: Optional[jax.Array] = None,
                       x_flip: Optional[jax.Array] = None,
                       x_va: Optional[jax.Array] = None) -> jax.Array:
    """Full packed-weight quantized conv.

    fused=True (default, the production path): ALL k_a x k_w sign-plane
    passes collapse into ONE conv. The pass loop is linear —
        sum_{i,j} vx_i vw_j conv(bx_i, bw_j)
          = conv(sum_i vx_i bx_i, sum_j vw_j bw_j)
    — so a multi-bit scheme costs the same MXU time as 1-bit. Schemes
    whose side has a single effective plane (ls-1; ls-T via the shared
    scale) keep the exact +-1/+-2 bf16 operand with the scale applied in
    the f32 epilogue, i.e. stay BIT-EXACT vs the dense path. Sides with
    k >= 2 distinct scales bake the scales into a dense bf16 operand
    (values +-v1+-v2): the only error is bf16 input rounding, relative
    <= 2^-9 — far below QAT noise. fused=False runs the bit-exact
    k_a*k_w multi-pass loop (the round-1 path; parity oracle).

    Args:
        x: fp NHWC activations (pre-clamp).
        x_scheme / x_vs: activation scheme and (k_a, N) scales.
        w_packed: (kh, kw, ceil(I/32), O) packed weight sign words
            (one plane per weight bit is stacked on a leading axis for
            k_w > 1: shape (k_w, kh, kw, Wd, O)).
        w_vs: (k_w, O) per-out-channel weight scales.
        in_channels: unpacked I.
        compute_dtype: operand dtype for the sign-plane convs. int8 runs
            s8 x s8 -> s32 (exact; 2x MXU rate where lowered) but cannot
            bake multi-scale sides, so distinct-scale plane pairs run as
            separate passes; bf16 (default) allows the single-conv bake.
        x_thresh / x_flip / x_va: when given, x is the RAW pre-BN tensor
            and sign planes come from the folded per-channel threshold
            comparison (threshold_sign_planes) — clamp_fn is ignored
            (the clamp is part of the fold's validity condition).
    """
    cdt = compute_dtype or SIGN_COMPUTE_DTYPE
    if w_packed.ndim == 4:
        w_packed = w_packed[None]
    k_w = w_packed.shape[0]

    if x_thresh is not None:
        x_planes, x_scales = threshold_sign_planes(
            x, x_scheme, x_vs, x_thresh, x_flip, x_va, dtype=cdt)
    else:
        if clamp_fn is not None:
            x = clamp_fn(x)
        x_planes, x_scales = activation_sign_planes(x, x_scheme, x_vs,
                                                    dtype=cdt)
    n = x.shape[0]

    if w_planes_share_scale and k_w == 2:
        # ls-T weights: fuse the two equal-scale planes into one conv
        # operand in {-2, 0, +2} (same trick as ls-T activations).
        merged = (unpack_weights_int8(w_packed[0], in_channels, dtype=cdt)
                  + unpack_weights_int8(w_packed[1], in_channels,
                                        dtype=cdt))
        w_sign_sets = [(merged, w_vs[0])]
    else:
        w_sign_sets = [(unpack_weights_int8(w_packed[j], in_channels,
                                            dtype=cdt), w_vs[j])
                       for j in range(k_w)]

    if cdt == jnp.int8:
        # Integer path: every pass is exact; distinct scales can't be
        # baked into int operands, so loop the plane pairs (each pass at
        # the 2x s8 MXU rate) with the f32 scale epilogue per pass.
        # (A batch-stacked single-s8-conv variant was A/B'd in round 4 —
        # tools/probe_ls2_variants.py, 14.2k vs the bake's 27.7k img/s —
        # and removed: the 2x-rows s8 conv is operand-bandwidth-bound.)
        fused = False
    if fused:
        if len(x_planes) == 1:
            x_op, vx_epi = x_planes[0], x_scales[0]
        else:
            # Bake arithmetic: f32-accumulate, one downcast (a native
            # bf16-bake variant measured +0.2% = noise in round 4 and
            # was removed; tools/probe_ls2_variants.py).
            xa = sum(vx.reshape(n, 1, 1, 1).astype(jnp.float32)
                     * p.astype(jnp.float32)
                     for p, vx in zip(x_planes, x_scales))
            x_op, vx_epi = xa.astype(SIGN_COMPUTE_DTYPE), None
        if len(w_sign_sets) == 1:
            w_op, vw_epi = w_sign_sets[0]
        else:
            wa = sum(ws.astype(jnp.float32)
                     * vw.reshape(1, 1, 1, -1).astype(jnp.float32)
                     for ws, vw in w_sign_sets)
            w_op, vw_epi = wa.astype(SIGN_COMPUTE_DTYPE), None
        y = binary_conv_int8(x_op, w_op, stride=stride, padding=padding)
        if vx_epi is not None:
            y = y * vx_epi.reshape(n, 1, 1, 1).astype(jnp.float32)
        if vw_epi is not None:
            y = y * vw_epi.reshape(1, 1, 1, -1).astype(jnp.float32)
        acc = y.astype(out_dtype)
    else:
        acc = None
        for w_signs, vw in w_sign_sets:
            for bx, vx in zip(x_planes, x_scales):
                y = binary_conv_int8(bx, w_signs, stride=stride,
                                     padding=padding)
                scale = (vx.reshape(n, 1, 1, 1).astype(jnp.float32)
                         * vw.reshape(1, 1, 1, -1).astype(jnp.float32))
                term = (y * scale).astype(out_dtype)
                acc = term if acc is None else acc + term
    if bias is not None:
        acc = acc + bias.astype(out_dtype)
    return acc


def fp_activation_conv_infer(x: jax.Array, *,
                             w_packed: jax.Array, w_vs: jax.Array,
                             in_channels: int,
                             bias: Optional[jax.Array] = None,
                             stride: Any = 1, padding: Any = 0,
                             clamp_fn: Optional[Any] = None,
                             out_dtype: Any = jnp.float32,
                             fused: bool = True) -> jax.Array:
    """fp activations x binary weights: bf16 conv against unpacked signs
    with the per-channel scale epilogue (the k_a=32, k_w=1 configs).

    fused=True collapses k_w > 1 weight planes into one dense bf16 kernel
    (scales baked in; bf16 weight rounding only) — one conv pass."""
    if clamp_fn is not None:
        x = clamp_fn(x)
    if w_packed.ndim == 4:
        w_packed = w_packed[None]
    k_w = w_packed.shape[0]
    if fused and k_w > 1:
        wa = sum(unpack_weights_int8(w_packed[j], in_channels,
                                     dtype=jnp.float32)
                 * w_vs[j].reshape(1, 1, 1, -1).astype(jnp.float32)
                 for j in range(k_w))
        y = conv2d(x.astype(jnp.bfloat16), wa.astype(jnp.bfloat16),
                   stride=stride, padding=padding,
                   preferred_element_type=jnp.float32)
        acc = y.astype(out_dtype)
    else:
        acc = None
        for j in range(k_w):
            w_signs = unpack_weights_int8(
                w_packed[j], in_channels).astype(jnp.bfloat16)
            y = conv2d(x.astype(jnp.bfloat16), w_signs, stride=stride,
                       padding=padding, preferred_element_type=jnp.float32)
            term = (y * w_vs[j].reshape(1, 1, 1, -1)).astype(out_dtype)
            acc = term if acc is None else acc + term
    if bias is not None:
        acc = acc + bias.astype(out_dtype)
    return acc
