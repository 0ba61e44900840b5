"""Packing + packed binary-conv inference parity vs the dense QAT path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.ops import (
    quantizer_gf, quantizer_ls_1, quantizer_ls_2, quantizer_ls_ternary,
)
from quant_tpu.ops.binary_infer import (
    fp_activation_conv_infer, pack_weights, quant_conv2d_infer,
    unpack_weights_int8,
)
from quant_tpu.ops.conv import conv2d
from quant_tpu.ops.packing import pack_signs, unpack_signs
from quant_tpu.ops.ste import binary_sign


def test_pack_unpack_roundtrip(rng):
    for k in (7, 32, 33, 64, 100):
        x = jnp.asarray(rng.standard_normal((3, k)), jnp.float32)
        words = pack_signs(x)
        assert words.shape == (3, -(-k // 32))
        back = unpack_signs(words, k)
        np.testing.assert_array_equal(np.asarray(back),
                                      np.asarray(binary_sign(x)))


def test_pack_weights_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 20, 8)), jnp.float32)
    packed = pack_weights(w)
    assert packed.shape == (3, 3, 1, 8)
    back = unpack_weights_int8(packed, 20)
    np.testing.assert_array_equal(np.asarray(back, np.float32),
                                  np.asarray(binary_sign(w)))


def _dense_oracle(x_q, w_q, bias, stride, padding):
    return conv2d(x_q, w_q, stride=stride, padding=padding, bias=bias)


@pytest.mark.parametrize('fused', [False, True])
@pytest.mark.parametrize('x_scheme', ['ls-1', 'ls-2', 'ls-T', 'gf-2'])
def test_packed_infer_matches_dense(rng, x_scheme, fused):
    """The packed conv must match the dense fp simulated conv (the
    reference-semantics oracle) for every activation scheme, in both the
    bit-exact multi-pass mode and the single-pass fused mode (whose only
    extra error is bf16 input rounding for k>=2 plane combination)."""
    n, h, w_dim, cin, cout = 2, 8, 8, 36, 8
    x = jnp.asarray(rng.standard_normal((n, h, w_dim, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)

    # Weight: ls-1 per out-channel (rows = O).
    w_oi = jnp.moveaxis(w, -1, 0)
    w_vs, w_q_oi = quantizer_ls_1(w_oi)
    w_q = jnp.moveaxis(w_q_oi, 0, -1)

    # Activation: quantize densely for the oracle, reuse scales for packed.
    qfn = {'ls-1': quantizer_ls_1,
           'ls-2': lambda t: quantizer_ls_2(t, skip=1),
           'ls-T': lambda t: quantizer_ls_ternary(t, skip=1),
           'gf-2': lambda t: quantizer_gf(t, 2)}[x_scheme]
    x_vs, x_q = qfn(x)

    oracle = _dense_oracle(x_q, w_q, bias, 1, 1)

    packed = pack_weights(jnp.moveaxis(w_q_oi, 0, -1))
    got = quant_conv2d_infer(
        x, x_scheme=x_scheme, x_vs=x_vs,
        w_packed=packed, w_vs=w_vs, in_channels=cin,
        bias=bias, stride=1, padding=1, fused=fused)
    multi_plane = fused and x_scheme in ('ls-2', 'gf-2')
    tol = dict(rtol=2e-2, atol=5e-2) if multi_plane \
        else dict(rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle), **tol)


def test_packed_infer_ls2_weights(rng):
    """k_w = 2 (ls-2 weights): two packed weight planes."""
    n, cin, cout = 2, 32, 4
    x = jnp.asarray(rng.standard_normal((n, 6, 6, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)

    w_oi = jnp.moveaxis(w, -1, 0)
    w_vs, w_q_oi = quantizer_ls_2(w_oi, skip=1)
    w_q = jnp.moveaxis(w_q_oi, 0, -1)
    x_vs, x_q = quantizer_ls_1(x)

    oracle = _dense_oracle(x_q, w_q, None, 1, 1)

    # Build the two weight sign planes: b1 = sign(w), b2 = sign(w - v1*b1).
    b1 = binary_sign(w_oi)
    b2 = binary_sign(w_oi - w_vs[0][:, None, None, None] * b1)
    packed = jnp.stack([
        pack_weights(jnp.moveaxis(b1, 0, -1)),
        pack_weights(jnp.moveaxis(b2, 0, -1))])
    got_multi = quant_conv2d_infer(
        x, x_scheme='ls-1', x_vs=x_vs,
        w_packed=packed, w_vs=w_vs, in_channels=cin, stride=1, padding=1,
        fused=False)
    np.testing.assert_allclose(np.asarray(got_multi), np.asarray(oracle),
                               rtol=2e-3, atol=2e-3)
    got_fused = quant_conv2d_infer(
        x, x_scheme='ls-1', x_vs=x_vs,
        w_packed=packed, w_vs=w_vs, in_channels=cin, stride=1, padding=1,
        fused=True)
    np.testing.assert_allclose(np.asarray(got_fused), np.asarray(oracle),
                               rtol=2e-2, atol=5e-2)


def test_fp_activation_packed_weights(rng):
    n, cin, cout = 2, 32, 4
    x = jnp.asarray(rng.standard_normal((n, 6, 6, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
    w_oi = jnp.moveaxis(w, -1, 0)
    w_vs, w_q_oi = quantizer_ls_1(w_oi)
    w_q = jnp.moveaxis(w_q_oi, 0, -1)

    oracle = _dense_oracle(x, w_q, None, 1, 1)
    got = fp_activation_conv_infer(
        x, w_packed=pack_weights(w_q), w_vs=w_vs, in_channels=cin,
        stride=1, padding=1)
    # bf16 activations: coarser tolerance.
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=3e-2, atol=8e-2)


def _count_convs(fn, *args, **kwargs):
    jaxpr = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return str(jaxpr).count('conv_general_dilated')


@pytest.mark.parametrize('x_scheme,k_w', [
    ('ls-1', 1), ('ls-2', 1), ('ls-T', 1), ('gf-2', 1), ('ls-2', 2),
])
def test_fused_runs_single_conv(rng, x_scheme, k_w):
    """fused=True must emit exactly ONE conv regardless of k_a*k_w;
    fused=False emits one per plane pair."""
    n, cin, cout = 2, 32, 4
    x = jnp.asarray(rng.standard_normal((n, 6, 6, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
    w_oi = jnp.moveaxis(w, -1, 0)
    if k_w == 1:
        w_vs, w_q_oi = quantizer_ls_1(w_oi)
        packed = pack_weights(jnp.moveaxis(binary_sign(w_oi), 0, -1))
    else:
        w_vs, _ = quantizer_ls_2(w_oi, skip=1)
        b1 = binary_sign(w_oi)
        b2 = binary_sign(w_oi - w_vs[0][:, None, None, None] * b1)
        packed = jnp.stack([pack_weights(jnp.moveaxis(b1, 0, -1)),
                            pack_weights(jnp.moveaxis(b2, 0, -1))])
    qfn = {'ls-1': quantizer_ls_1,
           'ls-2': lambda t: quantizer_ls_2(t, skip=1),
           'ls-T': lambda t: quantizer_ls_ternary(t, skip=1),
           'gf-2': lambda t: quantizer_gf(t, 2)}[x_scheme]
    x_vs, _ = qfn(x)

    def run(x, fused):
        return quant_conv2d_infer(
            x, x_scheme=x_scheme, x_vs=x_vs, w_packed=packed, w_vs=w_vs,
            in_channels=cin, stride=1, padding=1, fused=fused)

    assert _count_convs(run, x, fused=True) == 1
    planes = {'ls-1': 1, 'ls-2': 2, 'ls-T': 1, 'gf-2': 2}[x_scheme]
    assert _count_convs(run, x, fused=False) == planes * k_w


def test_int8_compute_ls2_falls_back_to_exact_multipass(rng):
    """compute_dtype=int8 with a multi-plane activation scheme cannot
    bake distinct scales into integer operands: it must run the
    bit-exact multi-pass loop and match the fused bf16 bake closely."""
    n, cin, cout = 3, 16, 8
    x = jnp.asarray(rng.standard_normal((n, 7, 7, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.float32)
    w_oi = jnp.moveaxis(w, -1, 0)
    w_vs, _ = quantizer_ls_1(w_oi)
    packed = pack_weights(jnp.moveaxis(binary_sign(w_oi), 0, -1))[None]
    x_vs, _ = quantizer_ls_2(x, skip=1)
    kw = dict(x_scheme='ls-2', x_vs=x_vs, w_packed=packed,
              w_vs=w_vs[None], in_channels=cin, stride=1, padding=1)
    s8 = quant_conv2d_infer(x, compute_dtype=jnp.int8, **kw)
    exact = quant_conv2d_infer(x, fused=False, **kw)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(exact),
                               rtol=1e-5, atol=1e-5)
