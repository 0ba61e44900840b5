"""Benchmark: ResNet-18 1-bit-weight inference throughput vs fp32.

Prints ONE JSON line:
  {"metric": "resnet18_binary_infer_images_per_sec",
   "value": <images/sec/chip for the 1-bit-weight model>,
   "unit": "images/sec/chip",
   "vs_baseline": <binary images/sec divided by fp32 images/sec>}

The fp32 baseline is the same QResNet-18 with fp/fp schemes on the same
chip (the denominator of BASELINE.md's ">=8x fp32 images/sec/chip" north
star). Run on the real TPU via the axon platform (default env).
"""

import json
import time

import jax
import jax.numpy as jnp


def _resnet18(x_quant: str, w_quant: str):
    from quant_tpu.nn import QResNet
    layer = {'x_quant': x_quant, 'w_quant': w_quant,
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    return QResNet(
        block='xnor',
        layer0={'n_in_channels': 64, 'kernel_size': 7, 'stride': 2,
                'padding': 3, 'bias': False,
                'maxpool': {'type': 'maxpool2d', 'kernel_size': 3,
                            'stride': 2, 'padding': 1}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=dict(layer),
        nonlins=['prelu', 'prelu'],
        num_blocks=[2, 2, 2, 2],
        output_classes=1000,
    )


def _throughput(apply_fn, variables, x, iters: int = 20,
                warmup: int = 3) -> float:
    """Images/sec with iterations serialized by data dependency.

    On the axon-tunneled platform `block_until_ready` does not serialize
    with device execution, so each iteration folds a scalar function of
    the logits back into the input (forcing sequential execution) and a
    single scalar `device_get` at the end is the only synchronization.
    """

    @jax.jit
    def step(v, t):
        out = apply_fn(v, t, False)
        return t + 1e-12 * jnp.mean(out).astype(t.dtype)

    y = x
    for _ in range(warmup):
        y = step(variables, y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))

    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(variables, y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    dt = time.perf_counter() - t0
    return x.shape[0] * iters / dt


def main() -> None:
    batch = 256
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)

    binary = _resnet18('ls-1', 'ls-1')
    vb = binary.init(key, x[:2], True)
    # One train pass populates the cached weight scales the packed
    # eval path consumes.
    _, mut = binary.apply(vb, x[:2], True,
                          mutable=['quant_state', 'batch_stats'])
    vb = {**vb, **mut}
    packed = binary.clone(inference_mode='packed')
    ips_binary = _throughput(packed.apply, vb, x)

    fp = _resnet18('fp', 'fp')
    vf = fp.init(key, x[:2], True)
    ips_fp = _throughput(fp.apply, vf, x)

    print(json.dumps({
        'metric': 'resnet18_binary_infer_images_per_sec',
        'value': round(ips_binary, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(ips_binary / ips_fp, 3),
    }))


if __name__ == '__main__':
    main()
