"""Regular-block ResNet-18 family: binary vs ITS OWN fp32 baseline.

tools/bench_bn_fold.py found the conv->BN (regular) family serves 1-bit
inference at 37.2k img/s — 14% above the xnor flagship (the BN-before-
conv + double-shortcut ordering costs elementwise passes). For an
apples-to-apples vs_baseline ratio this measures the SAME regular
architecture in fp/fp at Precision.HIGHEST (bench.py baseline
semantics), plus the ls-2 x ls-1 variant.

Usage: python tools/bench_regular_family.py [batch] [iters]
Appends to tools/bench_ab_results.jsonl.
"""

import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tools')

import jax
import jax.numpy as jnp

from measure import enable_compile_cache, record, throughput

enable_compile_cache()


def _regular18(x_quant, w_quant, **kw):
    from quant_tpu.nn import QResNet
    layer = {'x_quant': x_quant, 'w_quant': w_quant,
             'clamp': {'kind': 'symmetric', 'alpha': 2.0}}
    return QResNet(
        block='regular',
        layer0={'n_in_channels': 64, 'kernel_size': 7, 'stride': 2,
                'padding': 3, 'bias': False,
                'maxpool': {'type': 'maxpool2d', 'kernel_size': 3,
                            'stride': 2, 'padding': 1}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=dict(layer), nonlins=['prelu', 'prelu'],
        num_blocks=[2, 2, 2, 2], output_classes=1000, **kw)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)

    fp = _regular18('fp', 'fp')
    vf = fp.init(key, x[:2], True)
    with jax.default_matmul_precision('highest'):
        ips_fp = throughput(fp.apply, vf, x, iters)
    record(config='regular_fp32_highest', batch=batch,
           ips=round(ips_fp, 1))

    ls2 = _regular18('ls-2', 'ls-1', moving_average_mode='eval_only')
    v2 = dict(ls2.init(key, x[:2], True))
    v2['quant_state'] = jax.tree.map(lambda t: jnp.full_like(t, 0.5),
                                     v2.get('quant_state', {}))
    packed2 = ls2.clone(inference_mode='packed', eval_dtype=jnp.bfloat16)
    ips2 = throughput(packed2.apply, v2, x, iters)
    record(config='regular_ls2_ls1', batch=batch, ips=round(ips2, 1))


if __name__ == '__main__':
    main()
