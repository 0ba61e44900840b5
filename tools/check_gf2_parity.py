"""On-chip gf-2 packed parity spot check (VERDICT r4 #8).

CPU tests already pin packed-vs-dense parity for gf-2 x ls-1
(tests/nn/test_packed_model.py); this verifies the TPU lowering of the
same program: the fused single-conv bake vs the bit-exact multi-pass
loop (fused=False) on real silicon must agree to bake-rounding
tolerance, and the threshold-folded form must match the unfolded one.

Small spatial size on purpose — parity needs the program, not the
batch-1024 shapes. Appends a row to tools/bench_ab_results.jsonl.

Usage: python tools/check_gf2_parity.py
"""

import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tools')

import jax
import jax.numpy as jnp
import numpy as np

from measure import enable_compile_cache, fill_quant_state, record

enable_compile_cache()


def main() -> None:
    from quant_tpu.nn import QResNet
    from quant_tpu.nn.export import (
        export_packed_variables, fold_xnor_thresholds,
    )

    layer = {'x_quant': 'gf-2', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    m = QResNet(
        block='xnor',
        layer0={'n_in_channels': 16, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None, nonlins=['prelu', 'prelu'], num_blocks=[1, 1, 1],
        output_classes=10, moving_average_mode='eval_only')
    key = jax.random.key(0)
    x = jax.random.normal(key, (8, 32, 32, 3), jnp.float32)
    v = fill_quant_state(dict(m.init(key, x[:2], True)))

    packed = m.clone(inference_mode='packed')
    pv = export_packed_variables(packed, v, x[:1])
    fused = np.asarray(packed.apply(pv, x, False))
    multi = np.asarray(
        m.clone(inference_mode='packed', pass_fusion=False).apply(
            pv, x, False))
    np.testing.assert_allclose(fused, multi, rtol=3e-3, atol=3e-3)

    fv = fold_xnor_thresholds(packed, pv)
    folded = np.asarray(
        packed.clone(bn_fold=True).apply(fv, x, False))
    np.testing.assert_allclose(folded, fused, rtol=3e-3, atol=3e-3)

    record(config='gf2_onchip_parity', batch=int(x.shape[0]),
           max_abs_fused_vs_multipass=float(
               np.abs(fused - multi).max()),
           max_abs_folded_vs_fused=float(np.abs(folded - fused).max()),
           platform=str(jax.devices()[0].platform), ok=True)


if __name__ == '__main__':
    main()
