"""A/B: threshold folding on the packed XNOR-ordering ResNet-18
(VERDICT r4 #1).

The xnor families put BN BEFORE each quantized conv; in packed eval
with EMA scales, BN + clamp + sign extraction fold into per-channel
threshold compares on the raw block input
(nn/export.fold_xnor_thresholds), so the BN'd bf16 feature map is
never materialized. This measures fold-vs-no-fold as FULL models at
batch 1024 with the shared DCE-proof protocol, for both the ls-1
flagship and the ls-2 x ls-1 accuracy recipe, plus an on-chip parity
spot check (the folded and unfolded logits must agree).

Usage: python tools/bench_xnor_fold.py [batch] [iters]
Appends to tools/bench_ab_results.jsonl.
"""

import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tools')

import jax
import jax.numpy as jnp
import numpy as np

from measure import (enable_compile_cache, fill_quant_state, record,
                     throughput)

enable_compile_cache()


def main():
    from bench import _resnet18

    from quant_tpu.nn.export import (
        export_packed_variables, fold_xnor_thresholds,
    )

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)

    for x_quant, sign_compute in (('ls-1', 'int8'), ('ls-2', 'auto')):
        m = _resnet18(x_quant, 'ls-1', moving_average_mode='eval_only')
        v = fill_quant_state(dict(m.init(key, x[:2], True)))
        packed = m.clone(inference_mode='packed',
                         eval_dtype=jnp.bfloat16,
                         sign_compute=sign_compute)
        pv = export_packed_variables(packed, v, x[:1])
        ips = throughput(packed.apply, pv, x, iters)
        record(config=f'xnorfold_{x_quant}_base', batch=batch,
               ips=round(ips, 1))

        fv = fold_xnor_thresholds(packed, pv)
        folded = packed.clone(bn_fold=True)
        # On-chip parity spot check before timing.
        ref = np.asarray(packed.apply(pv, x[:8], False))
        out = np.asarray(folded.apply(fv, x[:8], False))
        np.testing.assert_allclose(out, ref, rtol=3e-3, atol=3e-3)
        ips_f = throughput(folded.apply, fv, x, iters)
        record(config=f'xnorfold_{x_quant}_folded', batch=batch,
               ips=round(ips_f, 1),
               delta_pct=round(100.0 * (ips_f / ips - 1.0), 2))


if __name__ == '__main__':
    main()
