"""A/B: export-time BN folding on the packed regular-block ResNet-18.

Measures fold-vs-no-fold on the conv->BN family where the fold is
defined (VERDICT r3 weak #5), plus the xnor flagship as context (its BN
precedes the convs — nothing folds there by construction). Also A/Bs
the ls-2 bake dtype (fp32 accumulate-then-downcast vs native-bf16
accumulation of the baked activation operand, VERDICT r3 weak #6).

Same measurement pattern as bench.py (UNROLL=4 forwards chained through
a one-element full-reduction carry inside one jit, one device_get).
Appends to tools/bench_ab_results.jsonl.

Usage: python tools/bench_bn_fold.py [batch] [iters]
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp

try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:
    pass

RESULTS = '/root/repo/tools/bench_ab_results.jsonl'
UNROLL = 4


def record(**kv):
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(kv) + '\n')
    print(json.dumps(kv), flush=True)


def throughput(apply_fn, variables, x, iters):
    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def step(t):
        for _ in range(UNROLL):
            out = apply_fn(variables, t, False)
            t = t.at[0, 0, 0, 0].add(
                (1e-12 * jnp.mean(out)).astype(t.dtype))
        return t

    y = step(jnp.array(x, copy=True))
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    return x.shape[0] * UNROLL * iters / (time.perf_counter() - t0)


def main():
    from bench import _resnet18

    from quant_tpu.nn.export import (
        export_packed_variables, fold_bn_into_packed,
    )
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)

    for block in ('regular', 'xnor'):
        m = _resnet18('ls-1', 'ls-1', block=block,
                      moving_average_mode='eval_only')
        v = dict(m.init(key, x[:2], True))
        v['quant_state'] = jax.tree.map(lambda t: jnp.full_like(t, 0.5),
                                        v.get('quant_state', {}))
        packed = m.clone(inference_mode='packed',
                         eval_dtype=jnp.bfloat16, sign_compute='int8')
        pv = export_packed_variables(packed, v, x[:1])
        ips = throughput(packed.apply, pv, x, iters)
        record(config=f'bnfold_{block}_base', batch=batch,
               ips=round(ips, 1))
        if block == 'regular':
            fv = fold_bn_into_packed(packed, pv)
            folded = packed.clone(bn_fold=True)
            ips_f = throughput(folded.apply, fv, x, iters)
            record(config='bnfold_regular_folded', batch=batch,
                   ips=round(ips_f, 1))


if __name__ == '__main__':
    main()
