"""ls-2 x ls-1 formulation A/B (VERDICT r3 weak #6: close the bake gap).

The fused bake (one bf16 conv over v1*b1+v2*b2) measured 85.6% of the
int8 ls-1 rate in round 3. Candidate reformulations, measured as FULL
ResNet-18 forwards (not isolated convs — dispatch floors lie):

  bake_f32      — current default: f32 accumulate the baked operand,
                  downcast once (ops/binary_infer.py fused path).
  bake_bf16     — bake arithmetic natively in bf16 (one less rounding
                  step in theory; XLA fuses either way).
  s8_stack      — BOTH sign planes stacked on the BATCH axis into ONE
                  s8xs8->s32 conv (2x rows at the 2x s8 rate ~= one
                  bf16 pass, bit-exact, no bake materialization),
                  outputs recombined with the per-sample scales.
  s8_two_pass   — existing bit-exact loop (two separate s8 convs).

Usage: python tools/probe_ls2_variants.py [batch] [iters]
Appends to tools/bench_ab_results.jsonl.
"""

import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tools')

import jax
import jax.numpy as jnp

from measure import enable_compile_cache, record, throughput

enable_compile_cache()


def main():
    from bench import _resnet18
    import quant_tpu.ops.binary_infer as BI

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)

    m = _resnet18('ls-2', 'ls-1', moving_average_mode='eval_only')
    v = dict(m.init(key, x[:2], True))
    v['quant_state'] = jax.tree.map(lambda t: jnp.full_like(t, 0.5),
                                    v.get('quant_state', {}))

    def run(tag, **clone_kw):
        packed = m.clone(inference_mode='packed',
                         eval_dtype=jnp.bfloat16, **clone_kw)
        ips = throughput(packed.apply, v, x, iters)
        record(config=f'ls2_variant_{tag}', batch=batch,
               ips=round(ips, 1))
        return ips

    # Current default (bf16 single-conv bake, f32 bake arithmetic).
    run('bake_f32')
    # Native-bf16 bake arithmetic.
    orig = BI.quant_conv2d_infer
    BI._LS2_BAKE_DTYPE = jnp.bfloat16
    try:
        run('bake_bf16')
    finally:
        if hasattr(BI, '_LS2_BAKE_DTYPE'):
            del BI._LS2_BAKE_DTYPE
    # Batch-stacked single s8 conv.
    BI._LS2_S8_STACK = True
    try:
        run('s8_stack', sign_compute='int8')
    finally:
        if hasattr(BI, '_LS2_S8_STACK'):
            del BI._LS2_S8_STACK
    # Two separate s8 passes (existing behavior under sign_compute=int8).
    run('s8_two_pass', sign_compute='int8')
    del orig


if __name__ == '__main__':
    main()
