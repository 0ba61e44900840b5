"""ls-2 x ls-1 formulation A/B (VERDICT r3 weak #6: close the bake gap).

CONCLUDED in round 4. Candidates were measured as FULL ResNet-18
forwards at batch 1024 (not isolated convs — dispatch floors lie):

  bake_f32      — f32-accumulated bf16 single-conv bake: 27.7k img/s.
                  THE WINNER; the library's only fused formulation.
  bake_bf16     — native-bf16 bake arithmetic: +0.2% (noise). Removed.
  s8_stack      — both sign planes batch-stacked into ONE s8 conv:
                  14.2k (operand-bandwidth-bound). Removed.
  s8_two_pass   — bit-exact loop, two separate s8 convs: 21.2k. Still
                  reachable via sign_compute='int8'.

The losing variants' module-global switches (_LS2_BAKE_DTYPE,
_LS2_S8_STACK) were deleted from ops/binary_infer.py after the A/B
concluded (VERDICT r4 #6); this probe now re-measures only the two
formulations the library still expresses.

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

    # The fused bf16 single-conv bake (library default for ls-2).
    run('bake_f32')
    # Bit-exact two-s8-pass formulation.
    run('s8_two_pass', sign_compute='int8')


if __name__ == '__main__':
    main()
