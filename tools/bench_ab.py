"""A/B matrix on the packed ResNet-18: stem mode x sign-compute dtype.

Runs every config in ONE process (one TPU claim), same measurement
pattern as bench.py, results appended to tools/bench_ab_results.jsonl.

Usage: python tools/bench_ab.py [batch] [iters]
"""

import itertools
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


def record(**kv):
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(kv) + '\n')
    print(json.dumps(kv), flush=True)


def measure(x_quant, w_quant, *, stem_s2d, sign_compute, batch, iters):
    from bench import _resnet18
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)
    m = _resnet18(x_quant, w_quant, moving_average_mode='eval_only',
                  stem_s2d=stem_s2d)
    v = dict(m.init(key, x[:2], True))
    v['quant_state'] = jax.tree.map(lambda t: jnp.full_like(t, 0.5),
                                    v.get('quant_state', {}))
    packed = m.clone(inference_mode='packed', eval_dtype=jnp.bfloat16,
                     sign_compute=sign_compute)

    @jax.jit
    def step(t):
        out = packed.apply(v, t, False)
        return t + 1e-12 * jnp.mean(out).astype(t.dtype)

    y = step(x)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    for s2d, comp in itertools.product((False, True), ('bf16', 'int8')):
        ips = measure('ls-1', 'ls-1', stem_s2d=s2d, sign_compute=comp,
                      batch=batch, iters=iters)
        record(config='ls1_ls1', stem_s2d=s2d, sign_compute=comp,
               batch=batch, ips=round(ips, 1))
    # Flagship 2-bit config: fused bf16 bake vs int8 two-pass.
    for comp in ('bf16', 'int8'):
        ips = measure('ls-2', 'ls-1', stem_s2d=True, sign_compute=comp,
                      batch=batch, iters=iters)
        record(config='ls2_ls1', stem_s2d=True, sign_compute=comp,
               batch=batch, ips=round(ips, 1))


if __name__ == '__main__':
    main()
