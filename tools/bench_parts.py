"""Attribute packed ResNet-18 inference time: stem vs body vs head.

Times three jitted sub-programs on the chip (one process, one claim):
  stem: conv1(+s2d) + BN + relu + maxpool on (B,224,224,3)
  body: layer1..layer4 packed binary stages on (B,56,56,64)
  head: global-avg-pool + fc on (B,7,7,512)
and the full model, so `full - (stem+body+head)` exposes glue/overhead.

Usage: python tools/bench_parts.py [batch] [sign_compute] [stem_s2d01]
Appends to tools/bench_parts_results.jsonl.
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

RESULTS = '/root/repo/tools/bench_parts_results.jsonl'


def record(**kv):
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(kv) + '\n')
    print(json.dumps(kv), flush=True)


def timeit(apply_fn, x, iters=16):
    @jax.jit
    def step(t):
        out = apply_fn(t)
        return t * (1.0 + 1e-30 * jnp.mean(out).astype(t.dtype))

    y = step(x)
    _ = jax.device_get(jnp.mean(y[0, 0, 0] if y.ndim == 4 else y[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.mean(y[0, 0, 0] if y.ndim == 4 else y[0]))
    return (time.perf_counter() - t0) / iters


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    comp = sys.argv[2] if len(sys.argv) > 2 else 'int8'
    s2d = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    from bench import _resnet18
    import flax.linen as nn
    from quant_tpu.nn.layers import BatchNorm, Conv, Dense
    from quant_tpu.ops.conv import global_avg_pool, max_pool2d

    key = jax.random.key(0)
    m = _resnet18('ls-1', 'ls-1', moving_average_mode='eval_only',
                  stem_s2d=s2d)
    x224 = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)
    v = dict(m.init(key, x224[:2], True))
    v['quant_state'] = jax.tree.map(lambda t: jnp.full_like(t, 0.5),
                                    v.get('quant_state', {}))
    packed = m.clone(inference_mode='packed', eval_dtype=jnp.bfloat16,
                     sign_compute=comp)

    sec_full = timeit(lambda t: packed.apply(v, t, False), x224)
    record(part='full', batch=batch, sign_compute=comp, stem_s2d=s2d,
           ms=round(sec_full * 1e3, 3),
           ips=round(batch / sec_full, 1))

    # Stem in isolation (same params).
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, t):
            t = t.astype(jnp.bfloat16)
            t = Conv(64, 7, stride=2, padding=3, use_bias=False,
                     dtype=jnp.bfloat16, s2d=s2d, name='conv1')(t)
            t = nn.relu(BatchNorm(dtype=jnp.bfloat16, name='bn1')(t, False))
            return max_pool2d(t, kernel_size=3, stride=2, padding=1)

    stem_vars = {'params': {'conv1': v['params']['conv1'],
                            'bn1': v['params']['bn1']},
                 'batch_stats': {'bn1': v['batch_stats']['bn1']}}
    sec_stem = timeit(lambda t: Stem().apply(stem_vars, t), x224)
    record(part='stem', batch=batch, sign_compute=comp, stem_s2d=s2d,
           ms=round(sec_stem * 1e3, 3))

    # Head in isolation.
    x7 = jax.random.normal(key, (batch, 7, 7, 512), jnp.bfloat16)

    class Head(nn.Module):
        @nn.compact
        def __call__(self, t):
            return Dense(1000, dtype=jnp.bfloat16,
                         name='fc')(global_avg_pool(t))

    head_vars = {'params': {'fc': v['params']['fc']}}
    sec_head = timeit(lambda t: Head().apply(head_vars, t), x7)
    record(part='head', batch=batch, sign_compute=comp,
           ms=round(sec_head * 1e3, 3))

    body_ms = (sec_full - sec_stem - sec_head) * 1e3
    record(part='body_residual', batch=batch, sign_compute=comp,
           ms=round(body_ms, 3))


if __name__ == '__main__':
    main()
