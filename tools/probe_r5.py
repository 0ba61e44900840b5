"""Round-2 probe set v4: Pallas fused stem pieces.

probe_r4 attributed the 11.4 ms stem (batch 1024, bf16) as ~7.0 ms
conv+BN+relu and ~4.4 ms maxpool, and showed every XLA-level pool
reformulation loses. These probes measure the Pallas alternatives on
silicon:

  pool_xla      — reduce_window 3x3/s2/p1 on (1024,112,112,64) bf16
  pool_pallas   — ops/pool.py max_pool_3x3_s2_p1, same operand
  pool_check    — bit-exactness of the two on device
  stem_pallas   — full stem with the Pallas pool (conv+BN+relu by XLA)

Usage: python tools/probe_r5.py <probe> | --list
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
from jax import lax

try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:
    pass

RESULTS = '/root/repo/tools/probe_r5_results.jsonl'
PROBES = {}
B = 1024


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def record(name, **kv):
    row = {'probe': name, **kv}
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(row) + '\n')
    print(json.dumps(row), flush=True)


def _pool_operand():
    key = jax.random.key(0)
    return jax.random.normal(key, (B, 112, 112, 64)).astype(jnp.bfloat16)


def _xla_pool(y):
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1),
                             [(0, 0), (1, 1), (1, 1), (0, 0)])


def _time(fn, operand, iters=12):
    """DCE-proof: chain iterations through a full reduction of the output."""

    @jax.jit
    def step(x):
        y = fn(x)
        return x * (1.0 + 1e-30 * jnp.mean(y).astype(x.dtype))

    y = step(operand)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    return (time.perf_counter() - t0) / iters


@probe
def pool_xla():
    sec = _time(_xla_pool, _pool_operand())
    record('pool_xla', ms=round(sec * 1e3, 3))


def _pool_variant_probe(w_stage):
    from quant_tpu.ops.pool import max_pool_3x3_s2_p1
    import functools
    y = _pool_operand()
    ref = _xla_pool(y[:8])
    got = max_pool_3x3_s2_p1(y[:8], w_stage=w_stage)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    fn = functools.partial(max_pool_3x3_s2_p1, w_stage=w_stage)
    sec = _time(fn, y)
    record(f'pool_pallas_{w_stage}', ms=round(sec * 1e3, 3),
           max_abs_err=err)


@probe
def pool_pallas():
    _pool_variant_probe('reshape')


@probe
def pool_pallas_lane():
    _pool_variant_probe('lane')


@probe
def pool_pallas_swap():
    _pool_variant_probe('swap')


@probe
def pool_check():
    from quant_tpu.ops.pool import max_pool_3x3_s2_p1
    y = _pool_operand()[:8]
    ref = _xla_pool(y)
    got = max_pool_3x3_s2_p1(y)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    record('pool_check', max_abs_err=err)


def _stem_operands():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, 224, 224, 3)).astype(jnp.bfloat16)
    w = (jax.random.normal(key, (7, 7, 3, 64)) * 0.05).astype(jnp.bfloat16)
    g = jnp.full((64,), 1.01, jnp.bfloat16)
    b = jnp.full((64,), 0.01, jnp.bfloat16)
    return x, w, g, b


@probe
def stem_pallas():
    from quant_tpu.ops.pool import max_pool_3x3_s2_p1

    def stem(x, w, g, b):
        y = lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)
        y = jnp.maximum(y.astype(jnp.bfloat16) * g + b, 0)
        return max_pool_3x3_s2_p1(y)

    x, w, g, b = _stem_operands()

    @jax.jit
    def step(x):
        y = stem(x, w, g, b)
        return x * (1.0 + 1e-30 * jnp.mean(y).astype(x.dtype))

    y = step(x)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    iters = 12
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    record('stem_pallas', ms=round((time.perf_counter() - t0) / iters * 1e3,
                                   3))


def _head_operands():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, 7, 7, 512)).astype(jnp.bfloat16)
    w = (jax.random.normal(key, (512, 1000)) * 0.05).astype(jnp.bfloat16)
    b = jnp.zeros((1000,), jnp.bfloat16)
    return x, w, b


def _time_head(fn, iters=24):
    """Chain via a broadcast of the reduced logits back into the input."""
    x, w, b = _head_operands()

    @jax.jit
    def step(t):
        y = fn(t, w, b)
        return t * (1.0 + 1e-30 * jnp.mean(y).astype(t.dtype))

    y = step(x)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    return (time.perf_counter() - t0) / iters


@probe
def head_asis():
    def f(t, w, b):
        return jnp.mean(t, axis=(1, 2)) @ w + b
    record('head_asis', ms=round(_time_head(f) * 1e3, 3))


@probe
def head_mean_only():
    def f(t, w, b):
        return jnp.mean(t, axis=(1, 2))
    record('head_mean_only', ms=round(_time_head(f) * 1e3, 3))


@probe
def head_fc_only():
    x, w, b = _head_operands()
    xm = jnp.mean(x, axis=(1, 2))

    @jax.jit
    def step(t):
        y = t @ w + b
        return t * (1.0 + 1e-30 * jnp.mean(y).astype(t.dtype))

    y = step(xm)
    _ = jax.device_get(jnp.sum(y[0, 0]))
    t0 = time.perf_counter()
    iters = 24
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0]))
    record('head_fc_only', ms=round((time.perf_counter() - t0) / iters * 1e3,
                                    3))


@probe
def head_sum_reshape():
    def f(t, w, b):
        s = jnp.sum(t.reshape(t.shape[0], 49, 512), axis=1)
        return (s * jnp.bfloat16(1 / 49)) @ w + b
    record('head_sum_reshape', ms=round(_time_head(f) * 1e3, 3))


@probe
def head_matmul_first():
    def f(t, w, b):
        y = t.reshape(-1, 512) @ w                    # (B*49, 1000) on MXU
        y = jnp.sum(y.reshape(t.shape[0], 49, 1000), axis=1)
        return y * jnp.bfloat16(1 / 49) + b
    record('head_matmul_first', ms=round(_time_head(f) * 1e3, 3))


def _packed_model(batch):
    sys.path.insert(0, '/root/repo')
    from bench import _resnet18
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)
    m = _resnet18('ls-1', 'ls-1', moving_average_mode='eval_only')
    v = dict(m.init(key, x[:2], True))
    v['quant_state'] = jax.tree.map(lambda t: jnp.full_like(t, 0.5),
                                    v.get('quant_state', {}))
    packed = m.clone(inference_mode='packed', eval_dtype=jnp.bfloat16,
                     sign_compute='int8')
    return packed, v, x


def _ips_dus(apply_fn, v, x, unroll, iters=12):
    """One-element DUS chain + donated carrier + in-jit unroll."""
    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def step(t):
        for _ in range(unroll):
            out = apply_fn(v, t, False)
            t = t.at[0, 0, 0, 0].add(
                (1e-12 * jnp.mean(out)).astype(t.dtype))
        return t

    y = step(x)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    dt = time.perf_counter() - t0
    return x.shape[0] * unroll * iters / dt


@probe
def ips_dus_u1():
    packed, v, x = _packed_model(B)
    record('ips_dus_u1', ips=round(_ips_dus(packed.apply, v, x, 1), 1))


@probe
def ips_dus_u4():
    packed, v, x = _packed_model(B)
    record('ips_dus_u4', ips=round(_ips_dus(packed.apply, v, x, 4), 1))


@probe
def ips_dus_u8():
    packed, v, x = _packed_model(B)
    record('ips_dus_u8', ips=round(_ips_dus(packed.apply, v, x, 8), 1))


def _conv_time(dtype, batch=256, hw=56, cin=64, cout=64, iters=12):
    """Body-layer 3x3 conv rate for a given operand dtype (signs)."""
    key = jax.random.key(0)
    signs = jnp.where(jax.random.bernoulli(key, 0.5,
                                           (batch, hw, hw, cin)), 1, -1)
    wsigns = jnp.where(jax.random.bernoulli(key, 0.5,
                                            (3, 3, cin, cout)), 1, -1)
    x = signs.astype(dtype)
    w = wsigns.astype(dtype)

    @jax.jit
    def step(t):
        y = lax.conv_general_dilated(
            t, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.int32)
        # Carry a full reduction back into the int operand domain.
        s = (jnp.sum(y) % 3 - 1).astype(t.dtype)
        return jnp.where(t == t[0, 0, 0, 0] * 0 + 1, s | 1, t)

    y = step(x)
    _ = jax.device_get(jnp.sum(y[:2, 0, 0].astype(jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[:2, 0, 0].astype(jnp.int32)))
    dt = (time.perf_counter() - t0) / iters
    macs = batch * hw * hw * 9 * cin * cout
    return dt, 2 * macs / dt / 1e12


@probe
def conv_s8_l1():
    dt, tops = _conv_time(jnp.int8)
    record('conv_s8_l1', ms=round(dt * 1e3, 3), tops=round(tops, 1))


@probe
def conv_s4_l1():
    dt, tops = _conv_time(jnp.int4)
    record('conv_s4_l1', ms=round(dt * 1e3, 3), tops=round(tops, 1))


def main():
    if len(sys.argv) < 2 or sys.argv[1] == '--list':
        print('\n'.join(PROBES))
        return
    t0 = time.perf_counter()
    try:
        PROBES[sys.argv[1]]()
    except Exception as e:  # noqa: BLE001
        record(sys.argv[1], error=f'{type(e).__name__}: {e}'[:300],
               wall_s=round(time.perf_counter() - t0, 1))
        sys.exit(1)


if __name__ == '__main__':
    main()
