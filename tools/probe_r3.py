"""Round-2 probe set v2: DCE-proof timing.

probe_r2.py carried the loop dependency through a SLICE of the result
(`y[:1,:1]`), which XLA's algebraic simplifier can push into dot
operands (slice-of-dot -> dot-of-slices), so the matmul "peaks" there
may measure a 1xN dot plus the carry add. Here every probe carries the
dependency through a FULL REDUCTION (`eps * sum(y)`), which forces the
whole result to be computed, and where possible chains the op's output
directly into its next input (no side buffer traffic at all).

Usage: python tools/probe_r3.py <probe-name> | --list
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:
    pass

RESULTS = '/root/repo/tools/probe_r3_results.jsonl'
PROBES = {}
EPS = 1e-30


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def record(name, **kv):
    row = {'probe': name, **kv}
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(row) + '\n')
    print(json.dumps(row), flush=True)


def timed_loop(step, carry, sync, inner, outer=4):
    carry = step(carry)
    _ = jax.device_get(sync(carry))
    t0 = time.perf_counter()
    for _ in range(outer):
        carry = step(carry)
    _ = jax.device_get(sync(carry))
    dt = time.perf_counter() - t0
    return dt / (outer * inner)


def _matmul_chain(dtype, n=8192, inner=16):
    """a <- normalize(a @ b): output feeds the next input, full compute
    forced, values kept finite by a cheap rsqrt row scale (fused)."""
    key = jax.random.key(0)
    a = jax.random.normal(key, (n, n), jnp.float32).astype(dtype) / n
    b = jax.random.normal(jax.random.key(1), (n, n),
                          jnp.float32).astype(dtype) / n

    @jax.jit
    def step(a):
        def body(_, a):
            y = lax.dot(a, b, preferred_element_type=jnp.float32)
            # Output IS the next input (values decay to 0 with the 1/n
            # operand scaling — timing is unaffected).
            return y.astype(dtype)
        return lax.fori_loop(0, inner, body, a)

    sec = timed_loop(step, a, lambda c: jnp.sum(c[0, :8]), inner)
    return 2 * n ** 3 / sec / 1e12


@probe
def matmul_chain_bf16():
    record('matmul_chain_bf16', tflops=round(_matmul_chain(jnp.bfloat16), 1))


@probe
def matmul_chain_f32():
    record('matmul_chain_f32',
           tflops=round(_matmul_chain(jnp.float32, n=4096), 1))


@probe
def matmul_chain_f32_highest():
    n, inner = 4096, 16
    key = jax.random.key(0)
    a = jax.random.normal(key, (n, n), jnp.float32) / n
    b = jax.random.normal(jax.random.key(1), (n, n), jnp.float32) / n

    @jax.jit
    def step(a):
        def body(_, a):
            return lax.dot(a, b, preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
        return lax.fori_loop(0, inner, body, a)

    sec = timed_loop(step, a, lambda c: jnp.sum(c[0, :8]), inner)
    record('matmul_chain_f32_highest',
           tflops=round(2 * n ** 3 / sec / 1e12, 1))


def _conv_chain(B, H, C, k=3, dtype=jnp.bfloat16, inner=10):
    """x <- conv(x, w) s1 'same', C->C: output IS the next input."""
    key = jax.random.key(0)
    x = jnp.sign(jax.random.normal(key, (B, H, H, C))).astype(dtype)
    w = jnp.sign(jax.random.normal(key, (k, k, C, C))).astype(dtype)
    pad = (k - 1) // 2
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ('NHWC', 'HWIO', 'NHWC'))

    @jax.jit
    def step(x):
        def body(_, x):
            y = lax.conv_general_dilated(
                x, w, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=dn, preferred_element_type=jnp.float32)
            return jnp.sign(y).astype(dtype)  # re-binarize: bounded, fused
        return lax.fori_loop(0, inner, body, x)

    sec = timed_loop(step, x, lambda c: jnp.sum(c[0, 0, 0, :8]), inner)
    flops = 2 * B * H * H * C * C * k * k
    return sec, flops / sec / 1e12


@probe
def conv_chain_bf16():
    for B in (256, 1024):
        for name, H, C in (('l1', 56, 64), ('l2b', 28, 128),
                           ('l3b', 14, 256), ('l4b', 7, 512)):
            sec, tf = _conv_chain(B, H, C)
            record('conv_chain_bf16', layer=name, batch=B,
                   ms=round(sec * 1e3, 3), tflops=round(tf, 1))


def _conv_chain_int8(B, H, C, k=3, inner=10):
    """Chained 3x3 s1 conv in s8 x s8 -> s32 (compiles on this round's
    toolchain — probe_r2 conv_s8_small — unlike round 1's)."""
    key = jax.random.key(0)
    x = (jax.random.randint(key, (B, H, H, C), 0, 2, jnp.int8) * 2
         - 1).astype(jnp.int8)
    w = (jax.random.randint(key, (k, k, C, C), 0, 2, jnp.int8) * 2
         - 1).astype(jnp.int8)
    pad = (k - 1) // 2
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))

    @jax.jit
    def step(x):
        def body(_, x):
            y = lax.conv_general_dilated(
                x, w, (1, 1), [(pad, pad), (pad, pad)],
                dimension_numbers=dn, preferred_element_type=jnp.int32)
            return jnp.where(y >= 0, 1, -1).astype(jnp.int8)
        return lax.fori_loop(0, inner, body, x)

    sec = timed_loop(step, x,
                     lambda c: jnp.sum(c[0, 0, 0, :8].astype(jnp.int32)),
                     inner)
    flops = 2 * B * H * H * C * C * k * k
    return sec, flops / sec / 1e12


@probe
def conv_chain_int8():
    for B in (256, 1024):
        for name, H, C in (('l1', 56, 64), ('l2b', 28, 128),
                           ('l3b', 14, 256), ('l4b', 7, 512)):
            sec, tf = _conv_chain_int8(B, H, C)
            record('conv_chain_int8', layer=name, batch=B,
                   ms=round(sec * 1e3, 3), tops=round(tf, 1))


@probe
def conv_chain_wide_channels():
    """Is the conv rate limited by C? Try C=1024/2048 at tiny H."""
    for name, H, C in (('c1024', 7, 1024), ('c2048', 4, 2048)):
        sec, tf = _conv_chain(256, H, C)
        record('conv_chain_wide_channels', layer=name,
               ms=round(sec * 1e3, 3), tflops=round(tf, 1))


def _im2col_conv_chain(B, H, C, dtype=jnp.bfloat16, inner=8):
    """Same chained 3x3 s1 conv, computed as ONE (BHW, 9C)x(9C, C)
    matmul over shifted-slice patches."""
    key = jax.random.key(0)
    x = jnp.sign(jax.random.normal(key, (B, H, H, C))).astype(dtype)
    w = jnp.sign(jax.random.normal(key, (9 * C, C))).astype(dtype)

    @jax.jit
    def step(x):
        def body(_, x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [lax.dynamic_slice(xp, (0, dy, dx, 0), (B, H, H, C))
                    for dy in range(3) for dx in range(3)]
            patches = jnp.concatenate(cols, -1).reshape(B * H * H, 9 * C)
            y = lax.dot_general(patches, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return jnp.sign(y).astype(dtype).reshape(B, H, H, C)
        return lax.fori_loop(0, inner, body, x)

    sec = timed_loop(step, x, lambda c: jnp.sum(c[0, 0, 0, :8]), inner)
    flops = 2 * B * H * H * C * C * 9
    return sec, flops / sec / 1e12


@probe
def conv_im2col_chain_bf16():
    for name, H, C in (('l1', 56, 64), ('l3b', 14, 256), ('l4b', 7, 512)):
        sec, tf = _im2col_conv_chain(256, H, C)
        record('conv_im2col_chain_bf16', layer=name,
               ms=round(sec * 1e3, 3), tflops=round(tf, 1))


@probe
def elementwise_chain_v2():
    """BN+PReLU+sign, output chained into next input. GB/s = one read +
    one write of the tensor per rep (everything else fuses)."""
    B = 256
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, 56, 56, 64)).astype(jnp.bfloat16)
    g = jnp.full((64,), 1.01, jnp.bfloat16)
    b = jnp.full((64,), 0.01, jnp.bfloat16)
    inner = 20

    @jax.jit
    def step(x):
        def body(_, x):
            y = x * g + b
            y = jnp.where(y >= 0, y, 0.25 * y)
            return jnp.sign(y).astype(jnp.bfloat16) * 1.5
        return lax.fori_loop(0, inner, body, x)

    sec = timed_loop(step, x, lambda c: jnp.sum(c[0, 0, 0, :8]), inner)
    gb = 2 * x.size * 2 / 1e9
    record('elementwise_chain_v2', ms=round(sec * 1e3, 3),
           gbps=round(gb / sec, 1))


@probe
def stem_vs_s2d_v2():
    """Regular vs space-to-depth stem with a sum-carry (both forced)."""
    sys.path.insert(0, '/root/repo')
    from quant_tpu.ops.conv import conv2d, stem_conv_s2d
    B = 256
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, 224, 224, 3)).astype(jnp.bfloat16)
    w = (jax.random.normal(key, (7, 7, 3, 64)).astype(jnp.bfloat16)
         * 0.05)
    inner = 10

    def run(fn):
        @jax.jit
        def step(x):
            def body(_, x):
                y = fn(x)
                return x * (1.0 + EPS * jnp.sum(y).astype(x.dtype))
            return lax.fori_loop(0, inner, body, x)
        return timed_loop(step, x, lambda c: jnp.sum(c[0, 0, 0, :3]),
                          inner)

    sec_reg = run(lambda t: conv2d(t, w, stride=2, padding=3))
    record('stem_vs_s2d_v2', kind='regular', ms=round(sec_reg * 1e3, 3))
    sec_s2d = run(lambda t: stem_conv_s2d(t, w))
    record('stem_vs_s2d_v2', kind='s2d', ms=round(sec_s2d * 1e3, 3))


@probe
def batch_sweep_model():
    """Full packed ls-1 ResNet-18 throughput vs batch (the bench.py
    model, s2d stem ON) — find the sweet spot."""
    sys.path.insert(0, '/root/repo')
    from bench import _resnet18
    key = jax.random.key(0)
    for batch in (512, 1024, 2048):
        x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)
        m = _resnet18('ls-1', 'ls-1', moving_average_mode='eval_only',
                      stem_s2d=True)
        v = dict(m.init(key, x[:2], True))
        v['quant_state'] = jax.tree.map(lambda t: jnp.full_like(t, 0.5),
                                        v.get('quant_state', {}))
        packed = m.clone(inference_mode='packed', eval_dtype=jnp.bfloat16)

        @jax.jit
        def step(t):
            out = packed.apply(v, t, False)
            return t + 1e-12 * jnp.mean(out).astype(t.dtype)

        y = step(x)
        _ = jax.device_get(jnp.sum(y[0, 0, 0]))
        iters = 12
        t0 = time.perf_counter()
        for _ in range(iters):
            y = step(y)
        _ = jax.device_get(jnp.sum(y[0, 0, 0]))
        dt = time.perf_counter() - t0
        record('batch_sweep_model', batch=batch,
               ips=round(batch * iters / dt, 1))


def _pallas_mm(dtype, acc_dtype, n=4096, tm=256, tn=256, tk=512,
               inner=8):
    """Properly tiled Pallas matmul: grid (M/tm, N/tn, K/tk), k
    innermost, VMEM accumulator, output written on the last k step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(a_ref[...], b_ref[...],
                                preferred_element_type=acc_dtype)

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _flush():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    key = jax.random.key(0)
    if dtype == jnp.int8:
        a = (jax.random.randint(key, (n, n), 0, 2, jnp.int8) * 2
             - 1).astype(jnp.int8)
        b = a.T
    else:
        a = (jax.random.normal(key, (n, n), jnp.float32) / n).astype(dtype)
        b = (jax.random.normal(jax.random.key(1), (n, n), jnp.float32)
             / n).astype(dtype)

    mm = pl.pallas_call(
        kernel,
        grid=(n // tm, n // tn, n // tk),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), acc_dtype)],
    )

    @jax.jit
    def step(a):
        def body(_, a):
            return mm(a, b)
        return lax.fori_loop(0, inner, body, a)

    sec = timed_loop(step, a,
                     lambda c: jnp.sum(c[0, :8].astype(jnp.float32)),
                     inner)
    return 2 * n ** 3 / sec / 1e12


@probe
def pallas_matmul_bf16_v2():
    t = _pallas_mm(jnp.bfloat16, jnp.float32)
    record('pallas_matmul_bf16_v2', tflops=round(t, 1))


@probe
def pallas_matmul_int8():
    t = _pallas_mm(jnp.int8, jnp.int32)
    record('pallas_matmul_int8', tops=round(t, 1))


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
