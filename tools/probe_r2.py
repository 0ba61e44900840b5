"""Round-2 TPU microprobes: find where the 2x to the 8x north star lives.

Each probe is a subcommand run in its OWN python process (one TPU claim
at a time, sequentially — see .claude/skills/verify/SKILL.md). Results
append to tools/probe_r2_results.jsonl so a hang in a later probe cannot
lose earlier measurements.

Timing pattern: the op under test runs INNER times inside a
`lax.fori_loop` (small body — the remote-compiler hang is specific to
fori_loop-wrapped *large* models), chained through a data dependency;
the host loop adds OUTER dispatches on top. One scalar device_get syncs.

Usage: python tools/probe_r2.py <probe-name>
       python tools/probe_r2.py --list
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

RESULTS = '/root/repo/tools/probe_r2_results.jsonl'
PROBES = {}


def probe(fn):
    PROBES[fn.__name__] = fn
    return fn


def record(name, **kv):
    row = {'probe': name, **kv}
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(row) + '\n')
    print(json.dumps(row), flush=True)


def timed_loop(step, carry, sync, inner, outer=4):
    """step: carry->carry jitted fn containing a fori_loop of `inner` reps.

    Returns seconds per single op rep."""
    carry = step(carry)                      # compile + warm
    _ = jax.device_get(sync(carry))
    t0 = time.perf_counter()
    for _ in range(outer):
        carry = step(carry)
    _ = jax.device_get(sync(carry))
    dt = time.perf_counter() - t0
    return dt / (outer * inner)


def _matmul_probe(dtype, acc_dtype, n=8192, inner=16):
    key = jax.random.key(0)
    if dtype == jnp.int8:
        a = jax.random.randint(key, (n, n), -127, 127, jnp.int8)
        b = jax.random.randint(key, (n, n), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(key, (n, n), jnp.float32).astype(dtype)
        b = jax.random.normal(key, (n, n), jnp.float32).astype(dtype)

    @jax.jit
    def step(a):
        def body(_, a):
            y = lax.dot(a, b, preferred_element_type=acc_dtype)
            # structural data dependency, numerically a no-op
            return (a + (y[:1, :1] * 0).astype(a.dtype))
        return lax.fori_loop(0, inner, body, a)

    sec = timed_loop(step, a, lambda c: jnp.sum(c[0, :8]), inner)
    return 2 * n ** 3 / sec / 1e12  # T(FL)OP/s


@probe
def matmul_bf16():
    t = _matmul_probe(jnp.bfloat16, jnp.float32)
    record('matmul_bf16', tflops=round(t, 1), n=8192)


@probe
def matmul_f32():
    t = _matmul_probe(jnp.float32, jnp.float32, n=4096)
    record('matmul_f32', tflops=round(t, 1), n=4096)


@probe
def matmul_int8():
    t = _matmul_probe(jnp.int8, jnp.int32)
    record('matmul_int8', tops=round(t, 1), n=8192)


# ResNet-18 conv shapes (NHWC): (name, H, Cin, Cout, k, stride)
RESNET_SHAPES = [
    ('stem', 224, 3, 64, 7, 2),
    ('l1', 56, 64, 64, 3, 1),
    ('l2a', 56, 64, 128, 3, 2),
    ('l2b', 28, 128, 128, 3, 1),
    ('l3a', 28, 128, 256, 3, 2),
    ('l3b', 14, 256, 256, 3, 1),
    ('l4a', 14, 256, 512, 3, 2),
    ('l4b', 7, 512, 512, 3, 1),
    ('ds2', 56, 64, 128, 1, 2),
    ('ds3', 28, 128, 256, 1, 2),
    ('ds4', 14, 256, 512, 1, 2),
]


def _conv_time(B, H, cin, cout, k, stride, dtype=jnp.bfloat16, inner=10,
               precision=None):
    key = jax.random.key(0)
    x = jnp.sign(jax.random.normal(key, (B, H, H, cin))).astype(dtype)
    w = jnp.sign(jax.random.normal(key, (k, k, cin, cout))).astype(dtype)
    pad = (k - 1) // 2 if k > 1 else 0
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))

    @jax.jit
    def step(x):
        def body(_, x):
            y = lax.conv_general_dilated(
                x, w, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=dn, preferred_element_type=jnp.float32,
                precision=precision)
            return x + (y[:1, :1, :1, :1] * 0).astype(x.dtype)
        return lax.fori_loop(0, inner, body, x)

    sec = timed_loop(step, x, lambda c: jnp.sum(c[0, 0, 0, :8]), inner)
    ho = (H + 2 * pad - k) // stride + 1
    flops = 2 * B * ho * ho * cout * cin * k * k
    return sec, flops / sec / 1e12


@probe
def conv_shapes_bf16():
    B = 256
    for name, H, cin, cout, k, s in RESNET_SHAPES:
        sec, tf = _conv_time(B, H, cin, cout, k, s)
        record('conv_shapes_bf16', shape=name, batch=B,
               ms=round(sec * 1e3, 3), tflops=round(tf, 1))


@probe
def conv_l1_batches():
    for B in (128, 512, 1024):
        sec, tf = _conv_time(B, 56, 64, 64, 3, 1)
        record('conv_l1_batches', batch=B, ms=round(sec * 1e3, 3),
               tflops=round(tf, 1))


@probe
def conv_stem_fp32_highest():
    sec, tf = _conv_time(256, 224, 3, 64, 7, 2, dtype=jnp.float32,
                         precision=lax.Precision.HIGHEST)
    record('conv_stem_fp32_highest', ms=round(sec * 1e3, 3),
           tflops=round(tf, 1))


@probe
def elementwise_chain():
    """BN+PReLU+sign chain on a layer1-sized bf16 tensor -> GB/s."""
    B = 256
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, 56, 56, 64)).astype(jnp.bfloat16)
    g = jnp.ones((64,), jnp.bfloat16)
    b = jnp.zeros((64,), jnp.bfloat16)
    inner = 20

    @jax.jit
    def step(x):
        def body(_, x):
            y = x * g + b
            y = jnp.where(y >= 0, y, 0.25 * y)
            y = jnp.sign(y)
            return x + (y[:1, :1, :1, :1] * 0).astype(x.dtype)
        return lax.fori_loop(0, inner, body, x)

    sec = timed_loop(step, x, lambda c: jnp.sum(c[0, 0, 0, :8]), inner)
    gb = 2 * x.size * 2 / 1e9  # read + write, bf16
    record('elementwise_chain', ms=round(sec * 1e3, 3),
           gbps=round(gb / sec, 1))


@probe
def maxpool():
    B = 256
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, 112, 112, 64)).astype(jnp.bfloat16)
    inner = 20

    @jax.jit
    def step(x):
        def body(_, x):
            y = lax.reduce_window(x, -jnp.inf, lax.max, (1, 3, 3, 1),
                                  (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1),
                                                 (0, 0)])
            return x + (y[:1, :1, :1, :1] * 0).astype(x.dtype)
        return lax.fori_loop(0, inner, body, x)

    sec = timed_loop(step, x, lambda c: jnp.sum(c[0, 0, 0, :8]), inner)
    record('maxpool', ms=round(sec * 1e3, 3))


@probe
def stem_s2d():
    """Space-to-depth stem: 2x2 blocks -> (112,112,12), 4x4/s1 conv."""
    B = 256
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, 224, 224, 3)).astype(jnp.bfloat16)
    w = jax.random.normal(key, (4, 4, 12, 64)).astype(jnp.bfloat16)
    dn = None
    inner = 10

    @jax.jit
    def step(x):
        def body(_, x):
            xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))  # 230
            xp = xp[:, :-2, :-2, :]                            # 228
            s2d = xp.reshape(B, 114, 2, 114, 2, 3).transpose(
                0, 1, 3, 2, 4, 5).reshape(B, 114, 114, 12)
            y = lax.conv_general_dilated(
                s2d, w, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=lax.conv_dimension_numbers(
                    s2d.shape, w.shape, ('NHWC', 'HWIO', 'NHWC')),
                preferred_element_type=jnp.float32)
            return x + (y[:1, :1, :1, :1] * 0).astype(x.dtype)
        return lax.fori_loop(0, inner, body, x)

    sec = timed_loop(step, x, lambda c: jnp.sum(c[0, 0, 0, :3]), inner)
    record('stem_s2d', ms=round(sec * 1e3, 3))
    sec_ref, _ = _conv_time(B, 224, 3, 64, 7, 2)
    record('stem_regular', ms=round(sec_ref * 1e3, 3))


@probe
def winograd_matmuls():
    """The F(2x2,3x3) transform-domain cost: 16 batched matmuls of
    (B*28*28, C, C) vs the direct 3x3 conv, per layer width."""
    B = 256
    key = jax.random.key(0)
    for cname, H, C in (('l1', 56, 64), ('l3b', 14, 256), ('l4b', 7, 512)):
        tiles = (H // 2) ** 2
        a = jax.random.normal(key, (16, B * tiles, C)).astype(jnp.bfloat16)
        w = jax.random.normal(key, (16, C, C)).astype(jnp.bfloat16)
        inner = 10

        @jax.jit
        def step(a):
            def body(_, a):
                y = lax.dot_general(
                    a, w, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
                return a + (y[:1, :1, :1] * 0).astype(a.dtype)
            return lax.fori_loop(0, inner, body, a)

        sec = timed_loop(step, a, lambda c: jnp.sum(c[0, 0, :8]), inner)
        sec_direct, tf_direct = _conv_time(B, H, C, C, 3, 1)
        record('winograd_matmuls', layer=cname, batch=B,
               wino_matmul_ms=round(sec * 1e3, 3),
               direct_conv_ms=round(sec_direct * 1e3, 3),
               direct_tflops=round(tf_direct, 1))


@probe
def matmul_int4():
    """int4 MXU rate (Trillium doubles int8 -> ~3.5 PFLOP/s if exposed)."""
    n, inner = 8192, 16
    key = jax.random.key(0)
    a = jax.random.randint(key, (n, n), -7, 7, jnp.int8).astype(jnp.int4)
    b = jax.random.randint(key, (n, n), -7, 7, jnp.int8).astype(jnp.int4)

    @jax.jit
    def step(a):
        def body(_, a):
            y = lax.dot(a, b, preferred_element_type=jnp.int32)
            return (a + (y[:1, :1] * 0).astype(a.dtype))
        return lax.fori_loop(0, inner, body, a)

    sec = timed_loop(step, a, lambda c: jnp.sum(c[0, :8].astype(jnp.int32)),
                     inner)
    record('matmul_int4', tops=round(2 * n ** 3 / sec / 1e12, 1))


def _shift_matmul_conv(B, H, C_in, C_out, dtype, acc, inner=8):
    """3x3 s1 conv as 9 shifted (B*H*W, Cin) @ (Cin, Cout) matmuls —
    avoids conv_general_dilated entirely (the s8 conv lowering hangs on
    this platform; dot_general is fine)."""
    key = jax.random.key(0)
    if dtype == jnp.int8:
        x = jax.random.randint(key, (B, H, H, C_in), -1, 2, jnp.int8)
        x = (x * 2 - 1).astype(jnp.int8)
        ws = [jax.random.randint(key, (C_in, C_out), -1, 2, jnp.int8)
              for _ in range(9)]
    else:
        x = jnp.sign(jax.random.normal(key, (B, H, H, C_in))).astype(dtype)
        ws = [jnp.sign(jax.random.normal(key, (C_in, C_out))).astype(dtype)
              for _ in range(9)]

    @jax.jit
    def step(x):
        def body(_, x):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            acc_v = None
            for i, (dy, dx) in enumerate(
                    (dy, dx) for dy in range(3) for dx in range(3)):
                xs = lax.dynamic_slice(
                    xp, (0, dy, dx, 0), (B, H, H, C_in))
                y = lax.dot_general(
                    xs.reshape(B * H * H, C_in), ws[i],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=acc)
                acc_v = y if acc_v is None else acc_v + y
            return x + (acc_v[:1, :1] * 0).reshape(1, 1, 1, 1).astype(
                x.dtype)
        return lax.fori_loop(0, inner, body, x)

    sec = timed_loop(step, x,
                     lambda c: jnp.sum(c[0, 0, 0, :8].astype(jnp.float32)),
                     inner)
    flops = 2 * B * H * H * C_in * C_out * 9
    return sec, flops / sec / 1e12


@probe
def conv_shift_matmul():
    """Shift-matmul conv in bf16 AND int8 vs the direct bf16 conv, on
    the 3x3 stride-1 ResNet shapes."""
    B = 256
    for name, H, C in (('l1', 56, 64), ('l2b', 28, 128),
                       ('l3b', 14, 256), ('l4b', 7, 512)):
        sec_bf, tf_bf = _shift_matmul_conv(B, H, C, C, jnp.bfloat16,
                                           jnp.float32)
        record('conv_shift_matmul', layer=name, dtype='bf16',
               ms=round(sec_bf * 1e3, 3), tflops=round(tf_bf, 1))
        sec_i8, tf_i8 = _shift_matmul_conv(B, H, C, C, jnp.int8,
                                           jnp.int32)
        record('conv_shift_matmul', layer=name, dtype='int8',
               ms=round(sec_i8 * 1e3, 3), tops=round(tf_i8, 1))


@probe
def conv_im2col_int8():
    """3x3 conv as ONE int8 matmul over im2col patches (K=9*Cin):
    trades 9x activation HBM for a single large-K MXU call."""
    B = 256
    key = jax.random.key(0)
    for name, H, C in (('l1', 56, 64), ('l3b', 14, 256), ('l4b', 7, 512)):
        x = (jax.random.randint(key, (B, H, H, C), 0, 2, jnp.int8) * 2
             - 1).astype(jnp.int8)
        w = (jax.random.randint(key, (9 * C, C), 0, 2, jnp.int8) * 2
             - 1).astype(jnp.int8)
        inner = 8

        @jax.jit
        def step(x, w=w, H=H, C=C):
            def body(_, x):
                xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                cols = [lax.dynamic_slice(xp, (0, dy, dx, 0),
                                          (B, H, H, C))
                        for dy in range(3) for dx in range(3)]
                patches = jnp.concatenate(cols, axis=-1).reshape(
                    B * H * H, 9 * C)
                y = lax.dot_general(patches, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                return x + (y[:1, :1] * 0).reshape(1, 1, 1, 1).astype(
                    x.dtype)
            return lax.fori_loop(0, inner, body, x)

        sec = timed_loop(step, x,
                         lambda c: jnp.sum(c[0, 0, 0, :8].astype(
                             jnp.float32)), inner)
        flops = 2 * B * H * H * C * C * 9
        record('conv_im2col_int8', layer=name, ms=round(sec * 1e3, 3),
               tops=round(flops / sec / 1e12, 1))


@probe
def conv_s8_small():
    """Does a TINY s8 conv compile at all on this toolchain? (Round-1:
    s8 convs hang the remote compiler. Chip/toolchain changed in round
    2 — re-probe. RUN LAST: a hang blocks the tunnel.)"""
    key = jax.random.key(0)
    x = (jax.random.randint(key, (8, 8, 8, 32), 0, 2, jnp.int8) * 2
         - 1).astype(jnp.int8)
    w = (jax.random.randint(key, (3, 3, 32, 32), 0, 2, jnp.int8) * 2
         - 1).astype(jnp.int8)
    dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                    ('NHWC', 'HWIO', 'NHWC'))

    @jax.jit
    def f(x):
        return lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    y = jax.device_get(f(x))
    record('conv_s8_small', compiled=True, checksum=int(y.sum()))


@probe
def pallas_add():
    """Does pallas_call compile AT ALL through the axon tunnel?"""
    from jax.experimental import pallas as pl

    def kernel(x_ref, y_ref, o_ref):
        o_ref[...] = x_ref[...] + y_ref[...]

    x = jnp.arange(1024 * 256, dtype=jnp.float32).reshape(1024, 256)

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x, 2.0 * x)

    y = run(x)
    ok = bool(jax.device_get(jnp.allclose(y, 3.0 * x)))
    record('pallas_add', compiled=True, correct=ok)


@probe
def pallas_matmul_bf16():
    """Tiled Pallas bf16 matmul — MXU rate achievable from Pallas here."""
    from jax.experimental import pallas as pl

    n, tile = 4096, 512
    key = jax.random.key(0)
    a = jax.random.normal(key, (n, n), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(key, (n, n), jnp.float32).astype(jnp.bfloat16)

    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((tile, tile), jnp.float32)
        for k in range(n // tile):
            acc += jnp.dot(a_ref[:, k * tile:(k + 1) * tile],
                           b_ref[k * tile:(k + 1) * tile, :],
                           preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(jnp.bfloat16)

    grid = (n // tile, n // tile)
    inner = 8

    @jax.jit
    def step(a):
        def body(_, a):
            y = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[pl.BlockSpec((tile, n), lambda i, j: (i, 0)),
                          pl.BlockSpec((n, tile), lambda i, j: (0, j))],
                out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j)),
                out_shape=jax.ShapeDtypeStruct((n, n), jnp.bfloat16),
            )(a, b)
            return a + (y[:1, :1] * 0).astype(a.dtype)
        return lax.fori_loop(0, inner, body, a)

    sec = timed_loop(step, a, lambda c: jnp.sum(c[0, :8]), inner)
    record('pallas_matmul_bf16', tflops=round(2 * n ** 3 / sec / 1e12, 1))


def main():
    if len(sys.argv) < 2 or sys.argv[1] == '--list':
        print('\n'.join(PROBES))
        return
    name = sys.argv[1]
    t0 = time.perf_counter()
    try:
        PROBES[name]()
    except Exception as e:  # noqa: BLE001 — record and move on
        record(name, error=f'{type(e).__name__}: {e}'[:300],
               wall_s=round(time.perf_counter() - t0, 1))
        sys.exit(1)


if __name__ == '__main__':
    main()
