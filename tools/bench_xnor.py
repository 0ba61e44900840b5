"""Pallas XNOR-popcount GEMM on silicon: exactness + perf vs MXU path.

VERDICT item 5: run `xnor_gemm` COMPILED on the TPU (not interpret),
record bit-exactness vs the dense oracle and throughput/latency against
the MXU sign-plane path in its design regime (small-batch, HBM-bound
serving) and at throughput shapes.

Timing: inner fori_loop; the loop carry perturbs vx by eps*sum(out) so
every iteration depends on the previous (no hoisting, no DCE), at a
cost of one (M,) elementwise op per rep.

Results append to tools/bench_xnor_results.jsonl.
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

RESULTS = '/root/repo/tools/bench_xnor_results.jsonl'


def record(**kv):
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(kv) + '\n')
    print(json.dumps(kv), flush=True)


def make_operands(m, k, n):
    key = jax.random.key(0)
    ka, kb, kx, kw = jax.random.split(key, 4)
    a = jnp.sign(jax.random.normal(ka, (m, k))) + (
        jax.random.normal(ka, (m, k)) == 0)
    b = jnp.sign(jax.random.normal(kb, (k, n))) + (
        jax.random.normal(kb, (k, n)) == 0)
    vx = jax.random.uniform(kx, (m,), jnp.float32, 0.5, 1.5)
    vw = jax.random.uniform(kw, (n,), jnp.float32, 0.5, 1.5)
    return a, b, vx, vw


def exactness(m=512, k=4608, n=512):
    from quant_tpu.ops.binary_gemm import (pack_for_xnor, xnor_gemm,
                                           xnor_gemm_reference)
    a, b, vx, vw = make_operands(m, k, n)
    ap, btp = pack_for_xnor(a, b)
    got = jax.device_get(xnor_gemm(ap, btp, vx, vw, k_total=k))
    ref = jax.device_get(xnor_gemm_reference(a, b, vx, vw))
    max_err = float(abs(got - ref).max())
    record(kind='exactness', m=m, k=k, n=n, max_abs_err=max_err,
           bit_exact=bool(max_err == 0.0))


def time_xnor(m, k, n, inner, outer=4):
    from quant_tpu.ops.binary_gemm import pack_for_xnor, xnor_gemm
    a, b, vx, vw = make_operands(m, k, n)
    ap, btp = pack_for_xnor(a, b)

    @jax.jit
    def step(vx):
        def body(_, vx):
            out = xnor_gemm(ap, btp, vx, vw, k_total=k)
            return vx * (1.0 + 1e-30 * jnp.sum(out))
        return lax.fori_loop(0, inner, body, vx)

    v = step(vx)
    _ = jax.device_get(jnp.sum(v))
    t0 = time.perf_counter()
    for _ in range(outer):
        v = step(v)
    _ = jax.device_get(jnp.sum(v))
    sec = (time.perf_counter() - t0) / (outer * inner)
    tmacs = m * k * n / sec / 1e12
    # HBM bytes: packed operands + f32 output once per call.
    gb = (ap.size * 4 + btp.size * 4 + m * n * 4) / 1e9
    return sec, tmacs, gb / sec


def time_mxu(m, k, n, inner, outer=4):
    """MXU sign-plane equivalent: unpacked bf16 signs, f32 acc, scale
    epilogue (what quant_conv2d_infer does, in matmul form)."""
    a, b, vx, vw = make_operands(m, k, n)
    ab = a.astype(jnp.bfloat16)
    bb = b.astype(jnp.bfloat16)

    @jax.jit
    def step(vx):
        def body(_, vx):
            out = lax.dot(ab, bb, preferred_element_type=jnp.float32)
            out = out * vx.reshape(-1, 1) * vw.reshape(1, -1)
            return vx * (1.0 + 1e-30 * jnp.sum(out))
        return lax.fori_loop(0, inner, body, vx)

    v = step(vx)
    _ = jax.device_get(jnp.sum(v))
    t0 = time.perf_counter()
    for _ in range(outer):
        v = step(v)
    _ = jax.device_get(jnp.sum(v))
    sec = (time.perf_counter() - t0) / (outer * inner)
    return sec, m * k * n / sec / 1e12


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if which in ('exactness', 'all'):
        exactness()
    # (label, M, K, N, inner): serving latency shapes (tiny M) and
    # throughput shapes. K=4608 is a ResNet l4 3x3 reduction (512*9).
    shapes = [
        ('serve_m8', 8, 4608, 512, 100),
        ('serve_m64', 64, 4608, 512, 100),
        ('batch_m1024', 1024, 4608, 512, 20),
        ('square_4k', 4096, 4096, 4096, 8),
    ]
    if which in ('perf', 'all'):
        for label, m, k, n, inner in shapes:
            sec, tmacs, gbps = time_xnor(m, k, n, inner)
            record(kind='xnor', label=label, m=m, k=k, n=n,
                   us=round(sec * 1e6, 1), tmacs=round(tmacs, 2),
                   packed_gbps=round(gbps, 1))
            sec, tmacs = time_mxu(m, k, n, inner)
            record(kind='mxu', label=label, m=m, k=k, n=n,
                   us=round(sec * 1e6, 1), tmacs=round(tmacs, 2))


if __name__ == '__main__':
    main()
