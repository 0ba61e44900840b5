"""Round-2 probe set v3: the stem block (34% of model time).

bench_parts showed conv1+BN+relu+maxpool = 11.85 ms of the 34.95 ms
packed ResNet-18 forward at batch 1024 — the single largest component.
These probes compare full-stem formulations (conv + BN + relu + maxpool,
bf16, batch 1024) head-to-head in one process:

  regular   — 7x7/s2 conv as-is (the production path today)
  s2d       — space-to-depth 4x4/s1 conv (6D transpose on the input)
  phases    — the same reformulation as a SUM OF 4 stride-1 convs on
              parity-phase slices (strided slices, no 6D transpose)
  nopool    — regular conv + BN + relu only (attributes maxpool cost)
  pool9     — maxpool written as 9 shifted elementwise max's instead of
              reduce_window (fusion-friendlier?)

Usage: python tools/probe_r4.py <probe> | --list
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

RESULTS = '/root/repo/tools/probe_r4_results.jsonl'
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


def _operands():
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, 224, 224, 3)).astype(jnp.bfloat16)
    w = (jax.random.normal(key, (7, 7, 3, 64)) * 0.05).astype(jnp.bfloat16)
    g = jnp.full((64,), 1.01, jnp.bfloat16)
    b = jnp.full((64,), 0.01, jnp.bfloat16)
    return x, w, g, b


def _bn_relu_pool(y, g, b, pool=True):
    y = jnp.maximum(y.astype(jnp.bfloat16) * g + b, 0)
    if not pool:
        return y
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 3, 3, 1),
                             (1, 2, 2, 1),
                             [(0, 0), (1, 1), (1, 1), (0, 0)])


def _time_stem(stem_fn, iters=12):
    x, w, g, b = _operands()

    @jax.jit
    def step(x):
        y = stem_fn(x, w, g, b)
        return x * (1.0 + 1e-30 * jnp.mean(y).astype(x.dtype))

    y = step(x)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    return (time.perf_counter() - t0) / iters


def _conv(x, w, stride, pad):
    return lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)


@probe
def stem_regular():
    sec = _time_stem(lambda x, w, g, b: _bn_relu_pool(
        _conv(x, w, 2, 3), g, b))
    record('stem_regular', ms=round(sec * 1e3, 3))


@probe
def stem_nopool():
    sec = _time_stem(lambda x, w, g, b: _bn_relu_pool(
        _conv(x, w, 2, 3), g, b, pool=False))
    record('stem_nopool', ms=round(sec * 1e3, 3))


@probe
def stem_s2d():
    from quant_tpu.ops.conv import stem_conv_s2d
    sec = _time_stem(lambda x, w, g, b: _bn_relu_pool(
        stem_conv_s2d(x, w), g, b))
    record('stem_s2d', ms=round(sec * 1e3, 3))


def _phase_conv(x, w):
    """7x7/s2/p3 conv as a sum of 4 stride-1 convs on parity phases.

    Tap (di,dj) of the 7x7 kernel contributes to phase (di%2, dj%2) at
    kernel position (di//2, dj//2): out[i,j] reads xp[2i+1+di, 2j+1+dj]
    with xp = pad(x, (4,2)), and phase slicing xp[r::2, s::2] turns that
    into a stride-1 conv with a <=4x4 kernel per phase. Identical MACs,
    no 6D transpose.
    """
    xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
    out = None
    for r in (0, 1):
        for s in (0, 1):
            taps_i = [di for di in range(7) if (1 + di) % 2 == r]
            taps_j = [dj for dj in range(7) if (1 + dj) % 2 == s]
            ai = [(1 + di) // 2 for di in taps_i]
            aj = [(1 + dj) // 2 for dj in taps_j]
            kh, kw = max(ai) - min(ai) + 1, max(aj) - min(aj) + 1
            wk = jnp.zeros((kh, kw, 3, 64), w.dtype)
            for di, a in zip(taps_i, ai):
                for dj, bcol in zip(taps_j, aj):
                    wk = wk.at[a - min(ai), bcol - min(aj)].set(w[di, dj])
            ph = xp[:, r + 2 * min(ai)::2, s + 2 * min(aj)::2, :]
            need_h = 112 + kh - 1
            need_w = 112 + kw - 1
            ph = ph[:, :need_h, :need_w, :]
            y = _conv(ph, wk, 1, 0)
            out = y if out is None else out + y
    return out


@probe
def stem_phases():
    # Correctness first (vs the regular conv), then time.
    x, w, g, b = _operands()
    ref = _conv(x[:2], w, 2, 3)
    got = _phase_conv(x[:2], w)
    err = float(jnp.max(jnp.abs(ref - got)))
    record('stem_phases_check', max_abs_err=err)
    sec = _time_stem(lambda x, w, g, b: _bn_relu_pool(
        _phase_conv(x, w), g, b))
    record('stem_phases', ms=round(sec * 1e3, 3))


def _pool9(y):
    """3x3/s2/p1 maxpool as 9 shifted strided slices + elementwise max."""
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=-jnp.inf)
    out = None
    for dy in range(3):
        for dx in range(3):
            s = yp[:, dy:dy + 111:2, dx:dx + 111:2, :]
            out = s if out is None else jnp.maximum(out, s)
    return out


@probe
def stem_pool9():
    x, w, g, b = _operands()
    ref = _bn_relu_pool(_conv(x[:2], w, 2, 3), g, b)
    got = _pool9(jnp.maximum(
        _conv(x[:2], w, 2, 3).astype(jnp.bfloat16) * g + b, 0))
    err = float(jnp.max(jnp.abs(ref - got)))
    record('stem_pool9_check', max_abs_err=err)
    sec = _time_stem(lambda x, w, g, b: _pool9(jnp.maximum(
        _conv(x, w, 2, 3).astype(jnp.bfloat16) * g + b, 0)))
    record('stem_pool9', ms=round(sec * 1e3, 3))


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
