"""Round-3 train-step attribution: where do the 6.6k-img/s AMP steps go?

Parts measured on the chip (ResNet-18 ls-1/ls-1, train_dtype=bfloat16,
batch 256, chained through a data dependency like bench.py):

  fwd   — loss forward only (train-mode quantize + conv + BN + loss)
  grad  — jax.grad of the same loss (fwd + STE backward)
  full  — the production train step (grad + adam + metrics + state)

Usage: python tools/probe_train_parts.py [fwd|grad|full]  (one at a time;
results appended to tools/probe_train_parts_results.jsonl)
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:
    pass

RESULTS = Path(__file__).with_name('probe_train_parts_results.jsonl')
BATCH, ITERS = 256, 10


def record(**kv):
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(kv) + '\n')
    print(json.dumps(kv), flush=True)


def main() -> None:
    part = sys.argv[1] if len(sys.argv) > 1 else 'fwd'
    from bench import _resnet18
    from quant_tpu.train import (TrainState, get_loss_fn, make_optimizer,
                                 make_train_step)
    from quant_tpu.train.metrics import init_metric_state

    key = jax.random.key(0)
    x = jax.random.normal(key, (BATCH, 224, 224, 3), jnp.float32)
    y = jax.random.randint(key, (BATCH,), 0, 1000)
    model = _resnet18('ls-1', 'ls-1', train_dtype='bfloat16')
    variables = model.init(key, x[:2], True)
    loss_fn = get_loss_fn('cross_entropy')

    def loss(params, xin):
        out, _ = model.apply({**variables, 'params': params}, xin, True,
                             mutable=['quant_state', 'batch_stats'])
        return loss_fn(out, y)

    params = variables['params']

    if part in ('fwd', 'grad'):
        fn = jax.grad(loss) if part == 'grad' else None

        @jax.jit
        def step(xin):
            if part == 'fwd':
                val = loss(params, xin)
            else:
                g = fn(params, xin)
                val = sum(jnp.sum(v) for v in jax.tree.leaves(g))
            # Chain: fold the scalar into one input element.
            return xin.at[0, 0, 0, 0].add(1e-12 * val.astype(xin.dtype))

        xd = step(x)
        _ = jax.device_get(jnp.sum(xd[0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            xd = step(xd)
        _ = jax.device_get(jnp.sum(xd[0, 0, 0]))
        dt = time.perf_counter() - t0
    else:
        tx, _ = make_optimizer(
            {'optimizer': {'algorithm': 'adam', 'lr': 2e-4},
             'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10 ** 6,
                              'gamma': 1.0}}, 1, 1000)
        state = TrainState.create(model.apply, variables, tx)
        step = make_train_step(loss_fn, donate=False)
        state, ms, lv = step(state, x, y, init_metric_state())
        _ = jax.device_get(lv)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, ms, lv = step(state, x, y, ms)
        _ = jax.device_get(lv)
        dt = time.perf_counter() - t0

    record(part=part, batch=BATCH, ms=round(1e3 * dt / ITERS, 2),
           ips=round(BATCH * ITERS / dt, 1))


if __name__ == '__main__':
    main()
