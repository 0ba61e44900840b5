"""Training-step throughput benchmark (ResNet-18 ls-1/ls-1 QAT).

Measures the full jitted train step — forward with on-device scale
solves, STE backward, adam update, metric update — on the real chip.
Prints one JSON line. Uses the persistent compile cache and the chained
host-loop timing pattern (see bench.py for why).
"""

import json
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:
    pass

ITERS = 10
BATCH = 128


def main() -> None:
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else BATCH
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else ITERS
    # Optional 3rd arg: train_dtype (e.g. bfloat16) for the mixed-
    # precision A/B (docs/API.md train_dtype). Pass '-' for f32.
    train_dtype = sys.argv[3] if len(sys.argv) > 3 else None
    if train_dtype == '-':
        train_dtype = None
    # Optional 4th/5th args: activation / weight schemes (default
    # ls-1/ls-1; pass 'ls-2 ls-1' for the accuracy-flagship recipe,
    # whose per-sample opt_v1 sort is the expensive train-side solve).
    x_quant = sys.argv[4] if len(sys.argv) > 4 else 'ls-1'
    w_quant = sys.argv[5] if len(sys.argv) > 5 else 'ls-1'
    # Optional 6th arg: solver_mode ('exact' | 'reference' | 'lloyd' —
    # the sort-free TPU-fast ls-2/ls-T solve, ops/optimal.py).
    solver_mode = sys.argv[6] if len(sys.argv) > 6 else 'exact'

    from bench import _resnet18
    from quant_tpu.train import (TrainState, get_loss_fn, make_optimizer,
                                 make_train_step)
    from quant_tpu.train.metrics import init_metric_state

    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)
    y = jax.random.randint(key, (batch,), 0, 1000)

    model = _resnet18(x_quant, w_quant, solver_mode=solver_mode,
                      **({'train_dtype': train_dtype} if train_dtype
                         else {}))
    variables = model.init(key, x[:2], True)
    tx, _ = make_optimizer(
        {'optimizer': {'algorithm': 'adam', 'lr': 2e-4},
         'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10 ** 6,
                          'gamma': 1.0}},
        epochs=1, steps_per_epoch=1000)
    state = TrainState.create(model.apply, variables, tx)
    step = make_train_step(get_loss_fn('cross_entropy'), donate=False)

    t0 = time.perf_counter()
    state, ms, loss = step(state, x, y, init_metric_state())
    _ = jax.device_get(loss)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        state, ms, loss = step(state, x, y, ms)
    _ = jax.device_get(loss)
    dt = time.perf_counter() - t0

    print(json.dumps({
        'metric': 'resnet18_train_images_per_sec',
        'value': round(batch * iters / dt, 2),
        'batch': batch,
        'schemes': f'{x_quant}x{w_quant}',
        'solver_mode': solver_mode,
        'train_dtype': train_dtype or 'float32',
        'unit': 'images/sec/chip',
        'compile_seconds': round(compile_s, 1),
    }))


if __name__ == '__main__':
    main()
