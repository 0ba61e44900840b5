"""Benchmark: ResNet-18 1-bit-weight inference throughput vs fp32.

Prints ONE JSON line:
  {"metric": "resnet18_binary_infer_images_per_sec",
   "value": <images/sec/chip, packed 1-bit-weight model>,
   "unit": "images/sec/chip",
   "vs_baseline": <packed images/sec divided by fp32 images/sec>}

Baseline semantics: the fp32 model runs with Precision.HIGHEST — true
IEEE-fp32 conv math, matching the numerics of the PyTorch reference's
F.conv2d on V100 (the hardware of BASELINE.md's rows). The packed binary
model runs its sign-plane convs in bf16, which is EXACT for ±1 operands
(integer accumulation in f32), so reduced precision costs it nothing.

Measurement notes (this TPU is reached through a tunnel, see
.claude/skills/verify/SKILL.md): dispatches have a ~2.5 ms latency floor
and `block_until_ready` does not serialize with execution, so forwards
are chained through a data dependency (UNROLL per dispatch) and a single
scalar `device_get` is the only sync.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp

# Persistent compile cache: repeat bench runs (and the driver's
# end-of-round run) skip the ~10-min remote compiles when the program is
# unchanged. Harmless if the backend ignores it.
try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:  # pragma: no cover - older jax
    pass

ITERS = 16
BATCH = 1024
# Forwards chained inside ONE jit dispatch. The tunnel costs ~2.5 ms per
# dispatch and does NOT pipeline host dispatches with device execution
# (probe_r5 head_*/ips_dus_*), so per-dispatch measurement taxes a 31 ms
# step ~8%. Production serving pipelines batches without a host round
# trip per batch; chaining u forwards per dispatch amortizes the tunnel
# artifact the same way. u=4 measured best (u8 slightly worse).
UNROLL = 4

# Measured MXU peak on this chip (tools/probe_r3_results.jsonl:
# chained 8192^3 bf16 matmul sustains 161 TFLOP/s — the DCE-proof
# number; probe_r2's 1129 was a slice-folding artifact). MFU below is
# conv FLOPs/image x img/s divided by this — how far the packed path
# sits from the chip's measured speed of light.
PEAK_BF16_TFLOPS = 161.2
# ResNet-18 @224: 2*MACs of all convs + fc (the standard 3.64 GFLOP
# figure, NHWC shapes identical here).
RESNET18_GFLOPS = 3.64


def _resnet18(x_quant: str, w_quant: str, block: str = 'xnor', **kwargs):
    from quant_tpu.nn import QResNet
    layer = {'x_quant': x_quant, 'w_quant': w_quant,
             'clamp': {'kind': 'symmetric', 'alpha': 2.0}}
    if block == 'xnor':
        layer['double_shortcut'] = True
    return QResNet(
        block=block,
        layer0={'n_in_channels': 64, 'kernel_size': 7, 'stride': 2,
                'padding': 3, 'bias': False,
                'maxpool': {'type': 'maxpool2d', 'kernel_size': 3,
                            'stride': 2, 'padding': 1}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=dict(layer),
        nonlins=['prelu', 'prelu'],
        num_blocks=[2, 2, 2, 2],
        output_classes=1000,
        **kwargs,
    )


def _throughput(apply_fn, variables, x) -> float:
    """Images/sec with iterations serialized by data dependency.

    A device-side fori_loop would be cleaner but the remote compiler in
    this environment stalls on it for large models; instead UNROLL
    forwards are chained inside one jit. Each forward's input carries a
    FULL reduction of the previous forward's logits (the DCE-proof
    pattern — never a slice, which XLA folds into the dots), written
    into one element of the donated carrier so the chain itself costs
    no bandwidth.
    """

    @functools.partial(jax.jit, donate_argnums=0)
    def step(t):
        for _ in range(UNROLL):
            out = apply_fn(variables, t, False)
            t = t.at[0, 0, 0, 0].add(
                (1e-12 * jnp.mean(out)).astype(t.dtype))
        return t

    y = step(jnp.array(x, copy=True))  # copy: donation kills the buffer
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        y = step(y)
    _ = jax.device_get(jnp.sum(y[0, 0, 0]))
    dt = time.perf_counter() - t0
    return x.shape[0] * UNROLL * ITERS / dt


def _train_throughput(key, batch: int = 256, iters: int = 8) -> float:
    """Full QAT train step rate (ls-1/ls-1, full-AMP train_dtype=bf16,
    the recommended TPU recipe): fwd + on-device LS scale solves + STE
    bwd + adam + metrics, steps serialized through the state carry."""
    from quant_tpu.train import (TrainState, get_loss_fn, make_optimizer,
                                 make_train_step)
    from quant_tpu.train.metrics import init_metric_state

    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)
    y = jax.random.randint(key, (batch,), 0, 1000)
    model = _resnet18('ls-1', 'ls-1', train_dtype='bfloat16')
    variables = model.init(key, x[:2], True)
    tx, _ = make_optimizer(
        {'optimizer': {'algorithm': 'adam', 'lr': 2e-4},
         'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10 ** 6,
                          'gamma': 1.0}},
        epochs=1, steps_per_epoch=1000)
    state = TrainState.create(model.apply, variables, tx)
    step = make_train_step(get_loss_fn('cross_entropy'), donate=False)

    state, ms, loss = step(state, x, y, init_metric_state())
    _ = jax.device_get(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, ms, loss = step(state, x, y, ms)
    _ = jax.device_get(loss)
    return batch * iters / (time.perf_counter() - t0)


def _restored_ckpt_throughput(key, x, packed_clone) -> float:
    """VERDICT r4 #7: the headline rows warm-fill quant_state with a
    constant 0.5 (throughput-only shortcut). This row benches the SERVED
    artifact instead: a few real QAT steps populate solved weight-scale
    caches and EMA activation scales, the sign planes are packed and the
    fp32 kernels stripped (nn/export.strip_for_deployment), the artifact
    round-trips through an orbax checkpoint, and the restored variables
    drive the packed forward — confirming the served graph's throughput
    matches the benched graph's with realistic scale magnitudes."""
    import pathlib
    import shutil
    import tempfile

    from quant_tpu.nn.export import (
        export_packed_variables, fold_for_serving, strip_for_deployment,
    )
    from quant_tpu.train import (TrainState, get_loss_fn, make_optimizer,
                                 make_train_step)
    from quant_tpu.train.metrics import init_metric_state
    from quant_tpu.utils.checkpoints import (
        restore_checkpoint, save_checkpoint,
    )

    trainer = _resnet18('ls-1', 'ls-1', moving_average_mode='eval_only',
                        train_dtype='bfloat16')
    bt = 256
    xt = jax.random.normal(key, (bt, 224, 224, 3), jnp.float32)
    yt = jax.random.randint(key, (bt,), 0, 1000)
    variables = trainer.init(key, xt[:2], True)
    tx, _ = make_optimizer(
        {'optimizer': {'algorithm': 'adam', 'lr': 2e-4},
         'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10 ** 6,
                          'gamma': 1.0}},
        epochs=1, steps_per_epoch=1000)
    state = TrainState.create(trainer.apply, variables, tx)
    step = make_train_step(get_loss_fn('cross_entropy'), donate=False)
    ms = init_metric_state()
    for _ in range(3):  # enough to move scales off init and track EMA
        state, ms, loss = step(state, xt, yt, ms)
    _ = jax.device_get(loss)

    exported = export_packed_variables(packed_clone,
                                       state.model_variables, x[:1])
    serve_model, exported, _ = fold_for_serving(packed_clone, exported)
    artifact = strip_for_deployment(exported)
    tmp = pathlib.Path(tempfile.mkdtemp(prefix='qtpu_bench_ckpt_'))
    try:
        path = save_checkpoint(tmp, artifact, epoch=0)
        restored = restore_checkpoint(path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    restored = jax.device_put(restored)
    return _throughput(serve_model.apply, restored, x)


def main() -> None:
    key = jax.random.key(0)
    x = jax.random.normal(key, (BATCH, 224, 224, 3), jnp.float32)

    def _fill_quant_state(v):
        # Plausible cached scales (values are epilogue multipliers,
        # irrelevant to throughput; the restored_ckpt row benches REAL
        # trained state) and a nonzero EMA count for the fold guards.
        v = dict(v)
        v['quant_state'] = jax.tree.map(
            lambda t: (jnp.ones_like(t)
                       if jnp.issubdtype(t.dtype, jnp.integer)
                       else jnp.full_like(t, 0.5)),
            v.get('quant_state', {}))
        return v

    def _serving_form(packed_clone, v):
        # The production serving artifact: BN+clamp+sign folded into
        # per-channel thresholds (measured +0.3..0.5% vs unfolded and
        # one less module chain, tools/bench_ab_results.jsonl
        # xnorfold_*), with the shared unfolded fallback.
        from quant_tpu.nn.export import (
            export_packed_variables, fold_for_serving,
        )
        pv = export_packed_variables(packed_clone, v, x[:1])
        serve_model, pv, _ = fold_for_serving(packed_clone, pv)
        return serve_model, pv

    binary = _resnet18('ls-1', 'ls-1', moving_average_mode='eval_only')
    vb = _fill_quant_state(binary.init(key, x[:2], True))
    # sign_compute='int8': single-plane schemes run s8xs8->s32 sign
    # convs (bit-exact, measured 1.13x end-to-end over bf16 — A/B matrix
    # tools/bench_ab_results.jsonl). The s2d stem measured FASTER in
    # isolation but slower in-model, so it stays off here.
    packed = binary.clone(inference_mode='packed',
                          eval_dtype=jnp.bfloat16, sign_compute='int8')
    serve_model, serve_vars = _serving_form(packed, vb)
    ips_binary = _throughput(serve_model.apply, serve_vars, x)

    # Accuracy-flagship 2-bit config (ls-2 activations x ls-1 weights,
    # the 74.4-top-1 ImageNet recipe) — same packed single-conv path.
    ls2 = _resnet18('ls-2', 'ls-1', moving_average_mode='eval_only')
    v2 = _fill_quant_state(ls2.init(key, x[:2], True))
    packed2 = ls2.clone(inference_mode='packed', eval_dtype=jnp.bfloat16)
    serve2, serve2_vars = _serving_form(packed2, v2)
    ips_ls2 = _throughput(serve2.apply, serve2_vars, x)

    fp = _resnet18('fp', 'fp')
    vf = fp.init(key, x[:2], True)
    with jax.default_matmul_precision('highest'):
        ips_fp = _throughput(fp.apply, vf, x)

    # The conv->BN ('regular') family: the reference's OWN fp baseline
    # architecture (imagenet_fp.yaml block: regular). Its binary variant
    # runs faster than the xnor ordering (no pre-conv BN pass / double
    # shortcut); reported against its own fp32 run for an
    # apples-to-apples second ratio. Guarded: a failure/timeout in the
    # secondary family must not sink the headline measurement (compiles
    # are ~10 min each through this tunnel and do not persist-cache).
    ips_reg = ips_fp_reg = None
    try:
        reg = _resnet18('ls-1', 'ls-1', block='regular',
                        moving_average_mode='eval_only')
        vr = dict(reg.init(key, x[:2], True))
        vr['quant_state'] = jax.tree.map(lambda v: jnp.full_like(v, 0.5),
                                         vr.get('quant_state', {}))
        packed_reg = reg.clone(inference_mode='packed',
                               eval_dtype=jnp.bfloat16,
                               sign_compute='int8')
        ips_reg = _throughput(packed_reg.apply, vr, x)

        fp_reg = _resnet18('fp', 'fp', block='regular')
        vfr = fp_reg.init(key, x[:2], True)
        with jax.default_matmul_precision('highest'):
            ips_fp_reg = _throughput(fp_reg.apply, vfr, x)
    except Exception:  # pragma: no cover - secondary family only
        ips_reg = ips_fp_reg = None

    try:
        ips_train = _train_throughput(key)
    except Exception:  # pragma: no cover - secondary measurement
        ips_train = None

    # gf-2 x ls-1: the published greedy-foldable 2-bit family
    # (reference README.md:105,149; quantization.py:118-148) on the
    # packed path (2 activation planes -> fused bf16 bake).
    ips_gf2 = None
    try:
        gf2 = _resnet18('gf-2', 'ls-1', moving_average_mode='eval_only')
        vg = _fill_quant_state(gf2.init(key, x[:2], True))
        packed_gf2 = gf2.clone(inference_mode='packed',
                               eval_dtype=jnp.bfloat16)
        serve_gf2, serve_gf2_vars = _serving_form(packed_gf2, vg)
        ips_gf2 = _throughput(serve_gf2.apply, serve_gf2_vars, x)
    except Exception:  # pragma: no cover - secondary family only
        ips_gf2 = None

    # Served-artifact bench (few-step-trained scales, stripped + orbax
    # round-trip): must match ips_binary — the scale values are epilogue
    # multipliers, the program is the served one.
    ips_restored = None
    try:
        ips_restored = _restored_ckpt_throughput(key, x, packed)
    except Exception:  # pragma: no cover - secondary measurement
        ips_restored = None

    def mfu(ips: float) -> float:
        return ips * RESNET18_GFLOPS / (PEAK_BF16_TFLOPS * 1e3)

    extras = {
        'ls2_ls1_images_per_sec': round(ips_ls2, 2),
        'ls2_ls1_vs_baseline': round(ips_ls2 / ips_fp, 3),
        'fp32_images_per_sec': round(ips_fp, 2),
        'mfu_binary': round(mfu(ips_binary), 4),
        'mfu_ls2': round(mfu(ips_ls2), 4),
        'peak_bf16_tflops': PEAK_BF16_TFLOPS,
    }
    if ips_reg is not None and ips_fp_reg is not None:
        extras.update(
            regular_ls1_images_per_sec=round(ips_reg, 2),
            regular_fp32_images_per_sec=round(ips_fp_reg, 2),
            regular_vs_baseline=round(ips_reg / ips_fp_reg, 3))
    if ips_train is not None:
        extras['train_ls1_amp_images_per_sec'] = round(ips_train, 2)
    if ips_gf2 is not None:
        extras['gf2_ls1_images_per_sec'] = round(ips_gf2, 2)
        extras['gf2_ls1_vs_baseline'] = round(ips_gf2 / ips_fp, 3)
    if ips_restored is not None:
        extras['restored_ckpt_images_per_sec'] = round(ips_restored, 2)
    print(json.dumps({
        'metric': 'resnet18_binary_infer_images_per_sec',
        'value': round(ips_binary, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(ips_binary / ips_fp, 3),
        'extras': extras,
    }))


if __name__ == '__main__':
    main()
