"""Classification task driver (reference quant/common/tasks.py).

Wires config -> mesh -> data -> (teacher + KD) -> model -> optimizer/
schedule -> restore -> epoch loop of train+evaluate -> periodic
checkpoints, mirroring classification_task (tasks.py:85-232) with the
functional state threading of this framework.
"""

import logging
from pathlib import Path
from typing import Callable, Optional, Type

import jax
import jax.numpy as jnp
import yaml

from quant_tpu.data import DATASET_REGISTRY, QuantDataLoader
from quant_tpu.nn import MODEL_REGISTRY
from quant_tpu.parallel import make_mesh
from quant_tpu.train.engine import (
    evaluate, make_eval_step, make_train_step, train_epoch,
)
from quant_tpu.train.kd import kd_criterion
from quant_tpu.train.losses import get_loss_fn
from quant_tpu.train.optim import make_optimizer
from quant_tpu.train.preemption import PreemptionGuard
from quant_tpu.train.state import TrainState
from quant_tpu.utils.checkpoints import (
    get_path_to_checkpoint, restore_checkpoint, save_checkpoint,
)
from quant_tpu.utils.logging_utils import init_logging

logger = logging.getLogger(__name__)


def build_model(architecture: str, arch_config: dict) -> object:
    """Instantiate a model from the registry (reference
    initialization.py:97-131, minus the DataParallel wrap)."""
    try:
        model_cls = MODEL_REGISTRY[architecture]
    except KeyError:
        raise ValueError(f'Model architecture {architecture} is not found.')
    return model_cls(**arch_config)


def init_model_variables(model: object, sample_input: object,
                         seed: Optional[int]) -> dict:
    key = jax.random.key(0 if seed is None else seed)
    return model.init(key, jnp.asarray(sample_input), True)


def _restore_into(variables: dict, ckpt_payload: dict,
                  strict_keys: bool = True) -> dict:
    """Merge restored model collections into freshly-initialized variables.

    With strict_keys=False missing/mismatched leaves keep their fresh
    values (reference checkpoints.py:86-89 semantics)."""
    out = dict(variables)
    for col in ('params', 'batch_stats', 'quant_state'):
        if col in ckpt_payload and col in out:
            if strict_keys:
                out[col] = jax.tree.map(lambda new, old: jnp.asarray(new),
                                        ckpt_payload[col], out[col])
            else:
                try:
                    out[col] = jax.tree.map(
                        lambda new, old: jnp.asarray(new),
                        ckpt_payload[col], out[col])
                except ValueError:
                    # Structure mismatch: merge leaf-by-path, keeping fresh
                    # values where the checkpoint has no (or an
                    # incompatible) counterpart.
                    restored = {
                        jax.tree_util.keystr(path): leaf
                        for path, leaf in
                        jax.tree_util.tree_leaves_with_path(
                            ckpt_payload[col])}

                    def merge(path, old):
                        new = restored.get(jax.tree_util.keystr(path))
                        if new is not None and \
                                getattr(new, 'shape', None) == old.shape:
                            return jnp.asarray(new).astype(old.dtype)
                        return old

                    out[col] = jax.tree_util.tree_map_with_path(
                        merge, out[col])
                    logger.warning('Non-strict restore: structure mismatch '
                                   'in %s; merged by path, fresh values '
                                   'kept where missing', col)
    return out


def get_teacher_apply(kd_config: dict, sample_input: object,
                      seed: Optional[int]) -> tuple[Callable, Callable]:
    """Load a frozen teacher and build the KD loss (reference
    tasks.py:33-82).

    The teacher's own experiment config.yaml defines its architecture; its
    checkpoint restores the weights; `train_mode` keeps the teacher's BN
    in batch-statistics mode (deliberate in the reference configs). The
    returned apply fn closes over the frozen variables, so the teacher
    forward is jitted together with the student step.
    """
    with open(kd_config['teacher_config_path']) as f:
        teacher_model_config = yaml.safe_load(f)['model']

    arch_config = dict(teacher_model_config.get('arch_config', {}))
    teacher_dtype = kd_config.get('teacher_dtype')
    if teacher_dtype is not None:
        # kd_config.teacher_dtype (e.g. bfloat16): run the frozen
        # teacher's forward chain at reduced precision inside the KD
        # step — its logits feed a temperature softmax, so bf16 is
        # ample, and the teacher is ~half the forward bytes of a KD
        # step. Both knobs are set because train_mode teachers take
        # the train-path chain (train_dtype) and eval-mode teachers
        # the eval path (eval_dtype); models return f32 logits.
        arch_config['eval_dtype'] = teacher_dtype
        arch_config['train_dtype'] = teacher_dtype
    teacher = build_model(teacher_model_config['architecture'], arch_config)
    variables = init_model_variables(teacher, sample_input, seed)
    payload = restore_checkpoint(
        Path(kd_config['teacher_checkpoint_path']))
    variables = _restore_into(variables, payload,
                              kd_config.get('strict_keys', True))
    train_mode = bool(kd_config.get('train_mode', False))
    freeze = bool(kd_config.get('freeze_teacher', True))

    def teacher_apply(data):
        if train_mode:
            out, _ = teacher.apply(variables, data, True,
                                   mutable=['batch_stats', 'quant_state'])
        else:
            out = teacher.apply(variables, data, False)
        return jax.lax.stop_gradient(out) if freeze else out

    crit = dict(kd_config.get('criterion_config', {}))

    def kd_loss(output, teacher_output, target):
        return kd_criterion(output, teacher_output, target,
                            freeze_teacher=freeze, **crit)

    return teacher_apply, kd_loss


def classification_task(
        config: dict,
        experiment_root_directory: Path,
        data_loader_cls: Optional[Type[QuantDataLoader]] = None,
        get_hooks: Optional[Callable] = None,
        restore_experiment: Optional[Path] = None,
) -> tuple[list[dict], list[dict]]:
    """Run a classification experiment; returns per-epoch metric lists."""
    env_config = config.get('environment', {})
    data_config = dict(config['data'])
    model_config = config['model']
    optimization_config = config['optimization']
    log_config = config['log']

    init_logging(log_config.get('level', 'INFO'))

    if env_config.get('multihost'):
        from quant_tpu.parallel.multihost import initialize
        initialize(env_config.get('coordinator_address'),
                   env_config.get('num_processes'),
                   env_config.get('process_id'))

    nchips = int(env_config.get('nchips', 0) or 0)
    tp = int(env_config.get('tensor_parallel', 1))
    devices = jax.devices()
    if nchips:
        devices = devices[:nchips]
    mesh = make_mesh(model=tp, devices=devices) if len(devices) > 1 else None

    def _place(vs: dict) -> dict:
        """Place model variables per the mesh/TP config: kernels, biases
        and per-out-channel quantizer scale stacks shard over 'model'
        when environment.tensor_parallel > 1, everything replicates
        under pure DP. Called after init AND after every restore path,
        so the YAML knob actually reaches the variables (the reference's
        one working parallelism knob, initialization.py:125-127, set the
        standard)."""
        if mesh is None:
            return vs
        from quant_tpu.parallel.sharding import shard_model_variables
        shardings = shard_model_variables(vs, mesh,
                                          tensor_parallel=tp > 1)
        return jax.tree.map(jax.device_put, vs, shardings)

    if data_loader_cls is None:
        data_loader_cls = DATASET_REGISTRY[data_config.pop('dataset')]
    else:
        data_config.pop('dataset', None)
    data_config.pop('download', None)
    data_loader = data_loader_cls(**data_config)
    skip_training = bool(config.get('skip_training'))
    train_loader = None if skip_training else data_loader.get_train_loader()
    test_loader = data_loader.get_test_loader()

    # Multi-host input: each host loads its disjoint 1/process_count of
    # every dataset and the step consumes one logical global batch
    # assembled from the per-host shards (the TPU-native replacement for
    # DataParallel's implicit scatter, initialization.py:125-127).
    assemble: Callable = jnp.asarray
    if jax.process_count() > 1 and mesh is not None:
        from quant_tpu.parallel.multihost import (
            global_batch, shard_loader_for_host,
        )
        if train_loader is not None:
            train_loader = shard_loader_for_host(train_loader)
        # pad=True: eval covers the FULL test set — padded sentinel rows
        # are excluded by the masked metrics (train must instead drop
        # the ragged tail to keep the step collectives in lockstep).
        test_loader = shard_loader_for_host(test_loader, pad=True)

        def assemble(a, _mesh=mesh):
            import numpy as _np
            return global_batch(_np.asarray(a), _mesh)

    epochs = int(optimization_config['epochs'])
    seed = config.get('seed')

    sample = next(iter(test_loader))[0][:2]
    model = build_model(model_config['architecture'],
                        model_config.get('arch_config', {}))
    variables = _place(init_model_variables(model, sample, seed))

    teacher_apply, kd_loss = None, None
    if 'kd_config' in model_config:
        teacher_apply, kd_loss = get_teacher_apply(
            model_config['kd_config'], sample, seed)

    eval_loss_fn = get_loss_fn(model_config['loss'])
    train_loss_fn = kd_loss if kd_loss is not None else eval_loss_fn

    # Batch-sharding divisibility for eval: pad each host-local batch to
    # a multiple of its data-axis share with sentinel rows the masked
    # metrics exclude — so an odd-sized test set still evaluates every
    # example on any mesh (train instead drops ragged tails by design).
    eval_pad = None
    if mesh is not None and hasattr(eval_loss_fn, 'per_sample'):
        eval_pad = max(1, mesh.shape['data'] // jax.process_count())

    if skip_training:
        import optax
        tx, lr_schedule = optax.identity(), None
    else:
        param_labels = None
        if optimization_config.get('optimizer', {}).get('param_groups'):
            from quant_tpu.train.groups import quantized_param_labels
            param_labels = quantized_param_labels(variables)
        tx, lr_schedule = make_optimizer(
            optimization_config, epochs, len(train_loader),
            param_labels=param_labels)

    state = TrainState.create(model.apply, variables, tx)

    start_epoch = 1
    strict = model_config.get('strict_keys', True)
    if restore_experiment is not None:
        ckpt = get_path_to_checkpoint(restore_experiment)
        payload = restore_checkpoint(ckpt)
        variables = _place(_restore_into(variables, payload, strict))
        state = state.replace(
            params=variables['params'],
            batch_stats=variables.get('batch_stats', {}),
            quant_state=variables.get('quant_state', {}),
        )
        if 'opt_state' in payload and not skip_training:
            # Orbax round-trips optax's namedtuple states as plain
            # lists/dicts; rebuild the target structure from the restored
            # leaves (same flatten order). Leaves are re-placed with the
            # target's sharding (the fresh opt state mirrors the placed
            # params), so restore keeps working on TP-sharded runs.
            target_leaves, target_def = jax.tree.flatten(state.opt_state)
            restored_leaves = jax.tree.leaves(payload['opt_state'])

            def _put_like(n, o):
                if not hasattr(o, 'dtype'):
                    return n
                arr = jnp.asarray(n).astype(o.dtype)
                if mesh is None:
                    return arr
                # Mesh-sharded targets keep their sharding; scalar
                # counters etc. (fresh ones are uncommitted) must be
                # replicated on the mesh, NOT committed to one device.
                sh = o.sharding
                if not isinstance(sh, jax.sharding.NamedSharding):
                    sh = jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec())
                return jax.device_put(arr, sh)

            if len(restored_leaves) == len(target_leaves):
                rebuilt = jax.tree.unflatten(
                    target_def,
                    [_put_like(n, o)
                     for n, o in zip(restored_leaves, target_leaves)])
                step_val = jnp.asarray(payload.get('step', 0), jnp.int32)
                if mesh is not None:
                    # Replicate on the mesh: a device-0-committed scalar
                    # conflicts with the mesh-placed params inside jit.
                    step_val = jax.device_put(
                        step_val, jax.sharding.NamedSharding(
                            mesh, jax.sharding.PartitionSpec()))
                state = state.replace(opt_state=rebuilt, step=step_val)
            else:
                logger.warning(
                    'Optimizer state in checkpoint does not match the '
                    'current optimizer (%d vs %d leaves); starting fresh.',
                    len(restored_leaves), len(target_leaves))
        start_epoch = int(payload.get('epoch', 0)) + 1
    elif config.get('init_from_checkpoint'):
        payload = restore_checkpoint(Path(config['init_from_checkpoint']))
        variables = _place(_restore_into(variables, payload, strict))
        state = state.replace(
            params=variables['params'],
            batch_stats=variables.get('batch_stats', {}),
            quant_state=variables.get('quant_state', {}))

    train_hooks, test_hooks = ([], [])
    if get_hooks is not None:
        train_hooks, test_hooks = get_hooks(
            config, Path(experiment_root_directory))

    def _close_hooks() -> None:
        # Flush/close hooks that buffer (TensorBoard writers); without
        # this, short runs end before the periodic flush and the event
        # files stay empty.
        for hook in (*train_hooks, *test_hooks):
            close = getattr(hook, 'close', None)
            if callable(close):
                close()

    train_step = make_train_step(train_loss_fn, teacher_apply, mesh=mesh)
    eval_step = make_eval_step(eval_loss_fn, mesh=mesh)

    train_epoch_metrics: list[dict] = []
    test_epoch_metrics: list[dict] = []

    exp_dir = Path(experiment_root_directory) / config['experiment_name']

    try:
        if skip_training:
            test_epoch_metrics.append(
                evaluate(eval_step, state, test_loader, epoch=1,
                         hooks=test_hooks, assemble=assemble,
                         pad_rows_to=eval_pad))
        else:
            save_freq = int(log_config.get('save_model_freq', epochs))

            def _payload(epoch: int) -> dict:
                return {'params': state.params,
                        'batch_stats': state.batch_stats,
                        'quant_state': state.quant_state,
                        'opt_state': state.opt_state,
                        'step': state.step,
                        'epoch': epoch}

            # SIGTERM (pod preemption) -> finish the batch, write an
            # interrupt checkpoint, stop. The per-batch stop decision is a
            # cluster CONSENSUS (jax's preemption sync service, or
            # collective_any fallback — see train/preemption.py): acting on
            # a local flag alone would strand peers inside the step
            # collectives. The `with` restores any signal handlers even
            # when an epoch raises.
            with PreemptionGuard() as guard:
                # Reference semantics: a restored run trains `epochs` MORE
                # epochs (tasks.py:196: range(start_epoch, start+epochs)).
                final_epoch = start_epoch + epochs - 1
                for epoch in range(start_epoch, start_epoch + epochs):
                    state, m_train = train_epoch(
                        train_step, state, train_loader, epoch,
                        log_interval=int(log_config.get('interval', 10)),
                        hooks=train_hooks, lr_schedule=lr_schedule,
                        steps_per_epoch=len(train_loader), assemble=assemble,
                        stop=guard)
                    if guard.requested:
                        # Payload epoch-1: restore re-runs the interrupted
                        # epoch (params are partially advanced; QAT
                        # tolerates the re-run). Directory tag = this
                        # epoch, so repeated preemptions overwrite one slot.
                        save_checkpoint(exp_dir / 'checkpoints',
                                        _payload(epoch - 1), epoch)
                        logger.warning('Interrupt checkpoint written; '
                                       'resume with --restore-experiment.')
                        break
                    m_test = evaluate(eval_step, state, test_loader,
                                      epoch=epoch, hooks=test_hooks,
                                      assemble=assemble, stop=guard,
                                      pad_rows_to=eval_pad)
                    if guard.requested:
                        # Interrupted during eval: this epoch's TRAINING
                        # completed, so the payload resumes AFTER it.
                        save_checkpoint(exp_dir / 'checkpoints',
                                        _payload(epoch), epoch)
                        logger.warning('Interrupt checkpoint written; '
                                       'resume with --restore-experiment.')
                        break
                    train_epoch_metrics.append(m_train)
                    test_epoch_metrics.append(m_test)

                    # Always checkpoint the LAST epoch of this run (for a
                    # resumed run: start_epoch+epochs-1, not `epochs`).
                    if epoch % save_freq == 0 or epoch == final_epoch:
                        save_checkpoint(exp_dir / 'checkpoints',
                                        _payload(epoch), epoch)

    finally:
        _close_hooks()

    data_loader.cleanup()
    return train_epoch_metrics, test_epoch_metrics
