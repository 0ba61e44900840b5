"""One process of a PodComputePlatform run.

Run as:
    python -m quant_tpu.pod_worker <config.json> <pid> <nprocs> <port> <out>

Initializes `jax.distributed` against the platform's local coordinator
BEFORE any other jax work (the backend latches process topology at
first use), then runs the experiment exactly like a single host would:
`classification_task` detects `jax.process_count() > 1` and switches to
per-host disjoint dataset shards + `global_batch` assembly
(quant_tpu/parallel/multihost.py). Process 0 writes the experiment
artifacts and the final metrics JSON; checkpoints are process-0-only by
construction (utils/checkpoints.py).

On a REAL TPU pod none of this is needed: run the example CLI once per
host and `jax.distributed.initialize()` discovers the TPU coordinator
itself. This worker exists so pod-shaped behavior is testable on one
machine (CPU device mesh).
"""

import json
import sys
from pathlib import Path


def main() -> None:
    cfg_path, pid, nprocs, port, out = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
        sys.argv[5])
    import jax
    jax.distributed.initialize(
        coordinator_address=f'127.0.0.1:{port}',
        num_processes=nprocs, process_id=pid)

    from quant_tpu.experiment import Experiment
    from quant_tpu.train.task import classification_task

    with open(cfg_path) as f:
        config = json.load(f)
    if pid == 0:
        # Only process 0 writes experiment artifacts (config snapshot,
        # metric CSVs); the others run the bare task on the same state.
        train_m, test_m = Experiment(classification_task, config).run()
        with open(out, 'w') as f:
            json.dump({'train': train_m, 'test': test_m}, f)
    else:
        # Mirror Experiment.run's task invocation (minus artifact
        # writes): forwarding restore_experiment matters — a resumed pod
        # in which only process 0 restored would train divergent
        # replicas and desynchronize the collective checkpoint saves.
        root = Path(config['log'].get('root_experiments_dir',
                                      'experiments/'))
        restore = config.get('restore_experiment')
        classification_task(
            config, root,
            restore_experiment=Path(restore) if restore else None)


if __name__ == '__main__':
    main()
