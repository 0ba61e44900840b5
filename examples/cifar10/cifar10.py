"""CIFAR-10 QResNet driver (reference examples/cifar10/cifar10.py).

Usage:
    python examples/cifar10/cifar10.py --config examples/cifar10/cifar10_fp.yaml \
        --experiment-name my-run
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from quant_tpu.config import get_base_argument_parser, parse_config  # noqa: E402
from quant_tpu.data import CIFAR10DataLoader  # noqa: E402
from quant_tpu.experiment import Experiment  # noqa: E402
from quant_tpu.platform import LocalComputePlatform  # noqa: E402
from quant_tpu.train.task import classification_task  # noqa: E402
from quant_tpu.utils.visualization import get_tensorboard_hooks  # noqa: E402


def main() -> None:
    parser = get_base_argument_parser('CIFAR-10 experiment with QResNet')
    config = parse_config(parser.parse_args())
    experiment = Experiment(classification_task, config, CIFAR10DataLoader,
                            get_tensorboard_hooks)
    LocalComputePlatform().run(experiment)


if __name__ == '__main__':
    main()
