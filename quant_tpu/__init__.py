"""quant_tpu — a TPU-native least-squares binary quantization framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
PyTorch reference `apple/ml-quant` (Least Squares Binary Quantization of
Neural Networks, Pouransari et al., CVPR-W 2020): 1/2-bit, ternary and
greedy-foldable weight & activation quantizers with least-squares-optimal
scale factors solved on device, quantized conv layers, LeNet/ResNet model
families, a YAML-configured training engine with knowledge distillation,
checkpoint/resume and metrics — plus what the reference only simulates:
bit-packed binary-GEMM Pallas kernels and multi-chip sharding over a
`jax.sharding.Mesh`.

Layer map (bottom-up):
  ops/       pure quantization math: STE sign, optimal-scale solvers,
             ls-1/ls-2/ls-T/gf-k quantizer functions, conv primitives,
             bit-packing and Pallas binary-GEMM kernels
  nn/        flax.linen modules: quantizer state handling, QuantConv2d,
             LeNet-5 and QResNet model families
  data/      input pipelines (native binary dataset readers + synthetic)
  train/     jitted train/eval steps, metrics, optimizers/schedules, KD
  parallel/  device meshes and sharding rules (DP/TP over ICI)
  utils/     checkpointing (orbax), logging, visualization
  config/    YAML config schema (reference-compatible) + CLI parsing
"""

from typing import Callable, Dict

__version__ = '0.5.0'

# Reference-parity aliases (quant/__init__.py:18-29): per-batch hook
# callables threaded through the train/eval loops, and the metric-dict
# shape the task driver produces.
Hook = Callable[..., None]
MetricDict = Dict[str, float]
