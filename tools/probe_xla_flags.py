"""XLA flag A/B on the packed flagship (untried toolchain axis).

The ratio-ceiling census (docs/DESIGN.md) measured this toolchain at
DEFAULT XLA flags. This probes whether ambient XLA_FLAGS move the
packed ls-1 ResNet-18 forward at batch 1024 — run it several times
under different flag sets (flags must be in the environment before jax
initializes, so the sweep lives in the shell, not in-process):

  python tools/probe_xla_flags.py baseline
  XLA_FLAGS='--xla_tpu_enable_latency_hiding_scheduler=true' \
      python tools/probe_xla_flags.py lhs
  ...

Appends {config: xla_flags_<tag>, ips, flags} to bench_ab_results.jsonl.
"""

import os
import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tools')

import jax
import jax.numpy as jnp

from measure import (enable_compile_cache, fill_quant_state,
                     record, throughput)

enable_compile_cache()


def main() -> None:
    from bench import _resnet18

    from quant_tpu.nn.export import (
        export_packed_variables, fold_xnor_thresholds,
    )

    tag = sys.argv[1] if len(sys.argv) > 1 else 'baseline'
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    key = jax.random.key(0)
    x = jax.random.normal(key, (batch, 224, 224, 3), jnp.float32)

    m = _resnet18('ls-1', 'ls-1', moving_average_mode='eval_only')
    v = fill_quant_state(dict(m.init(key, x[:2], True)))
    packed = m.clone(inference_mode='packed', eval_dtype=jnp.bfloat16,
                     sign_compute='int8')
    pv = export_packed_variables(packed, v, x[:1])
    fv = fold_xnor_thresholds(packed, pv)
    folded = packed.clone(bn_fold=True)
    ips = throughput(folded.apply, fv, x, iters)
    record(config=f'xla_flags_{tag}', batch=batch, ips=round(ips, 1),
           flags=os.environ.get('XLA_FLAGS', ''))


if __name__ == '__main__':
    main()
