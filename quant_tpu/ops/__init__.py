"""Pure quantization math: the algorithm core of the framework.

Everything in this package is a pure, jittable function over `jnp` arrays —
no module state, no Python-side control flow on traced values. Quantizer
state (cached scales, EMA statistics) lives one layer up, in `quant_tpu.nn`.

`ops.pool` is EXPERIMENTAL and deliberately not re-exported here: its
Pallas stem max-pool measured ~4x slower than XLA's reduce_window on
this toolchain and no production path calls it (see its docstring).
"""

from quant_tpu.ops.ste import binarize, binary_sign
from quant_tpu.ops.optimal import opt_v1
from quant_tpu.ops.quantize import (
    clamp_identity,
    clamp_symmetric,
    quantizer_fp,
    quantizer_ls_1,
    quantizer_ls_2,
    quantizer_ls_ternary,
    quantizer_gf,
)

__all__ = [
    'binarize', 'binary_sign', 'opt_v1',
    'clamp_identity', 'clamp_symmetric', 'quantizer_fp',
    'quantizer_ls_1', 'quantizer_ls_2', 'quantizer_ls_ternary', 'quantizer_gf',
]
