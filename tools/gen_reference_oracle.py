"""Generate frozen parity oracles from the PyTorch reference.

Runs the reference implementation (mounted read-only at /root/reference)
on fixed random inputs and freezes the outputs into
tests/data_oracle/reference_oracle.npz. Tests compare quant_tpu against
this file WITHOUT importing torch (importing torch after jax deadlocks on
conflicting OpenMP runtimes in this image — this script is torch-only).

Regenerate with:  python tools/gen_reference_oracle.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, '/root/reference')
import torch  # noqa: E402

from quant.binary.optimal import opt_v1  # noqa: E402
from quant.binary.quantization import (  # noqa: E402
    quantizer_gf, quantizer_ls_1, quantizer_ls_2, quantizer_ls_ternary,
)

OUT = Path(__file__).resolve().parent.parent / 'tests' / 'data_oracle'


def main() -> None:
    rng = np.random.default_rng(12345)
    out = {}

    # opt_v1 oracle: (24, 96) rows, both modes, skip 1 and 3.
    x2d = rng.standard_normal((24, 96)).astype(np.float32)
    out['opt_x2d'] = x2d
    t = torch.from_numpy(x2d)
    for ternary in (False, True):
        for skip in (1, 3):
            key = f'opt_v1_t{int(ternary)}_s{skip}'
            out[key] = opt_v1(t, ternary=ternary,
                              skip=skip).view(-1).numpy()

    # Quantizer oracle: 4D tensor, all schemes (default skip=3 inside).
    x4d = rng.standard_normal((6, 3, 8, 8)).astype(np.float32)
    out['x4d'] = x4d
    t4 = torch.from_numpy(x4d)
    v1, q = quantizer_ls_1(t4)
    out['ls1_v1'], out['ls1_q'] = v1.numpy(), q.numpy()
    v1, v2, q = quantizer_ls_2(t4)
    out['ls2_v1'], out['ls2_v2'], out['ls2_q'] = (
        v1.numpy(), v2.numpy(), q.numpy())
    v1, q = quantizer_ls_ternary(t4)
    out['lsT_v1'], out['lsT_q'] = v1.numpy(), q.numpy()
    vs, q = quantizer_gf(t4, k=3)
    out['gf3_vs'] = torch.stack(vs).numpy()
    out['gf3_q'] = q.numpy()

    OUT.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT / 'reference_oracle.npz', **out)
    print(f'wrote {OUT / "reference_oracle.npz"}: {sorted(out)}')


if __name__ == '__main__':
    main()
