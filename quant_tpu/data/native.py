"""ctypes bindings for the native data-pipeline library.

Loads quant_tpu/data/_quantdata.so (built by scripts/build_native.sh; the
build is attempted on first import when the .so is missing and a compiler
exists). All entry points have numpy fallbacks so the framework works
without a toolchain — `AVAILABLE` reports which path is active.
"""

import ctypes
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from quant_tpu.data._native_build import build_and_load

logger = logging.getLogger(__name__)

_SO = Path(__file__).resolve().parent / '_quantdata.so'
_SRC = Path(__file__).resolve().parents[2] / 'native' / 'quantdata.cpp'

_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    lib = build_and_load(_SRC, _SO, ('-fopenmp',))
    if lib is None:
        return None
    i64, u64, i32 = ctypes.c_int64, ctypes.c_uint64, ctypes.c_int32
    fp = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    ip = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    lib.qtd_shuffle.argtypes = [ip, i64, u64]
    lib.qtd_gather.argtypes = [fp, ip, fp, i64, i64]
    lib.qtd_crop_flip.argtypes = [fp, fp, i64, i64, i64, i64, i64, u64, fp]
    lib.qtd_make_batch.argtypes = [fp, ip, i64, fp, i64, i64, i64, i64,
                                   i64, u64, ctypes.c_int, fp]
    _lib = lib
    return lib


AVAILABLE = _load() is not None


def shuffled_order(n: int, seed: int) -> np.ndarray:
    idx = np.arange(n, dtype=np.int32)
    lib = _load()
    if lib is not None:
        lib.qtd_shuffle(idx, n, np.uint64(seed))
    else:
        np.random.default_rng(seed).shuffle(idx)
    return idx


def make_batch(src: np.ndarray, order: np.ndarray, start: int,
               batch: int, pad: int, seed: int, augment: bool,
               pad_value: Optional[np.ndarray] = None) -> np.ndarray:
    """Fused gather(+crop/flip) of one batch from an NHWC array.

    pad_value: per-channel fill for out-of-bounds crop pixels (the
    normalized value of a raw black pixel); zeros when omitted.
    """
    n, h, w, c = src.shape
    pv = np.zeros((c,), np.float32) if pad_value is None \
        else np.ascontiguousarray(pad_value, np.float32)
    lib = _load()
    out = np.empty((batch, h, w, c), np.float32)
    if lib is not None:
        lib.qtd_make_batch(np.ascontiguousarray(src, np.float32),
                           np.ascontiguousarray(order, np.int32),
                           start, out, batch, h, w, c, pad,
                           np.uint64(seed), int(augment), pv)
        return out
    sel = src[order[start:start + batch]]
    if not augment:
        return np.ascontiguousarray(sel, np.float32)
    from quant_tpu.data.loaders import random_crop_flip
    return random_crop_flip(sel, np.random.default_rng(seed + start),
                            pad=pad, pad_value=pv).astype(np.float32)
