"""Shared build-and-load helper for the native data-pipeline libraries.

Both quant_tpu.data.native (_quantdata.so) and quant_tpu.data.native_jpeg
(_quantjpeg.so) auto-build their library on first import when a compiler
is present. The compile goes to a temp file and is os.replace()d into
place so concurrent processes (multi-host launches, parallel tests)
never dlopen a half-written .so.
"""

import ctypes
import logging
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional, Sequence

logger = logging.getLogger(__name__)


def build_and_load(src: Path, so: Path,
                   extra_flags: Sequence[str] = ()) -> Optional[ctypes.CDLL]:
    """Load `so`, building it from `src` first when missing.

    Returns None (with a log note) when the source is absent, the
    compiler is unavailable, the flags don't apply on this host, or the
    load fails — callers fall back to their pure-Python paths.
    """
    if not so.exists():
        if not src.exists():
            return None
        fd, tmp = tempfile.mkstemp(suffix='.so', dir=str(so.parent))
        os.close(fd)
        try:
            subprocess.run(
                ['g++', '-O3', '-march=native', '-fPIC', '-shared',
                 str(src), '-o', tmp, *extra_flags],
                check=True, capture_output=True, timeout=120)
            os.replace(tmp, so)  # atomic: never a half-written .so
        except (OSError, subprocess.SubprocessError) as e:
            logger.info('native build of %s skipped: %s', so.name, e)
            return None
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    try:
        return ctypes.CDLL(str(so))
    except OSError as e:  # pragma: no cover
        logger.info('native load of %s failed: %s', so.name, e)
        return None
