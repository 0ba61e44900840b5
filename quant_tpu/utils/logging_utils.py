"""Logging setup (reference quant/common/__init__.py:11-23)."""

import logging

_LEVELS = {
    'CRITICAL': logging.CRITICAL,
    'ERROR': logging.ERROR,
    'WARNING': logging.WARNING,
    'INFO': logging.INFO,
    'DEBUG': logging.DEBUG,
}


def init_logging(level: str = 'INFO') -> None:
    logging.basicConfig(
        level=_LEVELS.get(str(level).upper(), logging.INFO),
        format='%(asctime)s %(name)s %(levelname)s: %(message)s',
    )
