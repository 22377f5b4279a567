"""Process-zero-guarded logging.

Counterpart of the reference's rank-zero logger
(/root/reference/deadtrees/utils/utils.py:13-31): in multi-host runs only
process 0 emits (jax.process_index() replaces Lightning's rank_zero_only).
"""

from __future__ import annotations

import logging


class _ProcessZeroFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:
        try:
            import jax

            return jax.process_index() == 0
        except Exception:
            return True


def get_logger(name: str = __name__, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not any(isinstance(f, _ProcessZeroFilter) for f in logger.filters):
        logger.addFilter(_ProcessZeroFilter())
    return logger
