"""Process-zero-aware logging.

TPU-native analog of the reference's rank-zero logger
(reference: matcha/utils/pylogger.py:6-21): in a multi-host JAX job only
process 0 emits log records, so per-host logs do not interleave.
"""

import logging
from typing import Any


def _is_main_process() -> bool:
    try:
        import jax

        return jax.process_index() == 0
    except Exception:  # pragma: no cover - jax not initialised yet
        return True


class _ProcessZeroLogger(logging.LoggerAdapter):
    """Wraps a logger so every level only fires on JAX process 0."""

    def log(self, level: int, msg: Any, *args: Any, **kwargs: Any) -> None:
        if self.isEnabledFor(level) and _is_main_process():
            kwargs.pop("rank", None)
            self.logger.log(level, msg, *args, **kwargs)


def get_pylogger(name: str = __name__) -> _ProcessZeroLogger:
    """Initialise a multi-host-friendly python command line logger."""
    logger = logging.getLogger(name)
    return _ProcessZeroLogger(logger, {})
