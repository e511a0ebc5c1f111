"""Per-stream logging + terminal error handling.

The reference's A19 surface (reference ``app/utils/errors.py:7-26``,
``app/utils/logger.py:4-45``) with its bugs fixed: no module-level
singleton accumulating handlers per instantiation (ref bug #14), and the
decorator logs-and-raises instead of ``exit(1)`` (a library must not kill
the host process; the CLI edge decides that).
"""

from __future__ import annotations

import functools
import logging
from collections.abc import Callable
from typing import Any, TypeVar

__all__ = ["stream_logger", "log_and_reraise"]

F = TypeVar("F", bound=Callable[..., Any])

_FORMAT = "%(asctime)s %(levelname)s [%(stream_name)s] %(name)s: %(message)s"


class _StreamNameFilter(logging.Filter):
    def __init__(self, stream_name: str):
        super().__init__()
        self.stream_name = stream_name

    def filter(self, record: logging.LogRecord) -> bool:
        record.stream_name = self.stream_name
        return True


def stream_logger(
    stream_name: str,
    level: str = "INFO",
    log_file: str | None = None,
) -> logging.Logger:
    """A logger with the stream name injected into every record (the
    reference's StreamLogger intent, logger.py:19-37). Idempotent per
    stream name: repeated calls reuse handlers instead of stacking them."""
    logger = logging.getLogger(f"data_bridge_spark.stream.{stream_name}")
    logger.setLevel(level.upper())
    if not logger.handlers:
        handler: logging.Handler
        handler = logging.FileHandler(log_file) if log_file else logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        handler.addFilter(_StreamNameFilter(stream_name))
        logger.addHandler(handler)
        logger.propagate = False
    return logger


def log_and_reraise(logger: logging.Logger) -> Callable[[F], F]:
    """Decorator: log any exception with traceback, then re-raise
    (the reference's LogAndTerminate, errors.py:13-26, minus the exit)."""

    def deco(fn: F) -> F:
        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Any:
            try:
                return fn(*args, **kwargs)
            except Exception:
                logger.exception("terminal error in %s", fn.__qualname__)
                raise

        return wrapper  # type: ignore[return-value]

    return deco
