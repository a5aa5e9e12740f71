"""Leveled logging.

Reference: common/base/include/.../logging/logging.hpp:58-107 (LogLevel
critical..debug, initialize_logger to stderr or file, GW_LOG_* macros
capturing file/line) with the plain-ostream implementation of
src/logging.cpp:36-100. This build adapts Python's ``logging`` with the
reference's level names and a matching initialize/log surface.
"""

from __future__ import annotations

import enum
import logging as _pylogging
import sys


class LogLevel(enum.IntEnum):
    """logging.hpp:58 — ordered most to least severe."""

    critical = 0
    error = 1
    warn = 2
    info = 3
    debug = 4


_TO_PY = {
    LogLevel.critical: _pylogging.CRITICAL,
    LogLevel.error: _pylogging.ERROR,
    LogLevel.warn: _pylogging.WARNING,
    LogLevel.info: _pylogging.INFO,
    LogLevel.debug: _pylogging.DEBUG,
}

_logger = _pylogging.getLogger("genomeworks_tpu")
_initialized = False


def initialize_logger(level: LogLevel = LogLevel.error, filename: str | None = None) -> None:
    """logging.hpp:70 — route logs to stderr or a file at the given level."""
    global _initialized
    for h in list(_logger.handlers):
        _logger.removeHandler(h)
    handler = (
        _pylogging.FileHandler(filename)
        if filename
        else _pylogging.StreamHandler(sys.stderr)
    )
    handler.setFormatter(
        _pylogging.Formatter("[%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s")
    )
    _logger.addHandler(handler)
    _logger.setLevel(_TO_PY[LogLevel(level)])
    _initialized = True


def _log(level: LogLevel, message: str) -> None:
    if not _initialized:
        initialize_logger()
    _logger.log(_TO_PY[LogLevel(level)], message, stacklevel=3)


def log_critical(message: str) -> None:
    _log(LogLevel.critical, message)


def log_error(message: str) -> None:
    _log(LogLevel.error, message)


def log_warn(message: str) -> None:
    _log(LogLevel.warn, message)


def log_info(message: str) -> None:
    _log(LogLevel.info, message)


def log_debug(message: str) -> None:
    _log(LogLevel.debug, message)
