"""Env-configurable per-module logging (reference parity:
pystore/logger.py:1-70 — ``get_logger``/``setup_logging`` with a
``PYSTORE_LOG_LEVEL`` env switch; here the namespace and env var are
``pystore_spark`` / ``PYSTORE_SPARK_LOG_LEVEL``).

Unlike the reference, nothing is configured at import time unless the
env var is explicitly set — a library should not install handlers on
behalf of the application by default.
"""

from __future__ import annotations

import logging
import os

_ROOT = "pystore_spark"
ENV_VAR = "PYSTORE_SPARK_LOG_LEVEL"


def get_logger(name: str) -> logging.Logger:
    """Logger namespaced under ``pystore_spark.<name>``."""
    return logging.getLogger(f"{_ROOT}.{name}")


def setup_logging(level: str | None = None) -> logging.Logger:
    """Configure the package root logger.

    ``level`` falls back to the ``PYSTORE_SPARK_LOG_LEVEL`` env var,
    then to WARNING. Re-running replaces the package handler (no
    duplicate lines) and leaves the application's root logger alone.
    """
    if level is None:
        level = os.environ.get(ENV_VAR, "WARNING")
    logger = logging.getLogger(_ROOT)
    logger.setLevel(getattr(logging, str(level).upper(), logging.WARNING))
    for handler in logger.handlers[:]:
        logger.removeHandler(handler)
    handler = logging.StreamHandler()
    handler.setFormatter(
        logging.Formatter(
            "%(asctime)s - %(name)s - %(levelname)s - %(message)s",
            datefmt="%Y-%m-%d %H:%M:%S",
        )
    )
    logger.addHandler(handler)
    logger.propagate = False
    return logger


if os.environ.get(ENV_VAR):
    setup_logging()
