"""Logging setup — the spdlog analog (reference: common.h:15-28 aliases
spdlog into every translation unit; we expose one configured logger)."""

from __future__ import annotations

import logging
import os

_LOGGER = None


def get_logger() -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger("capsaicin_tpu")
        if not logger.handlers:
            handler = logging.StreamHandler()
            handler.setFormatter(
                logging.Formatter("[%(asctime)s] [%(levelname)s] %(message)s", "%H:%M:%S")
            )
            logger.addHandler(handler)
        logger.setLevel(os.environ.get("CAPSAICIN_LOG", "INFO").upper())
        _LOGGER = logger
    return _LOGGER


def info(msg, *args):
    get_logger().info(msg, *args)


def warn(msg, *args):
    get_logger().warning(msg, *args)


def error(msg, *args):
    get_logger().error(msg, *args)
