"""Logging for vllm_splitwise_tpu.

Mirrors the role of the reference's ``vllm/logger.py`` (init_logger with a
library-wide root handler, opt-out via env var), re-designed minimally: we
lean on the standard library and keep no global mutable state beyond the
handler installation.
"""
from __future__ import annotations

import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s"
_DATE_FORMAT = "%m-%d %H:%M:%S"

_root_name = "vllm_splitwise_tpu"
_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    _configured = True
    if os.environ.get("VST_CONFIGURE_LOGGING", "1") == "0":
        return
    root = logging.getLogger(_root_name)
    if root.handlers:
        return
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATE_FORMAT))
    root.addHandler(handler)
    root.setLevel(os.environ.get("VST_LOG_LEVEL", "INFO").upper())
    root.propagate = False


def init_logger(name: str) -> logging.Logger:
    _configure_root()
    if not name.startswith(_root_name):
        name = f"{_root_name}.{name}"
    return logging.getLogger(name)
