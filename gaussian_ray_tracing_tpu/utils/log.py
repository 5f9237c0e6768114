"""Structured logging (replaces the reference's std::cout prints and the
OptiX context log callback, src/Utility.h:9-13)."""

from __future__ import annotations

import json
import logging
import sys
import time

_logger = None


def get_logger(name: str = "grt") -> logging.Logger:
    global _logger
    if _logger is None:
        logger = logging.getLogger(name)
        if not logger.handlers:
            h = logging.StreamHandler(sys.stderr)
            h.setFormatter(logging.Formatter("[%(asctime)s %(levelname)s %(name)s] %(message)s"))
            logger.addHandler(h)
        logger.setLevel(logging.INFO)
        _logger = logger
    return _logger


def log_metrics(metrics: dict, step: int | None = None, stream=sys.stdout):
    """One JSON line per metrics record (machine-parsable observability)."""
    rec = {"ts": time.time()}
    if step is not None:
        rec["step"] = step
    rec.update(metrics)
    stream.write(json.dumps(rec) + "\n")
    stream.flush()
