"""Leveled logging — the analog of the reference's ``sdr::Logger`` singleton
with pluggable handlers (reference: src/logger.hh:12-111).  We simply adapt
Python's stdlib logging: one framework-wide logger tree under ``libsdr_tpu``
with a stderr stream handler, mirroring ``StreamLogHandler``
(reference: src/logger.hh:84-111)."""

from __future__ import annotations

import logging
import sys

_ROOT = "libsdr_tpu"
_configured = False


def _configure() -> None:
    global _configured
    if _configured:
        return
    root = logging.getLogger(_ROOT)
    if not root.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname).1s %(name)s: %(message)s", "%H:%M:%S"))
        root.addHandler(h)
    root.setLevel(logging.WARNING)
    _configured = True


def get_logger(name: str) -> logging.Logger:
    _configure()
    if not name.startswith(_ROOT):
        name = f"{_ROOT}.{name}"
    return logging.getLogger(name)


def set_level(level) -> None:
    """Set the framework log level (DEBUG/INFO/WARNING/ERROR), the analog of
    the reference's LogHandler level filter (reference: src/logger.hh:87-92)."""
    _configure()
    logging.getLogger(_ROOT).setLevel(level)
