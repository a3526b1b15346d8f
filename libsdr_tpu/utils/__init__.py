"""Infra: logging and CLI options (reference layer L8)."""

from libsdr_tpu.utils.logging import get_logger, set_level

__all__ = ["get_logger", "set_level"]
