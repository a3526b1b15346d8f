"""Core block-streaming runtime (reference layers L0-L2, SURVEY.md section 1)."""

from libsdr_tpu.core.stream import StreamSpec, ConfigError
from libsdr_tpu.core.block import Processor, Lambda
from libsdr_tpu.core.graph import Pipeline
from libsdr_tpu.core.runtime import stream_blocks, run_pipeline

__all__ = [
    "StreamSpec",
    "ConfigError",
    "Processor",
    "Lambda",
    "Pipeline",
    "stream_blocks",
    "run_pipeline",
]
