"""Cross-cutting utilities: tracing/profiling and structured logging."""

from tpu_slam.utils.tracing import profile_trace, time_jitted
from tpu_slam.utils.logging import get_logger

__all__ = ["profile_trace", "time_jitted", "get_logger"]
