"""Logging, profiling, and misc utilities."""

from mtlora_tpu.utils.logger import create_logger  # noqa: F401
