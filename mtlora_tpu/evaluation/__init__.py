"""Streaming evaluation meters (jit-safe accumulator pytrees)."""

from mtlora_tpu.evaluation.meters import (  # noqa: F401
    PerformanceMeter,
    get_output,
    get_single_task_meter,
)
