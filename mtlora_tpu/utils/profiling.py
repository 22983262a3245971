"""Profiling / tracing utilities.

The reference's observability is limited to ptflops GMACs at startup and
wall-clock meters (SURVEY.md section 5). Here:
  - ``trace()`` context manager wraps ``jax.profiler`` and writes a
    TensorBoard-compatible trace;
  - ``benchmark()`` times a jitted callable with REAL device syncs
    (device_get of a scalar — block_until_ready can return early on
    experimental platforms);
  - ``summarize()`` reports XLA cost analysis (flops, bytes accessed,
    achieved bandwidth / MFU).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import numpy as np

# bf16 peak TFLOPs per chip by TPU generation (public specs)
PEAK_TFLOPS = {"v4": 275.0, "v5e": 197.0, "v5p": 459.0, "v6e": 918.0}
PEAK_HBM_GBPS = {"v4": 1200.0, "v5e": 820.0, "v5p": 2765.0, "v6e": 1640.0}


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mtlora_trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _sync(out):
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def benchmark(fn: Callable, *args, warmup: int = 3, iters: int = 10
              ) -> float:
    """Mean seconds per call, hard-synced."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def summarize(jitted_fn, *args, seconds: Optional[float] = None,
              generation: str = "v5e") -> Dict:
    """XLA cost analysis + achieved utilization for a jitted callable."""
    comp = jitted_fn.lower(*args).compile()
    ca = comp.cost_analysis() or {}
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    gbytes = float(ca.get("bytes accessed", 0.0)) / 1e9
    out = {"flops": flops, "bytes_accessed_gb": gbytes}
    if seconds:
        out["tflops_per_sec"] = flops / seconds / 1e12
        out["achieved_bw_gbps"] = gbytes / seconds
        out["mfu"] = flops / seconds / (PEAK_TFLOPS[generation] * 1e12)
        out["hbm_utilization"] = (gbytes / seconds
                                  / PEAK_HBM_GBPS[generation])
    return out
