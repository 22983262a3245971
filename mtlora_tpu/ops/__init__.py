"""TPU compute ops.

Each hot op has a pure-jnp reference implementation and (where it pays) a
Pallas TPU kernel behind the same API, selected by ``use_pallas`` flags —
the TPU-native equivalent of the reference's opt-in fused CUDA window
kernel (``/root/reference/kernels/window_process/``).
"""

from mtlora_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_reverse,
    shift_window_partition,
    window_merge_unshift,
)
from mtlora_tpu.ops.attention import window_attention  # noqa: F401
