"""Native (C++) host-side image ops. See native.py for the ctypes API."""

from mtlora_tpu.data.native.native import (  # noqa: F401
    available,
    build,
    hflip,
    resize,
    warp_affine,
)
