"""Windowed multi-head attention compute.

Rebuild of the attention math in reference ``WindowAttention.forward``
(models/swin_transformer_mtlora.py:186-227): scaled q@k^T + relative
position bias (+ optional shift mask) -> softmax -> @v.

The jnp path maps onto batched MXU matmuls. A Pallas fused kernel
(``mtlora_tpu.ops.pallas_window_attn``) implements the same contract for
the hot path; this module is the reference implementation and fallback.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def window_attention(
    qkv: jnp.ndarray,
    num_heads: int,
    rel_pos_bias: jnp.ndarray,
    shift_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Compute window attention from a fused qkv projection.

    Args:
      qkv: [B_, N, 3*C] windows-as-batch fused projection (B_ = B * nW).
      num_heads: head count; head_dim = C // num_heads.
      rel_pos_bias: [num_heads, N, N] gathered relative position bias.
      shift_mask: optional [nW, N, N] additive 0/-100 mask for SW-MSA;
        B_ must be divisible by nW.
      scale: q scaling; defaults to head_dim ** -0.5.
      dropout_rate / dropout_rng: attention-probability dropout (train only).

    Returns: [B_, N, C] attention output (pre-proj).
    """
    B_, N, three_c = qkv.shape
    C = three_c // 3
    head_dim = C // num_heads
    if scale is None:
        scale = head_dim ** -0.5

    qkv = qkv.reshape(B_, N, 3, num_heads, head_dim)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # [B_, nH, N, hd]
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)

    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                      preferred_element_type=jnp.float32)
    attn = attn + rel_pos_bias[None].astype(attn.dtype)
    if shift_mask is not None:
        nW = shift_mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, num_heads, N, N)
        attn = attn + shift_mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(B_, num_heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    attn = attn.astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B_, N, C)


def relative_position_index(window_size: int):
    """Static [N, N] gather index into the (2w-1)^2 bias table.

    Mirrors the buffer built at reference
    swin_transformer_mtlora.py:147-162. Pure numpy (trace-time constant).
    """
    import numpy as np

    w = window_size
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))  # [2, w, w]
    flat = coords.reshape(2, -1)  # [2, N]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)  # [N, N, 2]
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)  # [N, N]


def shift_attention_mask(H: int, W: int, window_size: int, shift: int):
    """Static [nW, N, N] additive mask for shifted windows.

    Mirrors the 9-region mask construction at reference
    swin_transformer_mtlora.py:297-323. Pure numpy (trace-time constant).
    """
    import numpy as np

    ws = window_size
    img_mask = np.zeros((H, W), dtype=np.int32)
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for h in slices:
        for w_ in slices:
            img_mask[h, w_] = cnt
            cnt += 1
    # partition into windows
    m = img_mask.reshape(H // ws, ws, W // ws, ws)
    m = m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)  # [nW, N]
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # [nW, N, N]
