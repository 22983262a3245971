"""Analytic FLOPs accounting.

Rebuild of the reference's per-module ``flops()`` methods
(swin_transformer_mtlora.py:232-243,414-426,477-481,556-562,763-772) and
the ptflops GMACs printout (main.py:162-165), plus an XLA-measured count
from ``compiled.cost_analysis()`` (which the reference cannot do).
"""

from __future__ import annotations

from typing import Tuple


def window_attention_flops(dim: int, num_heads: int, n: int) -> int:
    """One window, token length n (reference WindowAttention.flops:232)."""
    f = n * dim * 3 * dim           # qkv
    f += num_heads * n * (dim // num_heads) * n   # q@k^T
    f += num_heads * n * n * (dim // num_heads)   # attn@v
    f += n * dim * dim              # proj
    return f


def swin_block_flops(dim: int, input_resolution: Tuple[int, int],
                     num_heads: int, window_size: int,
                     mlp_ratio: float) -> int:
    H, W = input_resolution
    f = dim * H * W                     # norm1
    nw = H * W / window_size / window_size
    f += int(nw * window_attention_flops(dim, num_heads,
                                         window_size * window_size))
    f += int(2 * H * W * dim * dim * mlp_ratio)   # mlp
    f += dim * H * W                    # norm2
    return f


def patch_merging_flops(dim: int, input_resolution: Tuple[int, int]) -> int:
    H, W = input_resolution
    return H * W * dim + (H // 2) * (W // 2) * 4 * dim * 2 * dim


def swin_backbone_flops(img_size: int = 224, patch_size: int = 4,
                        embed_dim: int = 96,
                        depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                        window_size: int = 7, mlp_ratio: float = 4.0,
                        patch_norm: bool = True, num_classes: int = 0,
                        in_chans: int = 3) -> int:
    """Whole-backbone MAC-style count (reference flops():763-772)."""
    pr = img_size // patch_size
    f = pr * pr * embed_dim * in_chans * patch_size * patch_size
    if patch_norm:
        f += pr * pr * embed_dim
    n_layers = len(depths)
    for i in range(n_layers):
        dim = int(embed_dim * 2 ** i)
        res = (pr // (2 ** i), pr // (2 ** i))
        f += depths[i] * swin_block_flops(dim, res, num_heads[i],
                                          window_size, mlp_ratio)
        if i < n_layers - 1:
            f += patch_merging_flops(dim, res)
    num_features = int(embed_dim * 2 ** (n_layers - 1))
    f += num_features * pr * pr // (2 ** n_layers)
    f += num_features * num_classes
    return f


def measured_flops(jitted_fn, *args) -> float:
    """XLA-reported FLOPs for a jitted callable (0.0 if unavailable)."""
    try:
        comp = jitted_fn.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0] if ca else {}
        return float((ca or {}).get("flops", 0.0))
    except Exception:
        return 0.0
