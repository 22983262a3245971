"""Fused window attention Pallas kernel.

TPU-native successor of the reference's fused CUDA window-process kernel
(kernels/window_process/swin_window_process_kernel.cu), fusing the whole
attention core: scaled QK^T + relative position bias + shift mask +
softmax + AV run entirely in VMEM for all windows of one image per grid
cell. The [B*nW, nH, 49, 49] score/softmax tensors never touch HBM in
the forward pass, and the backward kernel recomputes them in VMEM from
the windowed qkv input instead of storing fp32 softmax residuals — the
dominant HBM-traffic term of the attention block (the Swin workload is
measured HBM-bandwidth bound).

Mosaic constraints shape the design:
  - at most ONE batch dimension per tpu.matmul -> dots batch over the
    window axis only; heads are extracted by LANE SLICING in a static
    unrolled loop (never by reshaping the lane dim);
  - no sublane/lane reshapes inside the kernel -> the window partition /
    merge layout transforms stay outside as XLA copies (they are cheap
    relative to the score tensors), and the kernel consumes the windowed
    [B*nW, N, 3C] layout directly.

The cyclic shift stays outside as jnp.roll, mirroring
WindowProcess.apply's contract (.cu:42-67).

Window pack-2: with ws=7 the per-window score matmuls are 49x{hd}x49 —
the 49 output lanes pad to the 128-lane MXU tile, so over half of every
MXU pass computes garbage. Packing TWO windows per attention instance
(N=98 <= 128 lanes) via a FREE reshape [2M, 49, 3C] -> [M, 98, 3C] fills
the padding with the second window's real work: the cross-window score
quadrants land in lanes the hardware was already burning, and a
block-diagonal -1e9 bias kills them in the softmax (exp underflows to
exactly 0, so the backward's ds is exactly 0 there too — numerics are
bit-comparable to the unpacked kernel). Matmul-instruction count and
softmax sublane padding both halve.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtlora_tpu.ops.window import (
    shift_window_partition,
    window_merge_unshift,
)

def _prec(dtype):
    # fp32 operands: force multi-pass fp32 MXU; Mosaic's default is a
    # single bf16 pass (~3e-3 rel), fine for bf16 inputs only
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


# Per-kernel scoped-VMEM ceiling (platform default 16 MB; v5e has
# 128 MB). Larger window groups amortize the per-head python-unrolled
# dots — the backward was measured latency-bound at small G.
_VMEM_LIMIT = 64 << 20


# dot_general dimension numbers (single window-batch dim):
_DN_QK = (((2,), (2,)), ((0,), (0,)))   # q[.,N,hd] x k[.,N,hd] -> [.,N,N]
_DN_PV = (((2,), (1,)), ((0,), (0,)))   # p[.,N,N] x v[.,N,hd] -> [.,N,hd]
_DN_T1 = (((1,), (1,)), ((0,), (0,)))   # contract over first N axis


def _head_softmax(x, bias, mask, h, *, C, hd, scale):
    """Per-head scores+softmax for windows x [nW, N, 3C] (fp32 out)."""
    q = x[:, :, h * hd:(h + 1) * hd]
    k = x[:, :, C + h * hd:C + (h + 1) * hd]
    s = jax.lax.dot_general(q * scale, k, dimension_numbers=_DN_QK,
                            preferred_element_type=jnp.float32,
                            precision=_prec(x.dtype))
    s = s + bias[h][None].astype(jnp.float32)
    if mask is not None:
        s = s + mask.astype(jnp.float32)
    return jax.nn.softmax(s, axis=-1)


def _fwd_kernel(qkv_ref, bias_ref, mask_ref, o_ref, *, num_heads,
                scale, has_mask):
    x = qkv_ref[...]  # [nW, N, 3C]
    C = x.shape[-1] // 3
    hd = C // num_heads
    mask = mask_ref[0] if has_mask else None
    outs = []
    for h in range(num_heads):
        p = _head_softmax(x, bias_ref[...], mask, h, C=C, hd=hd,
                          scale=scale)
        v = x[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=_DN_PV,
            preferred_element_type=jnp.float32,
            precision=_prec(v.dtype)))
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, bias_ref, mask_ref, do_ref,
                dqkv_ref, dbias_ref, *, num_heads, scale, has_mask):
    x = qkv_ref[...]
    C = x.shape[-1] // 3
    hd = C // num_heads
    mask = mask_ref[0] if has_mask else None
    do_w = do_ref[...]  # [nW, N, C]
    dqs, dks, dvs, dbs = [], [], [], []
    for h in range(num_heads):
        p = _head_softmax(x, bias_ref[...], mask, h, C=C, hd=hd,
                          scale=scale)
        q = x[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        k = x[:, :, C + h * hd:C + (h + 1) * hd].astype(jnp.float32)
        v = x[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd].astype(
            jnp.float32)
        do_h = do_w[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
        dvs.append(jax.lax.dot_general(
            p, do_h, dimension_numbers=_DN_T1,
            preferred_element_type=jnp.float32,
            precision=_prec(x.dtype)))
        dp = jax.lax.dot_general(
            do_h, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_prec(x.dtype))  # [nW, N, N]
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbs.append(jnp.sum(ds, axis=0))
        dqs.append(jax.lax.dot_general(
            ds, k, dimension_numbers=_DN_PV,
            preferred_element_type=jnp.float32,
            precision=_prec(x.dtype)) * scale)
        dks.append(jax.lax.dot_general(
            ds, q * scale, dimension_numbers=_DN_T1,
            preferred_element_type=jnp.float32,
            precision=_prec(x.dtype)))
    dbias_ref[0] = jnp.stack(dbs).astype(dbias_ref.dtype)
    dqkv_ref[...] = jnp.concatenate(
        dqs + dks + dvs, axis=-1).astype(dqkv_ref.dtype)


def _specs(G, N, C3, n_groups, has_mask):
    in_specs = [
        pl.BlockSpec((G, N, C3), lambda b, g: (b * n_groups + g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bias (full, replicated)
    ]
    if has_mask:
        # per-group mask slice [1, G, N, N]
        in_specs.append(pl.BlockSpec(
            (1, G, N, N), lambda b, g: (g, 0, 0, 0),
            memory_space=pltpu.VMEM))
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return in_specs


def _group_size(nw: int, cap: int) -> int:
    """Windows per grid cell: bounded for VMEM (qkv block + fp32
    score intermediates with double buffering), always divides nw."""
    g = min(nw, cap)
    while nw % g:
        g -= 1
    return g


# Off-diagonal fill for packed window pairs: large enough that
# exp(x - rowmax) underflows to exactly 0.0 in fp32 (the backward's
# softmax-jacobian term is then exactly 0 too), small enough to stay
# finite through the bias+mask adds.
_PACK_NEG = -1e9


def _pack2_bias(bias: jnp.ndarray) -> jnp.ndarray:
    """[nH, N, N] -> block-diagonal [nH, 2N, 2N] with -1e9 off-diagonal.

    Differentiable: the VJP of the concatenates routes the kernel's
    dbias diagonal blocks back onto the original table (summed), so the
    relative-position-bias gradient needs no special handling."""
    nH, N, _ = bias.shape
    neg = jnp.full((nH, N, N), _PACK_NEG, bias.dtype)
    top = jnp.concatenate([bias, neg], axis=-1)
    bot = jnp.concatenate([neg, bias], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _pack2_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """[nW, N, N] -> [nW//2, 2N, 2N]; off-diagonal 0 (bias carries -1e9)."""
    nW, N, _ = mask.shape
    m = mask.reshape(nW // 2, 2, N, N)
    z = jnp.zeros_like(m[:, 0])
    top = jnp.concatenate([m[:, 0], z], axis=-1)
    bot = jnp.concatenate([z, m[:, 1]], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _maybe_packed(qkv_w, bias, mask, num_heads, nw, scale, interpret):
    """Dispatch to the kernel, packing two windows per instance when the
    shapes allow (see module docstring)."""
    Btot, N, C3 = qkv_w.shape
    if 2 * N <= 128 and (
            nw % 2 == 0 or (nw == 1 and mask is None and Btot % 2 == 0)):
        qkv_p = qkv_w.reshape(Btot // 2, 2 * N, C3)
        bias2 = _pack2_bias(bias)
        mask2 = _pack2_mask(mask) if mask is not None else None
        out = _fused_windows(qkv_p, bias2, mask2, num_heads,
                             max(1, nw // 2), scale, interpret)
        return out.reshape(Btot, N, C3 // 3)
    return _fused_windows(qkv_w, bias, mask, num_heads, nw, scale,
                          interpret)


def _fwd_cap(N, C3, has_mask, dtype):
    if dtype == jnp.float32:
        # HIGHEST-precision (multi-pass) matmuls need VMEM scratch
        return 8
    per_win = N * C3 * 2 + (N * N * 4 if has_mask else 0)
    return max(4, min(64, (3 << 20) // per_win))


def _run_fwd(qkv_w, bias, mask, num_heads, nw, scale, interpret):
    Btot, N, C3 = qkv_w.shape
    C = C3 // 3
    G = _group_size(nw, _fwd_cap(N, C3, mask is not None, qkv_w.dtype))
    n_groups = nw // G
    has_mask = mask is not None
    mask_arg = (mask.reshape(n_groups, G, N, N) if has_mask
                else jnp.zeros((1, 1), qkv_w.dtype))
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads,
                               scale=scale, has_mask=has_mask)
    return pl.pallas_call(
        kernel,
        grid=(Btot // nw, n_groups),
        in_specs=_specs(G, N, C3, n_groups, has_mask),
        out_specs=pl.BlockSpec(
            (G, N, C), lambda b, g: (b * n_groups + g, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Btot, N, C), qkv_w.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qkv_w, bias, mask_arg)


def _run_bwd(qkv_w, bias, mask, do, num_heads, nw, scale, interpret):
    Btot, N, C3 = qkv_w.shape
    C = C3 // 3
    if qkv_w.dtype == jnp.float32:
        cap = 2  # HIGHEST-precision multi-pass buffers need VMEM headroom
    else:
        # more windows per cell amortizes the per-head recompute dots
        # (the bwd kernel was measured latency-bound at G=8); bound by
        # the [G, N, 3C] block + fp32 score intermediates in VMEM.
        # shifted blocks double-buffer an extra [1, G, N, N] fp32 mask
        # block — include it in the same budget. The per-window budget
        # was 1 MB to fit the platform's 16 MB scoped-vmem default;
        # with the per-kernel ceiling raised to _VMEM_LIMIT the budget
        # triples (bench: larger groups amortize the unrolled head loop)
        per_win = N * C3 * 2 + (N * N * 4 if mask is not None else 0)
        cap = max(4, min(64, (3 << 20) // per_win))
    G = _group_size(nw, cap)
    n_groups = nw // G
    n_cells = Btot // G
    has_mask = mask is not None
    mask_arg = (mask.reshape(n_groups, G, N, N) if has_mask
                else jnp.zeros((1, 1), qkv_w.dtype))
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                               scale=scale, has_mask=has_mask)
    in_specs = _specs(G, N, C3, n_groups, has_mask)
    in_specs.append(pl.BlockSpec(
        (G, N, C), lambda b, g: (b * n_groups + g, 0, 0),
        memory_space=pltpu.VMEM))
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=(Btot // nw, n_groups),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((G, N, C3),
                         lambda b, g: (b * n_groups + g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, N, N),
                         lambda b, g: (b * n_groups + g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Btot, N, C3), qkv_w.dtype),
            jax.ShapeDtypeStruct((n_cells, num_heads, N, N),
                                 jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qkv_w, bias, mask_arg, do)
    return dqkv, dbias.sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_windows(qkv_w, bias, mask, num_heads, nw, scale, interpret):
    return _run_fwd(qkv_w, bias, mask, num_heads, nw, scale, interpret)


def _fwd_rule(qkv_w, bias, mask, num_heads, nw, scale, interpret):
    out = _run_fwd(qkv_w, bias, mask, num_heads, nw, scale, interpret)
    return out, (qkv_w, bias, mask)


def _bwd_rule(num_heads, nw, scale, interpret, res, do):
    qkv_w, bias, mask = res
    dqkv, dbias = _run_bwd(qkv_w, bias, mask, do, num_heads, nw, scale,
                           interpret)
    return dqkv, dbias.astype(bias.dtype), None


_fused_windows.defvjp(_fwd_rule, _bwd_rule)


def fused_window_attention(
    qkv_map: jnp.ndarray,
    num_heads: int,
    rel_bias: jnp.ndarray,
    window_size: int,
    shift: int = 0,
    shift_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Windowed MHA over a token map.

    Args:
      qkv_map: [B, H, W, 3C] fused qkv projections in token layout.
      rel_bias: [nH, N, N] gathered relative position bias.
      shift: cyclic shift (SW-MSA); applied as jnp.roll around the kernel.
      shift_mask: [nW, N, N] additive mask (required when shift > 0).
    Returns: [B, H, W, C] attention output in token layout.
    """
    B, H, W, C3 = qkv_map.shape
    C = C3 // 3
    ws = window_size
    nw = (H // ws) * (W // ws)
    if scale is None:
        scale = (C // num_heads) ** -0.5
    qkv_w = shift_window_partition(qkv_map, ws, shift).reshape(
        B * nw, ws * ws, C3)
    out = _maybe_packed(qkv_w, rel_bias, shift_mask, num_heads, nw,
                        scale, interpret)
    return window_merge_unshift(
        out.reshape(-1, ws, ws, C), ws, shift, H, W, (B,))


def fused_window_attention_windowed(
    qkv_w: jnp.ndarray,
    num_heads: int,
    rel_bias: jnp.ndarray,
    num_windows: int,
    shift_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention core on PRE-windowed qkv ``[B*nW, N, 3C]`` (the caller
    permuted its C-wide INPUT into window order before the qkv GEMM —
     1/3 the layout traffic of permuting the 3C-wide qkv output).
    Returns ``[B*nW, N, C]`` in the same window order."""
    N, C3 = qkv_w.shape[-2:]
    C = C3 // 3
    if scale is None:
        scale = (C // num_heads) ** -0.5
    return _maybe_packed(qkv_w, rel_bias, shift_mask, num_heads,
                         num_windows, scale, interpret)
