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
                scale, has_mask, chunks=1):
    """``chunks == 1``: block [G, N, 3C], one window(-pack) per row
    group. ``chunks > 1`` (dense mode): block [G, chunks*N, 3C] holding
    ``chunks`` window-packs as consecutive row chunks — the block then
    reshapes FREELY from the flat win-major token layout (chunks*N is a
    sublane-tileable 392 for ws=7 pack-2), killing the N=49 pad repack
    at the kernel boundary. Chunk rows are sliced at (unaligned) N
    offsets in-kernel; measured cost ~= 0 (pack2x4 ties pack2 in
    tools/attn_variants.py)."""
    x = qkv_ref[...]  # [G, chunks*N, 3C]
    C = x.shape[-1] // 3
    hd = C // num_heads
    N = x.shape[1] // chunks
    couts = []
    for c in range(chunks):
        xc = x[:, c * N:(c + 1) * N] if chunks > 1 else x
        # mask block: (1, G, N, N) when chunks == 1 (per-window slice of
        # the group), (G, chunks, N, N) in dense mode (per cell, chunk)
        mask = ((mask_ref[:, c] if chunks > 1 else mask_ref[0])
                if has_mask else None)
        outs = []
        for h in range(num_heads):
            p = _head_softmax(xc, bias_ref[...], mask, h, C=C, hd=hd,
                              scale=scale)
            v = xc[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
            outs.append(jax.lax.dot_general(
                p.astype(v.dtype), v, dimension_numbers=_DN_PV,
                preferred_element_type=jnp.float32,
                precision=_prec(v.dtype)))
        couts.append(jnp.concatenate(outs, axis=-1))
    out = (jnp.concatenate(couts, axis=-2) if chunks > 1 else couts[0])
    o_ref[...] = out.astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, bias_ref, mask_ref, do_ref,
                dqkv_ref, dbias_ref, *, num_heads, scale, has_mask,
                chunks=1):
    x = qkv_ref[...]
    C = x.shape[-1] // 3
    hd = C // num_heads
    N = x.shape[1] // chunks
    do_full = do_ref[...]  # [G, chunks*N, C]
    cgrads = []
    dbs_acc = None
    for c in range(chunks):
        xc = x[:, c * N:(c + 1) * N] if chunks > 1 else x
        mask = ((mask_ref[:, c] if chunks > 1 else mask_ref[0])
                if has_mask else None)
        do_w = (do_full[:, c * N:(c + 1) * N] if chunks > 1
                else do_full)
        dqs, dks, dvs, dbs = [], [], [], []
        for h in range(num_heads):
            p = _head_softmax(xc, bias_ref[...], mask, h, C=C, hd=hd,
                              scale=scale)
            q = xc[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
            k = xc[:, :, C + h * hd:C + (h + 1) * hd].astype(
                jnp.float32)
            v = xc[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd].astype(
                jnp.float32)
            do_h = do_w[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)
            dvs.append(jax.lax.dot_general(
                p, do_h, dimension_numbers=_DN_T1,
                preferred_element_type=jnp.float32,
                precision=_prec(x.dtype)))
            dp = jax.lax.dot_general(
                do_h, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=_prec(x.dtype))  # [G, N, N]
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
        cgrads.append(jnp.concatenate(dqs + dks + dvs, axis=-1))
        db = jnp.stack(dbs)
        dbs_acc = db if dbs_acc is None else dbs_acc + db
    dbias_ref[0] = dbs_acc.astype(dbias_ref.dtype)
    dqkv = (jnp.concatenate(cgrads, axis=-2) if chunks > 1
            else cgrads[0])
    dqkv_ref[...] = dqkv.astype(dqkv_ref.dtype)


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


# Dense mode: 4 window-pairs (392 = 8*49 rows, sublane-tileable) per
# kernel instance, so the input/output blocks reshape FREELY from/to the
# flat win-major token layout — the [B*nW, 49->56pad, 3C] boundary
# repacks (the "N=49 pad repack" bucket of the step profile) vanish.
# Kernel math is chunk-sliced pack-2, bit-identical to the packed path
# (tools/attn_variants.py: pack2x4 ties full(pack2) in kernel time).
_DENSE_CHUNKS = 4


def _dense_enabled() -> bool:
    # Default OFF: measured end-to-end A/B at flagship 448/batch-32 put
    # dense at 152.3 vs 153.3 img/s with it off — the saved boundary
    # repacks did not beat the in-kernel unaligned chunk slices. Kept
    # (equality-tested) as the substrate for future layout work.
    import os

    return os.environ.get("MTLORA_ATTN_DENSE", "0") != "0"


def _dense_mask(mask2, nw2):
    """[nW2, 98, 98] pack-2 masks -> ([mg, 4, 98, 98], mg) tiling the
    per-image mask period over 4-pair cells, or None if incompatible."""
    if nw2 % _DENSE_CHUNKS == 0:
        mg = nw2 // _DENSE_CHUNKS
        return mask2.reshape(mg, _DENSE_CHUNKS, *mask2.shape[-2:]), mg
    if _DENSE_CHUNKS % nw2 == 0:
        # cells span images; the mask pattern tiles exactly
        reps = _DENSE_CHUNKS // nw2
        return (jnp.concatenate([mask2] * reps, axis=0)
                .reshape(1, _DENSE_CHUNKS, *mask2.shape[-2:]), 1)
    return None, None


def _maybe_packed(qkv_w, bias, mask, num_heads, nw, scale, interpret):
    """Dispatch to the kernel, packing two windows per instance when the
    shapes allow (see module docstring), and grouping four pairs into
    dense 392-row cells when the layout allows (see _DENSE_CHUNKS)."""
    Btot, N, C3 = qkv_w.shape
    if 2 * N <= 128 and (
            nw % 2 == 0 or (nw == 1 and mask is None and Btot % 2 == 0)):
        P = Btot // 2
        nw2 = max(1, nw // 2)
        bias2 = _pack2_bias(bias)
        mask2 = _pack2_mask(mask) if mask is not None else None
        if (qkv_w.dtype == jnp.bfloat16 and N == 49
                and P % _DENSE_CHUNKS == 0 and _dense_enabled()):
            if mask2 is None:
                mask_d, mg = None, None
                ok = True
            else:
                mask_d, mg = _dense_mask(mask2, nw2)
                ok = mask_d is not None
            if ok:
                qkv_d = qkv_w.reshape(P // _DENSE_CHUNKS,
                                      2 * N * _DENSE_CHUNKS, C3)
                out = _fused_windows_dense(qkv_d, bias2, mask_d,
                                           num_heads, mg, scale,
                                           interpret)
                return out.reshape(Btot, N, C3 // 3)
        qkv_p = qkv_w.reshape(P, 2 * N, C3)
        out = _fused_windows(qkv_p, bias2, mask2, num_heads, nw2,
                             scale, interpret)
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


def _dense_grid(n_cells, mg, C3, has_mask, bwd):
    """(Gc, n_inner, grid) for dense cells: Gc cells per block with the
    same per-window VMEM budget as the packed path (a cell is 4 pack-2
    windows, so the per-cell budget is 4x the packed 3 MB/pair and the
    cell cap is the packed 64-pair cap / 4); blocks must stay within
    one mask period."""
    per_win = 98 * C3 * 2 + (98 * 98 * 4 if has_mask else 0)
    pair_cap = max(4, min(64, (3 << 20) // per_win))
    cap = max(1, pair_cap // _DENSE_CHUNKS)
    Gc = _group_size(mg if has_mask else n_cells, cap)
    n_inner = (mg // Gc) if has_mask else 1
    return Gc, n_inner, (n_cells // (Gc * n_inner), n_inner)


def _dense_specs(Gc, n_inner, C3, has_mask):
    R = 2 * 49 * _DENSE_CHUNKS
    in_specs = [
        pl.BlockSpec((Gc, R, C3), lambda b, g: (b * n_inner + g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),   # bias2 (replicated)
    ]
    if has_mask:
        in_specs.append(pl.BlockSpec(
            (Gc, _DENSE_CHUNKS, 98, 98), lambda b, g: (g, 0, 0, 0),
            memory_space=pltpu.VMEM))
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return in_specs


def _run_fwd_dense(qkv_d, bias2, mask_d, num_heads, mg, scale,
                   interpret):
    n_cells, R, C3 = qkv_d.shape
    C = C3 // 3
    has_mask = mask_d is not None
    Gc, n_inner, grid = _dense_grid(n_cells, mg, C3, has_mask, False)
    mask_arg = mask_d if has_mask else jnp.zeros((1, 1), qkv_d.dtype)
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads,
                               scale=scale, has_mask=has_mask,
                               chunks=_DENSE_CHUNKS)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=_dense_specs(Gc, n_inner, C3, has_mask),
        out_specs=pl.BlockSpec(
            (Gc, R, C), lambda b, g: (b * n_inner + g, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_cells, R, C), qkv_d.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qkv_d, bias2, mask_arg)


def _run_bwd_dense(qkv_d, bias2, mask_d, do, num_heads, mg, scale,
                   interpret):
    n_cells, R, C3 = qkv_d.shape
    C = C3 // 3
    has_mask = mask_d is not None
    Gc, n_inner, grid = _dense_grid(n_cells, mg, C3, has_mask, True)
    mask_arg = mask_d if has_mask else jnp.zeros((1, 1), qkv_d.dtype)
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads,
                               scale=scale, has_mask=has_mask,
                               chunks=_DENSE_CHUNKS)
    in_specs = _dense_specs(Gc, n_inner, C3, has_mask)
    in_specs.append(pl.BlockSpec(
        (Gc, R, C), lambda b, g: (b * n_inner + g, 0, 0),
        memory_space=pltpu.VMEM))
    n_blocks = n_cells // Gc
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((Gc, R, C3),
                         lambda b, g: (b * n_inner + g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, 98, 98),
                         lambda b, g: (b * n_inner + g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_cells, R, C3), qkv_d.dtype),
            jax.ShapeDtypeStruct((n_blocks, num_heads, 98, 98),
                                 jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qkv_d, bias2, mask_arg, do)
    return dqkv, dbias.sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_windows_dense(qkv_d, bias2, mask_d, num_heads, mg, scale,
                         interpret):
    return _run_fwd_dense(qkv_d, bias2, mask_d, num_heads, mg, scale,
                          interpret)


def _fwd_rule_dense(qkv_d, bias2, mask_d, num_heads, mg, scale,
                    interpret):
    out = _run_fwd_dense(qkv_d, bias2, mask_d, num_heads, mg, scale,
                         interpret)
    return out, (qkv_d, bias2, mask_d)


def _bwd_rule_dense(num_heads, mg, scale, interpret, res, do):
    qkv_d, bias2, mask_d = res
    dqkv, dbias = _run_bwd_dense(qkv_d, bias2, mask_d, do, num_heads,
                                 mg, scale, interpret)
    return dqkv, dbias.astype(bias2.dtype), None


_fused_windows_dense.defvjp(_fwd_rule_dense, _bwd_rule_dense)


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


def _pad2_bias(bias: jnp.ndarray, npad: int) -> jnp.ndarray:
    """[nH, N, N] -> padded pack-2 block-diagonal [nH, npad, npad]:
    window blocks at offsets 0 and N, -1e9 everywhere else INCLUDING the
    pad rows/columns. Pad keys are thus invisible to real queries (exp
    underflows to exactly 0 -> backward ds is exactly 0 there too); pad
    queries produce a harmless uniform row that the merge gather drops.
    Differentiable: the .at[].set VJP slices the diagonal blocks back
    onto the original table."""
    nH, N, _ = bias.shape
    out = jnp.full((nH, npad, npad), _PACK_NEG, bias.dtype)
    out = out.at[:, :N, :N].set(bias)
    out = out.at[:, N:2 * N, N:2 * N].set(bias)
    return out


def _pad2_mask(mask: jnp.ndarray, npad: int) -> jnp.ndarray:
    """[nW, N, N] -> [nW//2, npad, npad]; zeros at pads (the bias
    already carries their -1e9)."""
    nW, N, _ = mask.shape
    m = mask.reshape(nW // 2, 2, N, N)
    out = jnp.zeros((nW // 2, npad, npad), mask.dtype)
    out = out.at[:, :N, :N].set(m[:, 0])
    out = out.at[:, N:2 * N, N:2 * N].set(m[:, 1])
    return out


def fused_window_attention_padded(
    qkv_p: jnp.ndarray,
    num_heads: int,
    rel_bias: jnp.ndarray,
    num_pairs: int,
    shift_mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention core on PADDED pack-2 windowed qkv
    ``[B*npairs, NPAD, 3C]`` (two ws*ws windows at row offsets 0 and
    ws*ws, pads after — see ops/window.shift_window_partition_pad2).
    Because NPAD is sublane-aligned, the caller's reshapes from/to the
    flat ``[B, Lp, C]`` token stream are free; the MXU was already
    padding the 2*ws*ws rows to NPAD internally, so kernel time is
    unchanged (tools/pad_probe.py: bit-identical outputs, -3.4 ms/step
    at the flagship shapes). ``num_pairs`` is window PAIRS per image.
    Returns ``[B*npairs, NPAD, C]`` in the same padded order."""
    npad, C3 = qkv_p.shape[-2:]
    C = C3 // 3
    if scale is None:
        scale = (C // num_heads) ** -0.5
    bias_p = _pad2_bias(rel_bias, npad)
    mask_p = (_pad2_mask(shift_mask, npad) if shift_mask is not None
              else None)
    return _fused_windows(qkv_p, bias_p, mask_p, num_heads, num_pairs,
                          scale, interpret)


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
