"""Fused shifted-window attention Pallas kernel.

TPU-native successor of the reference's fused CUDA window-process kernel
(kernels/window_process/swin_window_process_kernel.cu) — but fusing much
more: one kernel performs window partition + scaled QK^T + relative
position bias + shift mask + softmax + AV + window merge entirely in
VMEM, for a row-band of windows per grid cell. The windowed copies of
qkv, the [nW*B, nH, 49, 49] score tensor, and the windowed attention
output never touch HBM — the op reads the token-layout qkv map once and
writes the token-layout output once. Since the Swin workload is
HBM-bandwidth bound (measured; SURVEY.md section 6 rebuild protocol),
this is the speed-of-light formulation: window size 49 makes whole
windows VMEM-resident, so no online-softmax tiling is needed.

The backward pass is a second Pallas kernel over the same grid that
recomputes the (tiny) per-window softmax in VMEM from the saved qkv
input and emits dqkv plus per-band bias-gradient partials.

The cyclic shift itself stays outside as jnp.roll (one fused XLA copy;
its traffic is already minimal) — the kernel consumes the pre-rolled
map, mirroring WindowProcess.apply's contract (.cu:42-67).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _band_windows(band, ws: int, c: int):
    """[ws, W, c] row band -> [nW, ws*ws, c] windows."""
    W = band.shape[1]
    nw = W // ws
    x = band.reshape(ws, nw, ws, c)
    x = x.transpose(1, 0, 2, 3)
    return x.reshape(nw, ws * ws, c)


def _windows_band(win, ws: int, c: int):
    """[nW, ws*ws, c] windows -> [ws, W, c] row band."""
    nw = win.shape[0]
    x = win.reshape(nw, ws, ws, c)
    x = x.transpose(1, 0, 2, 3)
    return x.reshape(ws, nw * ws, c)


# NOTE: Mosaic's tpu.matmul supports at most ONE batch dimension, so all
# dot_generals below fold (nW, nH) into a single leading batch axis.


def _attn_core(qkv_band, bias, mask, *, num_heads, ws, scale):
    """Shared fwd math on one row band (runs inside the kernel).

    Returns p [nW*nH, N, N] fp32, v [nW*nH, N, hd]."""
    C3 = qkv_band.shape[-1]
    C = C3 // 3
    hd = C // num_heads
    N = ws * ws
    x = _band_windows(qkv_band, ws, C3)  # [nW, N, 3C]
    nw = x.shape[0]

    def heads(t):  # [nW, N, C] -> [nW*nH, N, hd]
        return t.reshape(nw, N, num_heads, hd).transpose(
            0, 2, 1, 3).reshape(nw * num_heads, N, hd)

    q = heads(x[:, :, :C])
    k = heads(x[:, :, C:2 * C])
    v = heads(x[:, :, 2 * C:])
    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [nW*nH, N, N]
    s = s.reshape(nw, num_heads, N, N)
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        s = s + mask[:, None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).reshape(nw * num_heads, N, N)
    return p, v


def _fwd_kernel(qkv_ref, bias_ref, mask_ref, o_ref, *, num_heads, ws,
                scale, has_mask):
    band = qkv_ref[0]
    C = band.shape[-1] // 3
    hd = C // num_heads
    N = ws * ws
    mask = mask_ref[0] if has_mask else None
    p, v = _attn_core(band, bias_ref[...], mask,
                      num_heads=num_heads, ws=ws, scale=scale)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
    )  # [nW*nH, N, hd]
    nw = o.shape[0] // num_heads
    o = o.reshape(nw, num_heads, N, hd).transpose(0, 2, 1, 3)
    o = o.reshape(nw, N, C)
    o_ref[0] = _windows_band(o, ws, C).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, bias_ref, mask_ref, do_ref,
                dqkv_ref, dbias_ref, *, num_heads, ws, scale, has_mask):
    band = qkv_ref[0]
    C = band.shape[-1] // 3
    hd = C // num_heads
    N = ws * ws
    mask = mask_ref[0] if has_mask else None
    p, v = _attn_core(band, bias_ref[...], mask,
                      num_heads=num_heads, ws=ws, scale=scale)
    x = _band_windows(band, ws, 3 * C)
    nw = x.shape[0]

    def heads(t):  # [nW, N, C] -> [nW*nH, N, hd]
        return t.reshape(nw, N, num_heads, hd).transpose(
            0, 2, 1, 3).reshape(nw * num_heads, N, hd)

    q = heads(x[:, :, :C])
    k = heads(x[:, :, C:2 * C])
    do32 = heads(_band_windows(do_ref[0], ws, C)).astype(jnp.float32)
    # dv = p^T @ do
    dv = jax.lax.dot_general(
        p, do32, dimension_numbers=(((1,), (1,)), ((0,), (0,))))
    # dp = do @ v^T
    dp = jax.lax.dot_general(
        do32, v.astype(jnp.float32),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))))  # [nW*nH, N, N]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dbias_ref[0, 0] = jnp.sum(
        ds.reshape(nw, num_heads, N, N), axis=0).astype(dbias_ref.dtype)
    # dq = ds @ k * scale ; dk = ds^T @ (q*scale)
    dq = jax.lax.dot_general(
        ds, k.astype(jnp.float32),
        dimension_numbers=(((2,), (1,)), ((0,), (0,)))) * scale
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32) * scale,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))))

    def tok(t):  # [nW*nH, N, hd] -> [nW, N, C]
        return t.reshape(nw, num_heads, N, hd).transpose(
            0, 2, 1, 3).reshape(nw, N, C)

    dqkv = jnp.concatenate([tok(dq), tok(dk), tok(dv)], axis=-1)
    dqkv_ref[0] = _windows_band(dqkv, ws, 3 * C).astype(dqkv_ref.dtype)


def _run_fwd(qkv_map, bias, mask, num_heads, ws, scale, interpret):
    B, H, W, C3 = qkv_map.shape
    C = C3 // 3
    has_mask = mask is not None
    nbh = H // ws
    args = [qkv_map, bias]
    in_specs = [
        pl.BlockSpec((1, ws, W, C3), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if has_mask:
        nww = W // ws
        N = ws * ws
        mask_r = mask.reshape(nbh, nww, N, N)
        args.append(mask_r)
        in_specs.append(pl.BlockSpec(
            (1, nww, N, N), lambda b, i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM))
    else:
        args.append(jnp.zeros((1, 1), qkv_map.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    kernel = functools.partial(_fwd_kernel, num_heads=num_heads, ws=ws,
                               scale=scale, has_mask=has_mask)
    return pl.pallas_call(
        kernel,
        grid=(B, nbh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, ws, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), qkv_map.dtype),
        interpret=interpret,
    )(*args)


def _run_bwd(qkv_map, bias, mask, do, num_heads, ws, scale, interpret):
    B, H, W, C3 = qkv_map.shape
    C = C3 // 3
    N = ws * ws
    has_mask = mask is not None
    nbh = H // ws
    args = [qkv_map, bias]
    in_specs = [
        pl.BlockSpec((1, ws, W, C3), lambda b, i: (b, i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if has_mask:
        nww = W // ws
        mask_r = mask.reshape(nbh, nww, N, N)
        args.append(mask_r)
        in_specs.append(pl.BlockSpec(
            (1, nww, N, N), lambda b, i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM))
    else:
        args.append(jnp.zeros((1, 1), qkv_map.dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    args.append(do)
    in_specs.append(pl.BlockSpec((1, ws, W, C), lambda b, i: (b, i, 0, 0),
                                 memory_space=pltpu.VMEM))
    kernel = functools.partial(_bwd_kernel, num_heads=num_heads, ws=ws,
                               scale=scale, has_mask=has_mask)
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=(B, nbh),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, ws, W, C3), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_heads, N, N),
                         lambda b, i: (b, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, W, C3), qkv_map.dtype),
            jax.ShapeDtypeStruct((B, nbh, num_heads, N, N), jnp.float32),
        ),
        interpret=interpret,
    )(*args)
    return dqkv, dbias.sum(axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_window_attention(qkv_map, bias, mask, num_heads, ws, scale,
                            interpret):
    return _run_fwd(qkv_map, bias, mask, num_heads, ws, scale, interpret)


def _fwd_rule(qkv_map, bias, mask, num_heads, ws, scale, interpret):
    out = _run_fwd(qkv_map, bias, mask, num_heads, ws, scale, interpret)
    return out, (qkv_map, bias, mask)


def _bwd_rule(num_heads, ws, scale, interpret, res, do):
    qkv_map, bias, mask = res
    dqkv, dbias = _run_bwd(qkv_map, bias, mask, do, num_heads, ws, scale,
                           interpret)
    return dqkv, dbias.astype(bias.dtype), None


_fused_window_attention.defvjp(_fwd_rule, _bwd_rule)


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
    C = qkv_map.shape[-1] // 3
    if scale is None:
        scale = (C // num_heads) ** -0.5
    if shift:
        qkv_map = jnp.roll(qkv_map, (-shift, -shift), (1, 2))
    out = _fused_window_attention(qkv_map, rel_bias, shift_mask,
                                  num_heads, window_size, scale, interpret)
    if shift:
        out = jnp.roll(out, (shift, shift), (1, 2))
    return out
