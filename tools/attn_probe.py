"""Decompose the fused window-attention kernel's time: variants of the
forward kernel with parts disabled, benchmarked at flagship packed
shapes. Not part of the library — a measurement tool.

  full     : dots + bias/mask + softmax (the real kernel body)
  nosmax   : dots only (bias added, softmax replaced by identity)
  nodots   : softmax on raw score-shaped slices (QK replaced by cheap
             broadcast), PV kept
  noconcat : full, but output written per-head into a [G,N,C]-strided
             ref slice instead of jnp.concatenate
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtlora_tpu.ops.attention import shift_attention_mask
from mtlora_tpu.ops.pallas_window_attn import (
    _maybe_packed, _pack2_bias, _pack2_mask, _group_size, _fwd_cap,
    _DN_QK, _DN_PV, _VMEM_LIMIT,
)


def _kern(qkv_ref, bias_ref, mask_ref, o_ref, *, num_heads, scale,
          has_mask, mode):
    x = qkv_ref[...]
    C = x.shape[-1] // 3
    hd = C // num_heads
    mask = mask_ref[0] if has_mask else None
    outs = []
    for h in range(num_heads):
        q = x[:, :, h * hd:(h + 1) * hd]
        k = x[:, :, C + h * hd:C + (h + 1) * hd]
        v = x[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        if mode == "nodots":
            s = (q[:, :, :1] + k[:, :, :1].transpose(0, 2, 1)).astype(
                jnp.float32) * jnp.ones((1, 1, x.shape[1]), jnp.float32)
        else:
            s = jax.lax.dot_general(q * scale, k, _DN_QK,
                                    preferred_element_type=jnp.float32)
        s = s + bias_ref[...][h][None].astype(jnp.float32)
        if mask is not None:
            s = s + mask.astype(jnp.float32)
        if mode == "nosmax":
            p = s
        else:
            p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(p.astype(v.dtype), v, _DN_PV,
                                preferred_element_type=jnp.float32)
        if mode == "noconcat":
            o_ref[:, :, h * hd:(h + 1) * hd] = o.astype(o_ref.dtype)
        else:
            outs.append(o)
    if mode != "noconcat":
        o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def run(qkv_w, bias, mask, num_heads, nw, scale, mode):
    Btot, N, C3 = qkv_w.shape
    C = C3 // 3
    G = _group_size(nw, _fwd_cap(N, C3, mask is not None, qkv_w.dtype))
    n_groups = nw // G
    has_mask = mask is not None
    mask_arg = (mask.reshape(n_groups, G, N, N) if has_mask
                else jnp.zeros((1, 1), qkv_w.dtype))
    kernel = functools.partial(_kern, num_heads=num_heads, scale=scale,
                               has_mask=has_mask, mode=mode)
    in_specs = [
        pl.BlockSpec((G, N, C3), lambda b, g: (b * n_groups + g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    if has_mask:
        in_specs.append(pl.BlockSpec((1, G, N, N),
                                     lambda b, g: (g, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    else:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel, grid=(Btot // nw, n_groups), in_specs=in_specs,
        out_specs=pl.BlockSpec((G, N, C),
                               lambda b, g: (b * n_groups + g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Btot, N, C), qkv_w.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT),
    )(qkv_w, bias, mask_arg)


def sync(x):
    float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def bench(fn, *args, warmup=3, iters=20):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


STAGES = [
    (112, 112, 96, 3),
    (56, 56, 192, 6),
    (28, 28, 384, 12),
    (14, 14, 768, 24),
]
B = 32
WS = 7


def main():
    rs = np.random.RandomState(0)
    for (H, W, C, nH) in STAGES:
        nw = (H // WS) * (W // WS)
        N = WS * WS
        qkv = jnp.asarray(rs.randn(B * nw, N, 3 * C) * 0.5, jnp.bfloat16)
        bias = jnp.asarray(rs.randn(nH, N, N) * 0.1, jnp.float32)
        mask = jnp.asarray(shift_attention_mask(H, W, WS, WS // 2),
                           jnp.float32)
        scale = (C // nH) ** -0.5
        # packed shapes (what production runs)
        qkv_p = qkv.reshape(B * nw // 2, 2 * N, 3 * C)
        bias_p = _pack2_bias(bias)
        mask_p = _pack2_mask(mask)
        for shifted in (False, True):
            m = mask_p if shifted else None
            row = [f"C={C:4d} nH={nH:2d} {'SW' if shifted else ' W'}"]
            for mode in ("full", "nosmax", "nodots", "noconcat"):
                f = jax.jit(functools.partial(
                    run, num_heads=nH, nw=max(1, nw // 2), scale=scale,
                    mode=mode))
                t = bench(f, qkv_p, bias_p, m)
                row.append(f"{mode} {t:6.2f}")
            print("  ".join(row))


if __name__ == "__main__":
    main()
