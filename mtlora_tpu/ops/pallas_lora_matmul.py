"""Fused LoRA matmul Pallas kernel (the north-star MTLoRA GEMM).

Computes ``y = x @ W (+ bias) + ((x_drop @ A) @ B) * scale`` in ONE
tiled-matmul kernel: the low-rank update is accumulated in a VMEM
scratch ``u = x_drop @ A`` alongside the main accumulator and folded
into the output tile on the last K step — the full-size adapter update
tensor never exists in HBM. With the frozen-backbone training setup
(MODEL.MTLORA.FREEZE_PRETRAINED) the backward pass reuses the SAME
kernel for ``dx = dy @ W^T + ((dy @ B^T) @ A^T) * scale`` (swap
W->W^T, A<->B^T), plus thin XLA GEMMs for dA/dB whose outputs are
rank-sized.

Shapes: x [M, K], W [K, N], A [K, r], B [r, N] -> y [M, N]; fp32
accumulation, any input dtype. Grid: (M/bm, N/bn, K/bk) with the K
dimension innermost ("arbitrary"), M/N parallel across megacores.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, xd_ref, w_ref, a_ref, b_ref, o_ref, acc_ref, u_ref,
            *, scale, nk):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        u_ref[...] = jnp.zeros_like(u_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    u_ref[...] += jax.lax.dot(
        xd_ref[...], a_ref[...], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _finish():
        upd = jax.lax.dot(u_ref[...].astype(b_ref.dtype), b_ref[...],
                          preferred_element_type=jnp.float32)
        o_ref[...] = (acc_ref[...] + upd * scale).astype(o_ref.dtype)


def _kernel_same(x_ref, w_ref, a_ref, b_ref, o_ref, acc_ref, u_ref,
                 *, scale, nk):
    """No-dropout variant: one x fetch feeds both accumulators."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        u_ref[...] = jnp.zeros_like(u_ref)

    x = x_ref[...]
    acc_ref[...] += jax.lax.dot(
        x, w_ref[...], preferred_element_type=jnp.float32)
    u_ref[...] += jax.lax.dot(
        x, a_ref[...], preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _finish():
        upd = jax.lax.dot(u_ref[...].astype(b_ref.dtype), b_ref[...],
                          preferred_element_type=jnp.float32)
        o_ref[...] = (acc_ref[...] + upd * scale).astype(o_ref.dtype)


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def lora_matmul_2d(x, x_drop, w, a, b, scale, *, bm=512, bn=512, bk=512,
                   interpret=False, same_input=False):
    """One fused pass over 2D operands (padding handled here)."""
    M, K = x.shape
    N = w.shape[1]
    r = a.shape[1]
    bm = min(bm, max(8, M))
    bn = min(bn, max(128, N))
    bk = min(bk, max(128, K))
    xp = _pad_to(_pad_to(x, bm, 0), bk, 1)
    wp = _pad_to(_pad_to(w, bk, 0), bn, 1)
    ap = _pad_to(a, bk, 0)
    bp = _pad_to(b, bn, 1)
    Mp, Kp = xp.shape
    Np = wp.shape[1]
    nk = Kp // bk
    x_spec = pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                          memory_space=pltpu.VMEM)
    common_specs = [
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bk, r), lambda i, j, k: (k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((r, bn), lambda i, j, k: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    if same_input:
        kernel = functools.partial(_kernel_same, scale=scale, nk=nk)
        in_specs = [x_spec] + common_specs
        args = (xp, wp, ap, bp)
    else:
        kernel = functools.partial(_kernel, scale=scale, nk=nk)
        xdp = _pad_to(_pad_to(x_drop, bm, 0), bk, 1)
        in_specs = [x_spec, x_spec] + common_specs
        args = (xp, xdp, wp, ap, bp)
    out = pl.pallas_call(
        kernel,
        grid=(Mp // bm, Np // bn, nk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bm, r), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*args)
    return out[:M, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def lora_matmul(x, x_drop, w, a, b, scale, same_input=True,
                interpret=False):
    """y = x @ w + ((x_drop @ a) @ b) * scale, fused; leading dims of x
    are flattened to M. Gradients flow to x/x_drop/a/b but NOT w (w is
    the frozen pretrained weight; reference models/lora.py:253-266 —
    use only under FREEZE_PRETRAINED). Pass ``same_input=True`` when
    x_drop IS x (no dropout): the backward then fuses
    ``dy @ w^T + ((dy @ b^T) @ a^T) * scale`` through this same kernel.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    y = lora_matmul_2d(x.reshape(-1, K), x_drop.reshape(-1, K), w, a, b,
                       scale, interpret=interpret, same_input=same_input)
    return y.reshape(*lead, w.shape[1])


def _fwd(x, x_drop, w, a, b, scale, same_input, interpret):
    return lora_matmul(x, x_drop, w, a, b, scale, same_input,
                       interpret), (x, x_drop, w, a, b)


def _bwd(scale, same_input, interpret, res, dy):
    x, x_drop, w, a, b = res
    lead = x.shape[:-1]
    K = x.shape[-1]
    N = w.shape[1]
    xd2 = x_drop.reshape(-1, K)
    dy2 = dy.reshape(-1, N)
    dy_cast = dy2.astype(x.dtype)
    du = jax.lax.dot(dy_cast, b.T.astype(dy_cast.dtype),
                     preferred_element_type=jnp.float32)  # [M, r]
    if same_input:
        # one fused kernel: dx_total = dy w^T + ((dy b^T) a^T) * scale
        dx = lora_matmul_2d(dy_cast, dy_cast, w.T,
                            b.T.astype(dy_cast.dtype),
                            a.T.astype(dy_cast.dtype), scale,
                            interpret=interpret, same_input=True)
        dx_drop = jnp.zeros_like(x)
        dx = dx.astype(x.dtype).reshape(*lead, K)
    else:
        dx = jax.lax.dot(dy_cast, w.T,
                         preferred_element_type=jnp.float32)
        dx = dx.astype(x.dtype).reshape(*lead, K)
        dx_drop = (jax.lax.dot(du.astype(a.dtype), a.T,
                               preferred_element_type=jnp.float32)
                   * scale).astype(x.dtype).reshape(*lead, K)
    u = jax.lax.dot(xd2, a.astype(xd2.dtype),
                    preferred_element_type=jnp.float32)  # [M, r]
    da = (jax.lax.dot(xd2.T, du.astype(xd2.dtype),
                      preferred_element_type=jnp.float32)
          * scale).astype(a.dtype)
    db = (jax.lax.dot(u.T.astype(dy_cast.dtype), dy_cast,
                      preferred_element_type=jnp.float32)
          * scale).astype(b.dtype)
    return (dx, dx_drop, jnp.zeros_like(w), da, db)


lora_matmul.defvjp(_fwd, _bwd)
