"""Fused LayerNorm + full MLP (fc1 -> gelu -> fc2, shared LoRA on both)
Pallas kernel for blocks WITHOUT task streams.

On the flagship trace the MLP hidden tensor ``[M, 4C]`` is the same
308 MB (bf16, batch 32 @ 448) at EVERY stage, and the split
LN-kernel + fc2 pipeline moves it ~6 times per block (fc1 y + dropped d
writes, fc2 read, fc2-bwd read, fc1-bwd gy + gd reads). Only the LAST
block of a stage produces task streams (which need the fc1 pre-activation
materialized for the per-task MLP-tail kernel,
ops/pallas_adapter_mlp.py); the other 8 of the flagship's 12 blocks can
run the whole prologue->MLP chain in VMEM:

    ln = LayerNorm(x; gamma, beta)                     (fp32 stats)
    h  = ln @ W1 + b1 + s1 * (drop1(ln) @ A1) @ B1     (frozen W1)
    g  = gelu(h)                                       (exact erf form)
    y  = g @ W2 + b2 + s2 * (drop2(g) @ A2) @ B2       (frozen W2)

so the hidden tensor NEVER touches HBM — per non-tail block that cuts
~1.8 GB of step traffic. The backward recomputes ln/h/g and the two
dropout masks (Mosaic PRNG, same per-grid-cell seeds) — recompute FLOPs
are ~free because the workload is HBM-bandwidth bound (PERF.md).
W1/b1/W2/b2 are frozen (reference mark_only_lora_as_trainable); their
cotangents are zeros. Trainables: gamma/beta, A1/B1, A2/B2, dx.

Reference semantics: Mlp (models/swin_transformer_mtlora.py:44-81) with
MODEL.DROP_RATE = 0 — the only active dropout is the MTLoRA adapter
dropout, applied to each layer's ADAPTER input only
(reference models/lora.py:258).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtlora_tpu.ops.pallas_adapter_mlp import _gelu_fwd, _gelu_pair
from mtlora_tpu.ops.pallas_ln_lora import (
    _VMEM_LIMIT,
    _DN_STD,
    _DN_T0,
    _drop_mask,
    _layer_norm,
    _prec,
    _row_block,
)

_DN_TLAST = (((1,), (1,)), ((), ()))   # [M,K] @ [N,K] -> [M,N]


def _fwd_kernel(seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, a1_ref,
                br1_ref, w2_ref, b2_ref, a2_ref, br2_ref, y_ref, *,
                s1, s2, drop):
    cdt = x_ref.dtype
    x32 = x_ref[...].astype(jnp.float32)
    ln, _, _ = _layer_norm(x32, g_ref[...].astype(jnp.float32),
                           b_ref[...].astype(jnp.float32))
    lnc = ln.astype(cdt)
    h = jax.lax.dot_general(lnc, w1_ref[...], _DN_STD,
                            preferred_element_type=jnp.float32,
                            precision=_prec(cdt))
    h = h + b1_ref[...].astype(jnp.float32)
    if s1 != 0.0:
        if drop > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            keep1 = _drop_mask(ln.shape, drop)
            lnd = jnp.where(keep1, ln / (1.0 - drop), 0.0).astype(cdt)
        else:
            lnd = lnc
        m1 = jax.lax.dot_general(lnd, a1_ref[...], _DN_STD,
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(cdt))
        u1 = jax.lax.dot_general(m1.astype(cdt), br1_ref[...], _DN_STD,
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(cdt))
        h = h + s1 * u1
    gl = _gelu_fwd(h, cdt == jnp.bfloat16)
    gc = gl.astype(cdt)
    y = jax.lax.dot_general(gc, w2_ref[...], _DN_STD,
                            preferred_element_type=jnp.float32,
                            precision=_prec(cdt))
    y = y + b2_ref[...].astype(jnp.float32)
    if s2 != 0.0:
        if drop > 0.0:
            pltpu.prng_seed(seed_ref[1] + pl.program_id(0))
            keep2 = _drop_mask(gl.shape, drop)
            gd = jnp.where(keep2, gl / (1.0 - drop), 0.0).astype(cdt)
        else:
            gd = gc
        m2 = jax.lax.dot_general(gd, a2_ref[...], _DN_STD,
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(cdt))
        u2 = jax.lax.dot_general(m2.astype(cdt), br2_ref[...], _DN_STD,
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(cdt))
        y = y + s2 * u2
    y_ref[...] = y.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, g_ref, b_ref, w1_ref, b1_ref, a1_ref,
                br1_ref, w2_ref, b2_ref, a2_ref, br2_ref, gy_ref,
                dx_ref, dg_ref, db_ref, da1_ref, dbr1_ref, da2_ref,
                dbr2_ref, *, s1, s2, drop):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        da1_ref[...] = jnp.zeros_like(da1_ref)
        dbr1_ref[...] = jnp.zeros_like(dbr1_ref)
        da2_ref[...] = jnp.zeros_like(da2_ref)
        dbr2_ref[...] = jnp.zeros_like(dbr2_ref)

    cdt = x_ref.dtype
    x32 = x_ref[...].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    ln, xhat, inv = _layer_norm(x32, gamma,
                                b_ref[...].astype(jnp.float32))
    lnc = ln.astype(cdt)
    # ---- recompute forward to g ------------------------------------
    h = jax.lax.dot_general(lnc, w1_ref[...], _DN_STD,
                            preferred_element_type=jnp.float32,
                            precision=_prec(cdt))
    h = h + b1_ref[...].astype(jnp.float32)
    keep1 = None
    lnd = lnc
    m1 = None
    if s1 != 0.0:
        if drop > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            keep1 = _drop_mask(ln.shape, drop)
            lnd = jnp.where(keep1, ln / (1.0 - drop), 0.0).astype(cdt)
        m1 = jax.lax.dot_general(lnd, a1_ref[...], _DN_STD,
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(cdt)).astype(cdt)
        h = h + s1 * jax.lax.dot_general(
            m1, br1_ref[...], _DN_STD,
            preferred_element_type=jnp.float32, precision=_prec(cdt))
    gl, dgelu = _gelu_pair(h, cdt == jnp.bfloat16)

    gy = gy_ref[...].astype(jnp.float32)
    # ---- fc2 backward ----------------------------------------------
    dg_full = jax.lax.dot_general(gy.astype(cdt), w2_ref[...], _DN_TLAST,
                                  preferred_element_type=jnp.float32,
                                  precision=_prec(cdt))
    if s2 != 0.0:
        if drop > 0.0:
            pltpu.prng_seed(seed_ref[1] + pl.program_id(0))
            keep2 = _drop_mask(gl.shape, drop)
            gd = jnp.where(keep2, gl / (1.0 - drop), 0.0).astype(cdt)
        else:
            keep2 = None
            gd = gl.astype(cdt)
        m2 = jax.lax.dot_general(gd, a2_ref[...], _DN_STD,
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(cdt)).astype(cdt)
        du2 = (s2 * gy).astype(cdt)
        dm2 = jax.lax.dot_general(du2, br2_ref[...], _DN_TLAST,
                                  preferred_element_type=jnp.float32,
                                  precision=_prec(cdt)).astype(cdt)
        dbr2_ref[...] += jax.lax.dot_general(
            m2, du2, _DN_T0, preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        da2_ref[...] += jax.lax.dot_general(
            gd, dm2, _DN_T0, preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        dgd = jax.lax.dot_general(dm2, a2_ref[...], _DN_TLAST,
                                  preferred_element_type=jnp.float32,
                                  precision=_prec(cdt))
        if drop > 0.0:
            dg_full = dg_full + jnp.where(keep2, dgd / (1.0 - drop), 0.0)
        else:
            dg_full = dg_full + dgd
    # ---- gelu backward (dgelu computed with gl above, one
    # transcendental shared) --------------------------------------
    dh = dg_full * dgelu
    # ---- fc1 backward ----------------------------------------------
    dln = jax.lax.dot_general(dh.astype(cdt), w1_ref[...], _DN_TLAST,
                              preferred_element_type=jnp.float32,
                              precision=_prec(cdt))
    if s1 != 0.0:
        du1 = (s1 * dh).astype(cdt)
        dm1 = jax.lax.dot_general(du1, br1_ref[...], _DN_TLAST,
                                  preferred_element_type=jnp.float32,
                                  precision=_prec(cdt)).astype(cdt)
        dbr1_ref[...] += jax.lax.dot_general(
            m1, du1, _DN_T0, preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        da1_ref[...] += jax.lax.dot_general(
            lnd, dm1, _DN_T0, preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        dlnd = jax.lax.dot_general(dm1, a1_ref[...], _DN_TLAST,
                                   preferred_element_type=jnp.float32,
                                   precision=_prec(cdt))
        if drop > 0.0:
            dln = dln + jnp.where(keep1, dlnd / (1.0 - drop), 0.0)
        else:
            dln = dln + dlnd
    # ---- LayerNorm backward -----------------------------------------
    dg_ref[...] += jnp.sum(dln * xhat, axis=0)[None]
    db_ref[...] += jnp.sum(dln, axis=0)[None]
    dxhat = dln * gamma
    dx = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx_ref[...] = dx.astype(dx_ref.dtype)


def ln_mlp_supported(M: int, C: int, H4: int) -> bool:
    return _row_block(M, C, H4) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14, 15))
def fused_ln_mlp(x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2, seed,
                 s1, s2, drop, interpret=False):
    """x [M, C] -> y [M, C] = fc2(gelu(fc1(LN(x)))) with shared-LoRA
    adapters on both fc layers (adapter-input dropout only, per the
    reference; the main GEMM inputs are never dropped because
    MODEL.DROP_RATE is 0 on every shipped config).

    ``seed``: int32 [2] (per-layer/step); ignored when drop == 0.
    ``s1``/``s2``: STATIC shared scales (0.0 skips that adapter chain
    entirely). W1/b1/W2/b2 receive zero cotangents (frozen).
    """
    return _run_fwd(x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2,
                    seed, s1, s2, drop, interpret)


def _common_specs(Mb, C):
    return [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
        pl.BlockSpec((Mb, C), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),                    # x
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # gamma
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # beta
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # W1
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # b1
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # A1
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # B1
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # W2
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # b2
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # A2
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # B2
    ]


def _run_fwd(x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2, seed,
             s1, s2, drop, interpret):
    M, C = x.shape
    H4 = w1.shape[1]
    Mb = _row_block(M, C, H4)
    kern = functools.partial(_fwd_kernel, s1=s1, s2=s2, drop=drop)
    return pl.pallas_call(
        kern, grid=(M // Mb,),
        in_specs=_common_specs(Mb, C),
        out_specs=pl.BlockSpec((Mb, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2)


def _fwd_rule(x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2, seed,
              s1, s2, drop, interpret):
    y = fused_ln_mlp(x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2,
                     seed, s1, s2, drop, interpret)
    return y, (x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2, seed)


def _bwd_rule(s1, s2, drop, interpret, res, gy):
    x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2, seed = res
    M, C = x.shape
    H4 = w1.shape[1]
    r1 = a1.shape[1]
    r2 = a2.shape[1]
    Mb = _row_block(M, C, H4)
    kern = functools.partial(_bwd_kernel, s1=s1, s2=s2, drop=drop)
    in_specs = _common_specs(Mb, C)
    in_specs.append(pl.BlockSpec((Mb, C), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))          # gy

    def _acc(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    dx, dg, db, da1, dbr1, da2, dbr2 = pl.pallas_call(
        kern, grid=(M // Mb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((Mb, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _acc((1, C)), _acc((1, C)),
            _acc((C, r1)), _acc((r1, H4)),
            _acc((H4, r2)), _acc((r2, C)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, r1), jnp.float32),
            jax.ShapeDtypeStruct((r1, H4), jnp.float32),
            jax.ShapeDtypeStruct((H4, r2), jnp.float32),
            jax.ShapeDtypeStruct((r2, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2, gy)
    return (dx, dg[0].astype(gamma.dtype), db[0].astype(beta.dtype),
            jnp.zeros_like(w1), jnp.zeros_like(b1),
            da1.astype(a1.dtype), dbr1.astype(br1.dtype),
            jnp.zeros_like(w2), jnp.zeros_like(b2),
            da2.astype(a2.dtype), dbr2.astype(br2.dtype), None)


fused_ln_mlp.defvjp(_fwd_rule, _bwd_rule)


def ln_mlp_reference(x, gamma, beta, w1, b1, a1, br1, w2, b2, a2, br2,
                     s1, s2, keep1=None, keep2=None, drop=0.0):
    """Pure-jnp reference (dropout via explicit keep masks)."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = (x32 * x32).mean(-1, keepdims=True) - mu * mu
    ln = ((x32 - mu) * jax.lax.rsqrt(var + 1e-5)
          * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    lnc = ln.astype(x.dtype)
    h = (lnc @ w1).astype(jnp.float32) + b1.astype(jnp.float32)
    if s1 != 0.0:
        lnd = lnc if keep1 is None else jnp.where(
            keep1, ln / (1.0 - drop), 0.0).astype(x.dtype)
        h = h + s1 * ((lnd @ a1).astype(x.dtype) @ br1).astype(
            jnp.float32)
    gl = jax.nn.gelu(h, approximate=False)
    gc = gl.astype(x.dtype)
    y = (gc @ w2).astype(jnp.float32) + b2.astype(jnp.float32)
    if s2 != 0.0:
        gd = gc if keep2 is None else jnp.where(
            keep2, gl / (1.0 - drop), 0.0).astype(x.dtype)
        y = y + s2 * ((gd @ a2).astype(x.dtype) @ br2).astype(
            jnp.float32)
    return y.astype(x.dtype)
