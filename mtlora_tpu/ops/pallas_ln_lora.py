"""Fused LayerNorm + frozen-linear + shared-LoRA Pallas kernel.

The two LN->GEMM prologues of every Swin block (norm1 -> qkv,
norm2 -> fc1) materialize the normalized activations in HBM purely to
feed the next GEMM and the shared-adapter branch; on the profiled
flagship step the surrounding fusions move ~5x the minimal bytes. This
kernel computes, entirely in VMEM per token block:

    ln = LayerNorm(x; gamma, beta)                  (fp32 statistics)
    p  = ln @ W + b                                  (frozen pretrained)
    y  = p + s * (dropout(ln) @ A) @ B               (shared LoRA branch)

returning y (and optionally p, which the factored task path of a stage
tail consumes). The backward kernel recomputes ln / the dropout mask
(same PRNG seed per grid cell) and produces dx via the standard
LayerNorm backward, with dgamma/dbeta/dA/dB accumulated across grid
steps in revisited output blocks. W and b are frozen (reference
mark_only_lora_as_trainable); their cotangents are zeros.

Dropout note: the in-kernel mask comes from the Mosaic PRNG
(pltpu.prng_random_bits) seeded per (layer, step, grid-cell), not from
jax.random.bernoulli — the DISTRIBUTION matches (keep prob 1-p, 1/(1-p)
scaling) but the stream differs from the unfused path. Deterministic
(eval / parity) execution is bit-comparable to the unfused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtlora_tpu.ops.pallas_adapter_mlp import (
    _INV_SQRT_2PI,
    _cdf,
    _gelu,
)

_EPS = 1e-5

# Scoped-VMEM ceiling for this kernel's compiles. The platform default
# (16 MB) rejects the full-featured backward (gy+gp+gd cotangents with
# the gelu recompute) at stage-3 fc1 shapes (~20-23 MB of stack); v5e
# has 128 MB of VMEM and the grid is coarse enough that raising the
# cap costs no overlap in practice (bench-verified).
_VMEM_LIMIT = 64 << 20


def _prec(dtype):
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


_DN_STD = (((1,), (0,)), ((), ()))   # [M,K] @ [K,N]
_DN_T0 = (((0,), (0,)), ((), ()))    # contract dim0 of both


def _layer_norm(x32, gamma, beta):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    inv = jax.lax.rsqrt(var + _EPS)
    xhat = (x32 - mu) * inv
    return xhat * gamma + beta, xhat, inv


def _drop_mask(shape, rate):
    """uint32 PRNG draw -> keep mask; caller seeds the PRNG."""
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(int(rate * (2 ** 32)))
    return (pltpu.bitcast(bits, jnp.uint32) >= threshold)


def _fwd_kernel(seed_ref, x_ref, g_ref, b_ref, w_ref, bias_ref, a_ref,
                brh_ref, y_ref, p_ref, d_ref, *, scale, drop, out_p,
                out_act, out_drop):
    cdt = x_ref.dtype
    x32 = x_ref[...].astype(jnp.float32)
    ln, _, _ = _layer_norm(x32, g_ref[...].astype(jnp.float32),
                           b_ref[...].astype(jnp.float32))
    lnc = ln.astype(cdt)
    p = jax.lax.dot_general(lnc, w_ref[...], _DN_STD,
                            preferred_element_type=jnp.float32,
                            precision=_prec(cdt))
    p = p + bias_ref[...].astype(jnp.float32)
    if scale != 0.0:
        if drop > 0.0:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            keep = _drop_mask(ln.shape, drop)
            lnd = jnp.where(keep, ln / (1.0 - drop), 0.0).astype(cdt)
        else:
            lnd = lnc
        m = jax.lax.dot_general(lnd, a_ref[...], _DN_STD,
                                preferred_element_type=jnp.float32,
                                precision=_prec(cdt))
        u = jax.lax.dot_general(m.astype(cdt), brh_ref[...], _DN_STD,
                                preferred_element_type=jnp.float32,
                                precision=_prec(cdt))
        y = p + scale * u
    else:
        # scale == 0 (static): the adapter contributes exactly zero —
        # skip its dots entirely. Besides the waste, Mosaic lowers the
        # rank-1 dummy-adapter dots (the folded-PatchMerging use) as a
        # dtype-changing vector.broadcast, which fails verification.
        y = p
    if out_act:
        # gelu fused into the output write: XLA cannot fuse elementwise
        # consumers into a pallas_call's output, so leaving gelu outside
        # costs a full extra read+write pass over [M, O]
        y = _gelu(y)
    y_ref[...] = y.astype(y_ref.dtype)
    if out_p:
        p_ref[...] = p.astype(p_ref.dtype)
    if out_drop:
        # second output: dropout(y) for the NEXT layer's shared-adapter
        # branch — the standalone where() pass over [M, O] that a
        # pallas output otherwise forces (cannot fuse consumers)
        pltpu.prng_seed(seed_ref[1] + pl.program_id(0))
        keep2 = _drop_mask(y.shape, drop)
        d_ref[...] = jnp.where(keep2, y / (1.0 - drop),
                               0.0).astype(d_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, g_ref, b_ref, w_ref, bias_ref, a_ref,
                brh_ref, gy_ref, gp_ref, gd_ref, dx_ref, dg_ref, db_ref,
                da_ref, dbr_ref, dw_ref, dbi_ref, *, scale, drop, has_gp,
                out_act, out_drop, train_w):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        da_ref[...] = jnp.zeros_like(da_ref)
        dbr_ref[...] = jnp.zeros_like(dbr_ref)
        if train_w:
            dw_ref[...] = jnp.zeros_like(dw_ref)
            dbi_ref[...] = jnp.zeros_like(dbi_ref)

    cdt = x_ref.dtype
    C = x_ref.shape[-1]
    x32 = x_ref[...].astype(jnp.float32)
    gamma = g_ref[...].astype(jnp.float32)
    ln, xhat, inv = _layer_norm(x32, gamma, b_ref[...].astype(jnp.float32))
    lnc = ln.astype(cdt)
    if scale != 0.0 and drop > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        keep = _drop_mask(ln.shape, drop)
        lnd = jnp.where(keep, ln / (1.0 - drop), 0.0).astype(cdt)
    else:
        keep = None
        lnd = lnc
    if scale != 0.0:
        m = jax.lax.dot_general(lnd, a_ref[...], _DN_STD,
                                preferred_element_type=jnp.float32,
                                precision=_prec(cdt)).astype(cdt)

    gy = gy_ref[...].astype(jnp.float32)  # [Mb, O] cotangent of y
    if out_drop:
        # the dropped second output d = dropout(y): its cotangent flows
        # into y through the recomputed keep mask (same seed stream)
        pltpu.prng_seed(seed_ref[1] + pl.program_id(0))
        keep2 = _drop_mask(gy.shape, drop)
        gy = gy + jnp.where(
            keep2, gd_ref[...].astype(jnp.float32) / (1.0 - drop), 0.0)
    if out_act:
        # recompute pre-activation y and fold dgelu into the cotangent
        z_pre = jax.lax.dot_general(lnc, w_ref[...], _DN_STD,
                                    preferred_element_type=jnp.float32,
                                    precision=_prec(cdt))
        z_pre = z_pre + bias_ref[...].astype(jnp.float32)
        if scale != 0.0:
            z_pre = z_pre + scale * jax.lax.dot_general(
                m, brh_ref[...], _DN_STD,
                preferred_element_type=jnp.float32, precision=_prec(cdt))
        dgelu = _cdf(z_pre) + z_pre * (
            jnp.exp(-0.5 * z_pre * z_pre) * _INV_SQRT_2PI)
        gy = gy * dgelu
    # pretrained-path cotangent: dp_total = gy (+ gp if p was an output)
    gp_total = gy
    if has_gp:
        gp_total = gp_total + gp_ref[...].astype(jnp.float32)
    if train_w:
        # trainable pretrained weight (the PatchMerging-reduction use):
        # dW += ln^T gp_total, db += sum gp_total, accumulated in
        # revisited output blocks
        dw_ref[...] += jax.lax.dot_general(
            lnc, gp_total.astype(cdt), _DN_T0,
            preferred_element_type=jnp.float32, precision=_prec(cdt))
        dbi_ref[...] += jnp.sum(gp_total, axis=0)[None]
    # pretrained path: dln = gp_total @ W^T
    dln = jax.lax.dot_general(
        gp_total.astype(cdt), w_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_prec(cdt))
    if scale != 0.0:
        # adapter chain: du = s*gy; dm = du @ B^T; dB += m^T @ du
        du = (scale * gy).astype(cdt)
        dm = jax.lax.dot_general(du, brh_ref[...],
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32,
                                 precision=_prec(cdt)).astype(cdt)  # [Mb,r]
        dbr_ref[...] += jax.lax.dot_general(
            m, du, _DN_T0, preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        da_ref[...] += jax.lax.dot_general(
            lnd, dm, _DN_T0, preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        # dlnd = dm @ A^T ; through dropout
        dlnd = jax.lax.dot_general(dm, a_ref[...],
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=_prec(cdt))
        if drop > 0.0:
            dln = dln + jnp.where(keep, dlnd / (1.0 - drop), 0.0)
        else:
            dln = dln + dlnd
    # LayerNorm backward
    dg_ref[...] += jnp.sum(dln * xhat, axis=0)[None]
    db_ref[...] += jnp.sum(dln, axis=0)[None]
    dxhat = dln * gamma
    dx = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _row_block(M, C, O):
    width = max(C, O)
    cap = max(128, ((1 << 20) // (4 * width)) // 128 * 128)
    if M <= cap:
        return M
    best = None
    d = 128
    while d <= cap:
        if M % d == 0:
            best = d
        d += 128
    return best  # None -> caller falls back to unfused


def ln_lora_supported(M: int, C: int, O: int) -> bool:
    return _row_block(M, C, O) is not None


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(8, 9, 10, 11, 12, 13, 14))
def fused_ln_lora_linear(x, gamma, beta, kernel, bias, A, B, seed,
                         scale, drop, out_p, out_act=False,
                         out_drop=False, train_w=False,
                         interpret=False):
    """x [M,C] -> y [M,O] (and PRE-activation p [M,O] when out_p, and
    d = dropout(y) when out_drop).

    y = LN(x)@W + b + scale * (dropout(LN(x)) @ A) @ B; ``out_act``
    applies exact-form gelu to y inside the kernel; ``out_drop``
    additionally emits dropout(y) (rate ``drop``, second PRNG stream)
    for the next layer's shared-adapter branch. W/b are frozen (zero
    cotangents) unless ``train_w``, which accumulates dW/db in-kernel
    (the trainable PatchMerging-reduction use).
    ``seed``: int32 [2] array (ignored when drop == 0).
    """
    y, p, d = _run_fwd(x, gamma, beta, kernel, bias, A, B, seed, scale,
                       drop, out_p, out_act, out_drop, interpret)
    outs = (y,)
    if out_p:
        outs = outs + (p,)
    if out_drop:
        outs = outs + (d,)
    return outs if len(outs) > 1 else y


def _run_fwd(x, gamma, beta, kernel, bias, A, B, seed, scale, drop,
             out_p, out_act, out_drop, interpret):
    M, C = x.shape
    O = kernel.shape[1]
    r = A.shape[1]
    Mb = _row_block(M, C, O)
    grid = (M // Mb,)
    kern = functools.partial(_fwd_kernel, scale=scale, drop=drop,
                             out_p=out_p, out_act=out_act,
                             out_drop=out_drop)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
        pl.BlockSpec((Mb, C), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),                    # x
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # gamma
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # beta
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # W
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # bias
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # A
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # B
    ]

    def _opt_spec(on):
        return (pl.BlockSpec((Mb, O), lambda i: (i, 0),
                             memory_space=pltpu.VMEM) if on
                else pl.BlockSpec((1, O), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))

    out_shape = (
        jax.ShapeDtypeStruct((M, O), x.dtype),
        jax.ShapeDtypeStruct((M, O) if out_p else (1, O), x.dtype),
        jax.ShapeDtypeStruct((M, O) if out_drop else (1, O), x.dtype),
    )
    y, p, d = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(_opt_spec(True), _opt_spec(out_p),
                   _opt_spec(out_drop)),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, x, gamma, beta, kernel, bias, A, B)
    return y, (p if out_p else None), (d if out_drop else None)


def _fwd_rule(x, gamma, beta, kernel, bias, A, B, seed, scale, drop,
              out_p, out_act, out_drop, train_w, interpret):
    out = fused_ln_lora_linear(x, gamma, beta, kernel, bias, A, B, seed,
                               scale, drop, out_p, out_act, out_drop,
                               train_w, interpret)
    return out, (x, gamma, beta, kernel, bias, A, B, seed)


def _bwd_rule(scale, drop, out_p, out_act, out_drop, train_w, interpret,
              res, g):
    x, gamma, beta, kernel, bias, A, B, seed = res
    if out_p or out_drop:
        parts = list(g)
        gy = parts.pop(0)
        gp = parts.pop(0) if out_p else None
        gd = parts.pop(0) if out_drop else None
    else:
        gy, gp, gd = g, None, None
    M, C = x.shape
    O = kernel.shape[1]
    r = A.shape[1]
    Mb = _row_block(M, C, O)
    kern = functools.partial(_bwd_kernel, scale=scale, drop=drop,
                             has_gp=gp is not None, out_act=out_act,
                             out_drop=gd is not None, train_w=train_w)
    gp_arg = gp if gp is not None else jnp.zeros((1, O), x.dtype)
    gd_arg = gd if gd is not None else jnp.zeros((1, O), x.dtype)

    def _opt_in(on):
        return (pl.BlockSpec((Mb, O), lambda i: (i, 0),
                             memory_space=pltpu.VMEM) if on
                else pl.BlockSpec((1, O), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM))

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # seed
        pl.BlockSpec((Mb, C), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),                    # x
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # gamma
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # beta
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # W
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # bias
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # A
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # B
        pl.BlockSpec((Mb, O), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),                    # gy
        _opt_in(gp is not None),                                  # gp
        _opt_in(gd is not None),                                  # gd
    ]
    dx, dg, db, da, dbr, dw, dbi = pl.pallas_call(
        kern, grid=(M // Mb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((Mb, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((C, O), lambda i: (0, 0),
                          memory_space=pltpu.VMEM) if train_w
             else pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)),
            pl.BlockSpec((1, O), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, r), jnp.float32),
            jax.ShapeDtypeStruct((r, O), jnp.float32),
            jax.ShapeDtypeStruct((C, O) if train_w else (1, 1),
                                 jnp.float32),
            jax.ShapeDtypeStruct((1, O), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(seed, x, gamma, beta, kernel, bias, A, B, gy, gp_arg, gd_arg)
    if train_w:
        dW = dw.astype(kernel.dtype)
        dbv = dbi[0].astype(kernel.dtype)
    else:
        dW = jnp.zeros_like(kernel)
        dbv = jnp.zeros((O,), kernel.dtype)
    return (dx, dg[0].astype(gamma.dtype), db[0].astype(beta.dtype),
            dW, dbv, da.astype(A.dtype), dbr.astype(B.dtype), None)


fused_ln_lora_linear.defvjp(_fwd_rule, _bwd_rule)


def ln_lora_reference(x, gamma, beta, kernel, bias, A, B, scale,
                      keep_mask=None, drop=0.0, act=False):
    """Pure-jnp reference (dropout via an explicit keep mask)."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = (x32 * x32).mean(-1, keepdims=True) - mu * mu
    ln = ((x32 - mu) * jax.lax.rsqrt(var + _EPS)
          * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    lnc = ln.astype(x.dtype)
    p = (lnc @ kernel).astype(jnp.float32) + bias.astype(jnp.float32)
    lnd = lnc if keep_mask is None else jnp.where(
        keep_mask, ln / (1.0 - drop), 0.0).astype(x.dtype)
    u = ((lnd @ A).astype(x.dtype) @ B).astype(jnp.float32)
    y = p + scale * u
    if act:
        y = jax.nn.gelu(y, approximate=False)
    return y.astype(x.dtype), p.astype(x.dtype)
