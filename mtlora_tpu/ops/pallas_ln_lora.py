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
    _gelu_fwd,
    _gelu_pair,
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
        y = _gelu_fwd(y, cdt == jnp.bfloat16)
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
        _, dgelu = _gelu_pair(z_pre, cdt == jnp.bfloat16)
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


# ---------------------------------------------------------------------------
# PatchMerging merge+LN+GEMM kernel: the 2x2 gather happens IN VMEM.
#
# The merge2x2_cat route (free reshapes around one 6-D transpose feeding
# fused_ln_lora_linear) still costs TWO full HBM copies each direction:
# the transpose itself plus the (.., 2, 2, C) -> (.., 4C) lane-merging
# reshape (~17.8 ms/step of "downsample glue" on the flagship trace).
# This kernel instead consumes the FREE row-major view
#
#     x [R, 2, Wh, 2C]   (R = prod(lead)*H/2; pure bitcast of [.., H*W, C])
#
# whose blocks are fully contiguous in HBM, and performs the phase split
# in VMEM: indexing di on dim 1 is free, and the lane dim already holds
# the (dj, c) channel pairs. The reference's concat channel order
# (k = di + 2*dj, swin_transformer_mtlora.py:451-455) is absorbed by
# statically permuting gamma/beta/W rows on the host side (ours:
# o = di*2C + dj*C + c), with the inverse permutation applied to their
# gradients — LN statistics are order-invariant and the GEMM is a sum
# over channels, so numerics are exactly the reference fold's.
# ---------------------------------------------------------------------------


def _merge_perm(C: int):
    """Reference 4C concat order -> this kernel's (di, dj, c) order."""
    import numpy as np

    di = np.arange(4 * C) // (2 * C)
    dj = (np.arange(4 * C) // C) % 2
    c = np.arange(4 * C) % C
    perm = (di + 2 * dj) * C + c
    return perm, np.argsort(perm)


def _merge_row_block(R, Wh, C4, O, itemsize):
    """Rows-of-row-pairs per grid step: largest divisor of R whose x
    block (th*Wh*C4 elems) fits ~4 MB (bwd also holds gy/dx blocks —
    covered by the 64 MB scoped-VMEM ceiling)."""
    cap = max(1, (4 << 20) // (Wh * C4 * itemsize))
    best = None
    for d in range(1, min(R, cap) + 1):
        if R % d == 0:
            best = d
    return best


def merge_ln_supported(R: int, Wh: int, C: int) -> bool:
    """True when the in-VMEM merge kernel handles this shape: Wh must be
    sublane-tileable (the in-kernel (th, Wh, 2C) -> (th*Wh, 2C) merge)."""
    return Wh % 8 == 0 and R > 0


def _merge_fwd_kernel(x_ref, g_ref, b_ref, w_ref, y_ref):
    cdt = x_ref.dtype
    th = x_ref.shape[0]
    Wh = x_ref.shape[2]
    C2 = x_ref.shape[3]
    n = jnp.float32(2 * C2)
    x = x_ref[...]
    x0 = x[:, 0].reshape(th * Wh, C2).astype(jnp.float32)
    x1 = x[:, 1].reshape(th * Wh, C2).astype(jnp.float32)
    s1 = (jnp.sum(x0, axis=-1, keepdims=True)
          + jnp.sum(x1, axis=-1, keepdims=True))
    s2 = (jnp.sum(x0 * x0, axis=-1, keepdims=True)
          + jnp.sum(x1 * x1, axis=-1, keepdims=True))
    mu = s1 / n
    var = s2 / n - mu * mu
    inv = jax.lax.rsqrt(var + _EPS)
    acc = None
    for di, xd in ((0, x0), (1, x1)):
        ln = ((xd - mu) * inv * g_ref[di].astype(jnp.float32)
              + b_ref[di].astype(jnp.float32))
        d = jax.lax.dot_general(ln.astype(cdt), w_ref[di], _DN_STD,
                                preferred_element_type=jnp.float32,
                                precision=_prec(cdt))
        acc = d if acc is None else acc + d
    y_ref[...] = acc.reshape(th, Wh, -1).astype(y_ref.dtype)


def _merge_bwd_kernel(x_ref, g_ref, b_ref, w_ref, gy_ref, dx_ref,
                      dg_ref, db_ref, dw_ref, *, train_w):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dg_ref[...] = jnp.zeros_like(dg_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        if train_w:
            dw_ref[...] = jnp.zeros_like(dw_ref)

    cdt = x_ref.dtype
    th = x_ref.shape[0]
    Wh = x_ref.shape[2]
    C2 = x_ref.shape[3]
    n = jnp.float32(2 * C2)
    x = x_ref[...]
    x0 = x[:, 0].reshape(th * Wh, C2).astype(jnp.float32)
    x1 = x[:, 1].reshape(th * Wh, C2).astype(jnp.float32)
    s1 = (jnp.sum(x0, axis=-1, keepdims=True)
          + jnp.sum(x1, axis=-1, keepdims=True))
    s2 = (jnp.sum(x0 * x0, axis=-1, keepdims=True)
          + jnp.sum(x1 * x1, axis=-1, keepdims=True))
    mu = s1 / n
    var = s2 / n - mu * mu
    inv = jax.lax.rsqrt(var + _EPS)
    gp = gy_ref[...].reshape(th * Wh, -1).astype(cdt)

    xhat = []
    dxhat = []
    for di, xd in ((0, x0), (1, x1)):
        xh = (xd - mu) * inv
        dln = jax.lax.dot_general(
            gp, w_ref[di], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        dg_ref[di, :] += jnp.sum(dln * xh, axis=0)
        db_ref[di, :] += jnp.sum(dln, axis=0)
        if train_w:
            ln = (xh * g_ref[di].astype(jnp.float32)
                  + b_ref[di].astype(jnp.float32))
            dw_ref[di] += jax.lax.dot_general(
                ln.astype(cdt), gp, _DN_T0,
                preferred_element_type=jnp.float32,
                precision=_prec(cdt))
        xhat.append(xh)
        dxhat.append(dln * g_ref[di].astype(jnp.float32))
    m1 = (jnp.sum(dxhat[0], axis=-1, keepdims=True)
          + jnp.sum(dxhat[1], axis=-1, keepdims=True)) / n
    m2 = (jnp.sum(dxhat[0] * xhat[0], axis=-1, keepdims=True)
          + jnp.sum(dxhat[1] * xhat[1], axis=-1, keepdims=True)) / n
    dx0 = inv * (dxhat[0] - m1 - xhat[0] * m2)
    dx1 = inv * (dxhat[1] - m1 - xhat[1] * m2)
    dx_ref[:, 0] = dx0.reshape(th, Wh, C2).astype(dx_ref.dtype)
    dx_ref[:, 1] = dx1.reshape(th, Wh, C2).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_merge_ln_linear(x, gamma, beta, kernel, train_w=False,
                          interpret=False):
    """PatchMerging 2x2-merge + LayerNorm + reduction GEMM, with the
    merge gather done in VMEM (see module note above).

    ``x``: [R, 2, Wh, 2C] — the FREE view of the [.., H, W, C] stream
    (R = lead*H/2). ``gamma``/``beta``: [4C], ``kernel``: [4C, O], both
    in the REFERENCE concat channel order (k = di + 2*dj). Returns
    y [R, Wh, O]; the caller reshapes to [.., (H/2)*(W/2), O] for free.
    ``train_w`` accumulates dW in-kernel (frozen reduction passes a
    stop_gradient kernel and leaves it False)."""
    return _merge_run_fwd(x, gamma, beta, kernel, interpret)


def _merge_prep(gamma, beta, kernel):
    C4 = gamma.shape[0]
    perm, _ = _merge_perm(C4 // 4)
    pidx = jnp.asarray(perm)
    g2 = gamma[pidx].reshape(2, C4 // 2)
    b2 = beta[pidx].reshape(2, C4 // 2)
    w2 = kernel[pidx].reshape(2, C4 // 2, kernel.shape[1])
    return g2, b2, w2


def _merge_run_fwd(x, gamma, beta, kernel, interpret):
    R, _, Wh, C2 = x.shape
    O = kernel.shape[1]
    g2, b2, w2 = _merge_prep(gamma, beta, kernel)
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    th = _merge_row_block(R, Wh, 2 * C2, O, itemsize)
    y = pl.pallas_call(
        _merge_fwd_kernel, grid=(R // th,),
        in_specs=[
            pl.BlockSpec((th, 2, Wh, C2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th, Wh, O), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Wh, O), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, g2, b2, w2)
    return y


def _merge_fwd_rule(x, gamma, beta, kernel, train_w, interpret):
    y = fused_merge_ln_linear(x, gamma, beta, kernel, train_w, interpret)
    return y, (x, gamma, beta, kernel)


def _merge_bwd_rule(train_w, interpret, res, gy):
    x, gamma, beta, kernel = res
    R, _, Wh, C2 = x.shape
    O = kernel.shape[1]
    C4 = 2 * C2
    g2, b2, w2 = _merge_prep(gamma, beta, kernel)
    itemsize = 2 if x.dtype == jnp.bfloat16 else 4
    th = _merge_row_block(R, Wh, C4, O, itemsize)
    kern = functools.partial(_merge_bwd_kernel, train_w=train_w)
    dx, dg, db, dw = pl.pallas_call(
        kern, grid=(R // th,),
        in_specs=[
            pl.BlockSpec((th, 2, Wh, C2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((th, Wh, O), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((th, 2, Wh, C2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, C2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((2, C2, O), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM) if train_w
             else pl.BlockSpec((1, 1, 1), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, 2, Wh, C2), x.dtype),
            jax.ShapeDtypeStruct((2, C2), jnp.float32),
            jax.ShapeDtypeStruct((2, C2), jnp.float32),
            jax.ShapeDtypeStruct((2, C2, O) if train_w else (1, 1, 1),
                                 jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, g2, b2, w2, gy)
    _, iperm = _merge_perm(C4 // 4)
    iidx = jnp.asarray(iperm)
    dgamma = dg.reshape(C4)[iidx].astype(gamma.dtype)
    dbeta = db.reshape(C4)[iidx].astype(beta.dtype)
    if train_w:
        dW = dw.reshape(C4, O)[iidx].astype(kernel.dtype)
    else:
        dW = jnp.zeros_like(kernel)
    return dx, dgamma, dbeta, dW


fused_merge_ln_linear.defvjp(_merge_fwd_rule, _merge_bwd_rule)


def merge_ln_reference(x, gamma, beta, kernel):
    """Pure-jnp reference for the merge kernel: x [R, 2, Wh, 2C] viewed
    back to spatial, 2x2-gathered in the reference channel order, then
    LN + GEMM (matches PatchMerging._folded numerics)."""
    R, _, Wh, C2 = x.shape
    C = C2 // 2
    xs = x.reshape(R, 2, Wh, 2, C)
    cat = jnp.concatenate(
        [xs[:, 0, :, 0], xs[:, 1, :, 0], xs[:, 0, :, 1], xs[:, 1, :, 1]],
        axis=-1)  # k = di + 2*dj
    f = cat.astype(jnp.float32)
    mu = f.mean(-1, keepdims=True)
    var = (f * f).mean(-1, keepdims=True) - mu * mu
    ln = ((f - mu) * jax.lax.rsqrt(var + _EPS)
          * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    y = ln.astype(x.dtype) @ kernel
    return y.astype(x.dtype)


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
