"""Fused HRNet decode-head Pallas kernel: expand -> BN -> ReLU -> pred.

The default HighResolutionHead (reference models/seg_hrnet.py:498-526)
is, per task, two 1x1 convs around a BatchNorm+ReLU:

    h = x @ Wе + bе          # [M, C] -> [M, 4C]   (C=270, 4C=1080)
    z = relu(h * mul + add)  # BN folded to an affine given (mu, var)
    y = z @ Wp + bp          # [M, 4C] -> [M, n]

On the flagship trace the four heads cost ~20 ms/step, dominated by the
[M, 4C] hidden (217 MB bf16 at 448/batch-32) round-tripping HBM between
the two GEMMs plus the BN passes over it. This kernel runs the whole
chain per row-block in VMEM so the hidden never materializes.

BatchNorm's batch statistics couple all rows, which normally forces the
hidden to exist before the affine is known. But h is LINEAR in x, so
its batch moments are exact quadratic forms in the input moments:

    E[h]   = E[x] @ We + be
    E[h^2] = diag(We^T S We) + 2 be * (E[x] @ We) + be^2,   S = E[x x^T]

`bn_stats_from_x` computes (mu, var) this way from one [C, C] covariance
GEMM over x (reads x once; never touches h). It is plain differentiable
jnp, so the BN-training gradient through mu/var flows through the
covariance path automatically, while the row-wise chain runs through the
custom-VJP fused kernel. Statistics are computed from the UNROUNDED
(fp32-accumulated) h rather than the bf16-rounded hidden the unfused
module path reduces — a O(eps/sqrt(M)) difference, far below bf16
round-off of the normalized output (tolerance-tested).

All seven operands are trainable (decoder heads train under MTLoRA —
reference mark_only_lora_as_trainable leaves decoders trainable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtlora_tpu.ops.pallas_ln_lora import (
    _VMEM_LIMIT,
    _DN_STD,
    _DN_T0,
    _prec,
)

_DN_TLAST = (((1,), (1,)), ((), ()))   # [M,K] @ [N,K] -> [M,N]


def _head_row_block(M: int, hidden: int) -> int | None:
    """Largest divisor of M that is a lane-multiple and keeps the
    fp32 hidden block + backward scratch comfortably inside VMEM."""
    cap = max(128, ((4 << 20) // (4 * hidden)) // 128 * 128)
    if M <= cap and M % 8 == 0:
        return M
    best = None
    d = 128
    while d <= cap:
        if M % d == 0:
            best = d
        d += 128
    return best


def head_mlp_supported(M: int, cin: int, n_out: int) -> bool:
    return _head_row_block(M, 4 * cin) is not None


def bn_stats_from_x(x, ek, eb):
    """Exact batch moments of h = x @ ek + eb without forming h.

    x [M, C] (compute dtype), ek [C, O] (compute dtype), eb [O] fp32.
    Returns (mu [O], var [O]) fp32, biased variance —
    nn.BatchNorm semantics (flax and torch both use biased batch var).
    """
    M = x.shape[0]
    s = jax.lax.dot_general(x, x, _DN_T0,
                            preferred_element_type=jnp.float32) / M
    mx = jnp.mean(x.astype(jnp.float32), axis=0)
    ekf = ek.astype(jnp.float32)
    ebf = eb.astype(jnp.float32)
    mxe = mx @ ekf
    mu = mxe + ebf
    sw = s @ ekf
    e2 = jnp.sum(ekf * sw, axis=0) + 2.0 * ebf * mxe + ebf * ebf
    # cancellation guard: E[h^2] - E[h]^2 can go epsilon-negative in
    # fp32 exactly as in the materialized-h form; BN adds eps anyway
    var = jnp.maximum(e2 - mu * mu, 0.0)
    return mu, var


def _fwd_kernel(x_ref, ek_ref, eb_ref, mul_ref, add_ref, pk_ref, pb_ref,
                y_ref):
    cdt = x_ref.dtype
    h = jax.lax.dot_general(x_ref[...], ek_ref[...], _DN_STD,
                            preferred_element_type=jnp.float32,
                            precision=_prec(cdt))
    hc = (h + eb_ref[...].astype(jnp.float32)).astype(cdt)
    zpre = hc * mul_ref[...].astype(cdt) + add_ref[...].astype(cdt)
    z = jnp.maximum(zpre, jnp.zeros_like(zpre))
    y = jax.lax.dot_general(z, pk_ref[...], _DN_STD,
                            preferred_element_type=jnp.float32,
                            precision=_prec(cdt))
    y_ref[...] = (y + pb_ref[...].astype(jnp.float32)).astype(y_ref.dtype)


def _bwd_kernel(x_ref, ek_ref, eb_ref, mul_ref, add_ref, pk_ref,
                gy_ref, dx_ref, dek_ref, deb_ref, dmul_ref, dadd_ref,
                dpk_ref, dpb_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dek_ref[...] = jnp.zeros_like(dek_ref)
        deb_ref[...] = jnp.zeros_like(deb_ref)
        dmul_ref[...] = jnp.zeros_like(dmul_ref)
        dadd_ref[...] = jnp.zeros_like(dadd_ref)
        dpk_ref[...] = jnp.zeros_like(dpk_ref)
        dpb_ref[...] = jnp.zeros_like(dpb_ref)

    cdt = x_ref.dtype
    mul = mul_ref[...].astype(jnp.float32)
    # ---- recompute forward to z -------------------------------------
    h = jax.lax.dot_general(x_ref[...], ek_ref[...], _DN_STD,
                            preferred_element_type=jnp.float32,
                            precision=_prec(cdt))
    hc = (h + eb_ref[...].astype(jnp.float32)).astype(cdt)
    zpre = hc * mul.astype(cdt) + add_ref[...].astype(cdt)
    z = jnp.maximum(zpre, jnp.zeros_like(zpre))

    gy = gy_ref[...].astype(jnp.float32)
    gyc = gy.astype(cdt)
    # ---- pred backward ----------------------------------------------
    dpb_ref[...] += jnp.sum(gy, axis=0)[None]
    dpk_ref[...] += jax.lax.dot_general(
        z, gyc, _DN_T0, preferred_element_type=jnp.float32,
        precision=_prec(cdt))
    dz = jax.lax.dot_general(gyc, pk_ref[...], _DN_TLAST,
                             preferred_element_type=jnp.float32,
                             precision=_prec(cdt))
    # ---- relu + BN-affine backward ----------------------------------
    # (mask compare in fp32 — Mosaic/v5e rejects bf16 compares)
    dzp = jnp.where(zpre.astype(jnp.float32) > 0, dz, 0.0)
    dadd_ref[...] += jnp.sum(dzp, axis=0)[None]
    dmul_ref[...] += jnp.sum(dzp * hc.astype(jnp.float32), axis=0)[None]
    dh = dzp * mul
    # ---- expand backward --------------------------------------------
    deb_ref[...] += jnp.sum(dh, axis=0)[None]
    dhc = dh.astype(cdt)
    dek_ref[...] += jax.lax.dot_general(
        x_ref[...], dhc, _DN_T0, preferred_element_type=jnp.float32,
        precision=_prec(cdt))
    dx = jax.lax.dot_general(dhc, ek_ref[...], _DN_TLAST,
                             preferred_element_type=jnp.float32,
                             precision=_prec(cdt))
    dx_ref[...] = dx.astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_head_mlp(x, ek, eb, mul, add, pk, pb, interpret=False):
    """x [M, C] -> y [M, n] = relu((x @ ek + eb) * mul + add) @ pk + pb.

    ``mul``/``add`` are the BN affine folded from (mu, var, scale, bias)
    — compute them outside (differentiably, e.g. via
    :func:`bn_stats_from_x` in training) so the gradient through the
    batch statistics composes with this kernel's row-wise VJP.
    """
    return _run_fwd(x, ek, eb, mul, add, pk, pb, interpret)


def _specs(Mb, C):
    return [
        pl.BlockSpec((Mb, C), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),                    # x
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # ek
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # eb
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # mul
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # add
        pl.BlockSpec(memory_space=pltpu.VMEM),                    # pk
    ]


def _run_fwd(x, ek, eb, mul, add, pk, pb, interpret):
    M, C = x.shape
    O = ek.shape[1]
    n = pk.shape[1]
    Mb = _head_row_block(M, O)
    return pl.pallas_call(
        _fwd_kernel, grid=(M // Mb,),
        in_specs=_specs(Mb, C) + [pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Mb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, ek, eb, mul, add, pk, pb)


def _fwd_rule(x, ek, eb, mul, add, pk, pb, interpret):
    y = fused_head_mlp(x, ek, eb, mul, add, pk, pb, interpret)
    return y, (x, ek, eb, mul, add, pk, pb)


def _bwd_rule(interpret, res, gy):
    x, ek, eb, mul, add, pk, pb = res
    M, C = x.shape
    O = ek.shape[1]
    n = pk.shape[1]
    Mb = _head_row_block(M, O)

    def _acc(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    in_specs = _specs(Mb, C)
    in_specs.append(pl.BlockSpec((Mb, n), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))          # gy
    dx, dek, deb, dmul, dadd, dpk, dpb = pl.pallas_call(
        _bwd_kernel, grid=(M // Mb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((Mb, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            _acc((C, O)), _acc((1, O)), _acc((1, O)), _acc((1, O)),
            _acc((O, n)), _acc((1, n)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, C), x.dtype),
            jax.ShapeDtypeStruct((C, O), jnp.float32),
            jax.ShapeDtypeStruct((1, O), jnp.float32),
            jax.ShapeDtypeStruct((1, O), jnp.float32),
            jax.ShapeDtypeStruct((1, O), jnp.float32),
            jax.ShapeDtypeStruct((O, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, ek, eb, mul, add, pk, gy)
    # eb/mul/add/pb travel as [1, O]/[1, n] rows — cotangents match
    return (dx, dek.astype(ek.dtype), deb.astype(eb.dtype),
            dmul.astype(mul.dtype), dadd.astype(add.dtype),
            dpk.astype(pk.dtype), dpb.astype(pb.dtype))


fused_head_mlp.defvjp(_fwd_rule, _bwd_rule)


def head_mlp_reference(x, ek, eb, mul, add, pk, pb):
    """Pure-jnp mirror of the kernel (same cast points)."""
    cdt = x.dtype
    h = jax.lax.dot_general(x, ek, _DN_STD,
                            preferred_element_type=jnp.float32)
    hc = (h + eb.astype(jnp.float32)).astype(cdt)
    zpre = hc * mul.astype(cdt) + add.astype(cdt)
    z = jnp.maximum(zpre, jnp.zeros_like(zpre))
    y = jax.lax.dot_general(z, pk, _DN_STD,
                            preferred_element_type=jnp.float32)
    return (y + pb.astype(jnp.float32)).astype(cdt)
