"""Fused MTLoRA adapter MLP-tail Pallas kernel.

The per-task MLP branch in a Swin stage tail computes, per task t
(reference models/lora.py:259-265 'matrix' mode + Mlp threading at
models/swin_transformer_mtlora.py:68-81):

    h_t    = gelu(p1 + s1_t * (x_t @ A1_t) @ B1_t)     # fc1 task hidden
    mid2_t = h_t @ A2_t                                # fc2 task A-proj

where p1 is fc1's frozen output on the SHARED stream (the frozen GEMM is
never applied to task streams) and r = rank(A) is tiny (flagship r=4).
Materializing h_t is the single largest HBM-traffic term of the whole
training step: at 448 input, stage 0's task hidden is [T=4, B=32,
L=12544, 4C=384] = 1.2 GB, and the profiled XLA chain (B1-einsum ->
add+gelu -> A2-einsum, fwd+bwd) spends ~55 ms/step on it.

This kernel keeps h_t entirely in VMEM: the grid walks row-blocks of the
flattened token axis M; each cell loads one [Mb, H4] block of p1 plus the
tiny rank-side tensors, and loops the T tasks unrolled. Only rank-sized
[T, r, M] tensors cross HBM. The backward kernel recomputes h_t in VMEM
from the same inputs (no residuals) and accumulates dB1/dA2 across grid
steps in revisited output blocks.

Layout note: all rank-sized tensors travel TRANSPOSED as [T, r, M] /
[T, r, H4] so the tiny rank dim sits on (padded) sublanes and the lane
dim stays dense; every contraction is expressed with explicit
dot_general dimension numbers so no in-kernel transposes are needed.

Equivalent CUDA in the reference: none — the reference materializes the
dict-of-task tensors (models/lora.py:262-265); this fusion is the
"north-star" MTLoRA kernel from SURVEY.md section 2.3, fused across the
whole fc1->gelu->fc2 adapter chain rather than a single GEMM.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _erf(x):
    """erf from Mosaic-supported primitives (the erf primitive has no
    Pallas TPU lowering): Abramowitz & Stegun 7.1.26 rational
    approximation, max abs error 1.5e-7 — fp32-grade. The divide uses
    the VPU's approximate reciprocal refined by one Newton step
    (doubles the mantissa accuracy back to ~fp32; the full divide was
    measured ~20% of the whole forward kernel)."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    w = 1.0 + 0.3275911 * a
    try:
        t = pl.reciprocal(w, approx=True)
        t = t * (2.0 - w * t)  # Newton refinement
    except Exception:  # pragma: no cover - non-pallas trace context
        t = 1.0 / w
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _cdf(z):
    """Standard normal CDF from _erf."""
    return 0.5 * (1.0 + _erf(z * _SQRT_HALF))


def _gelu(z):
    """Exact-form (erf) gelu, matching jax.nn.gelu(approximate=False)."""
    return z * _cdf(z)


# bf16 fast path: the tanh-approximation gelu,
#   gelu(z) ~= 0.5 z (1 + tanh(c z + c d z^3)),
# c = sqrt(2/pi), d = 0.044715. Max |err| vs exact-erf gelu is 4.7e-4 —
# an order of magnitude below bf16 round-off of O(1) activations.
# fp32 kernels keep the exact erf form so fp32 parity suites are
# unaffected. History: round 4 replaced the A&S erf polynomial with the
# algebraically-identical sigmoid form z*sigmoid(2w) (exp + approximate
# reciprocal); round 5 measured the literal jnp.tanh form ~20% faster
# on the stage-0 adapter-tail kernel (tools/tail_mb_probe.py: fwd
# 4.02 -> 3.28 ms, bwd 8.76 -> 7.98 ms) — Mosaic's native tanh beats
# the exp+reciprocal pair. tanh also saturates cleanly, so the overflow
# clamps the sigmoid form needed are gone: at |z| > ~6, th == +-1 in
# fp32 and the derivative's (1 - th^2) * O(z^3) term is exactly 0.
_GELU_C = 0.7978845608028654
_GELU_D = 0.044715


def _gelu_fwd(z, cheap: bool):
    if not cheap:
        return _gelu(z)
    th = jnp.tanh(z * (_GELU_C + (_GELU_C * _GELU_D) * (z * z)))
    return 0.5 * z * (1.0 + th)


def _gelu_pair(z, cheap: bool):
    """(gelu(z), gelu'(z)) sharing one transcendental evaluation."""
    if not cheap:
        cdf = _cdf(z)
        return z * cdf, cdf + z * (jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI)
    z2 = z * z
    th = jnp.tanh(z * (_GELU_C + (_GELU_C * _GELU_D) * z2))
    h = 0.5 * z * (1.0 + th)
    dg = (0.5 * (1.0 + th)
          + 0.5 * z * (1.0 - th * th) * (_GELU_C + (3.0 * _GELU_C
                                                    * _GELU_D) * z2))
    return h, dg


def _prec(dtype):
    # fp32 operands: force multi-pass fp32 MXU (Mosaic defaults to one
    # bf16 pass); bf16 inputs keep the fast path
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)


# dot_general dimension numbers (lhs/rhs contraction dims, no batch):
_DN_00 = (((0,), (0,)), ((), ()))
_DN_11 = (((1,), (1,)), ((), ()))
_DN_10 = (((1,), (0,)), ((), ()))


def _fwd_kernel(mid1_ref, p1_ref, b1_ref, a2_ref, out_ref, *, scales):
    T = mid1_ref.shape[0]
    cdt = mid1_ref.dtype
    p1 = p1_ref[...].astype(jnp.float32)  # [Mb, H4]
    for t in range(T):
        # u [Mb, H4] = mid1_t^T @ B1_t   (contract rank dim)
        u = jax.lax.dot_general(mid1_ref[t], b1_ref[t], _DN_00,
                                preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        h = _gelu_fwd(p1 + scales[t] * u, cdt == jnp.bfloat16)
        # mid2_t [r2, Mb] = A2T_t @ h^T  (contract H4)
        out_ref[t] = jax.lax.dot_general(
            a2_ref[t], h.astype(cdt), _DN_11,
            preferred_element_type=jnp.float32,
            precision=_prec(cdt)).astype(out_ref.dtype)


def _bwd_kernel(mid1_ref, p1_ref, b1_ref, a2_ref, g_ref,
                dmid1_ref, dp1_ref, db1_ref, da2_ref, *, scales):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        db1_ref[...] = jnp.zeros_like(db1_ref)
        da2_ref[...] = jnp.zeros_like(da2_ref)

    T = mid1_ref.shape[0]
    cdt = mid1_ref.dtype
    p1 = p1_ref[...].astype(jnp.float32)
    dp1 = jnp.zeros_like(p1)
    for t in range(T):
        u = jax.lax.dot_general(mid1_ref[t], b1_ref[t], _DN_00,
                                preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        z = p1 + scales[t] * u
        # h and dgelu share one transcendental evaluation
        h32, dgelu = _gelu_pair(z, cdt == jnp.bfloat16)
        h = h32.astype(cdt)
        g = g_ref[t]  # [r2, Mb]
        # dh [Mb, H4] = g^T @ A2T_t  (contract r2)
        dh = jax.lax.dot_general(g, a2_ref[t], _DN_00,
                                 preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        dz = (dh * dgelu).astype(cdt)
        dp1 = dp1 + dz
        # dmid1_t [r1, Mb] = s * B1_t @ dz^T  (contract H4)
        dmid1_ref[t] = (scales[t] * jax.lax.dot_general(
            b1_ref[t], dz, _DN_11,
            preferred_element_type=jnp.float32,
            precision=_prec(cdt))).astype(dmid1_ref.dtype)
        # dB1_t [r1, H4] += s * mid1_t @ dz  (contract Mb)
        db1_ref[t] += scales[t] * jax.lax.dot_general(
            mid1_ref[t], dz, _DN_10, preferred_element_type=jnp.float32,
            precision=_prec(cdt))
        # dA2T_t [r2, H4] += g @ h  (contract Mb)
        da2_ref[t] += jax.lax.dot_general(
            g, h, _DN_10, preferred_element_type=jnp.float32,
            precision=_prec(cdt))
    dp1_ref[...] = dp1.astype(dp1_ref.dtype)


def _plan(M: int, H4: int):
    """Choose the token block Mb (and a padded M if needed).

    Mosaic requires non-full blocks to be multiples of 128 on the last
    dim (mid1T/out blocks put tokens on lanes), so Mb must be a
    multiple-of-128 divisor of M under a ~2 MB fp32 [Mb, H4] VMEM
    budget. Small M runs as a single grid cell; otherwise, when M has no
    suitable divisor (e.g. M = 16*196 at stage 3), the caller pads the
    token axis to the next multiple of 128 — padded rows contribute
    zeros through the kernel and are sliced away.

    Returns (Mb, M_padded).
    """
    cap = max(128, ((2 << 20) // (4 * H4)) // 128 * 128)
    if M <= cap:
        return M, M
    best = None
    d = 128
    while d <= cap:
        if M % d == 0:
            best = d
        d += 128
    if best is not None:
        return best, M
    M2 = -(-M // 128) * 128
    d, best = 128, 128
    while d <= cap:
        if M2 % d == 0:
            best = d
        d += 128
    return best, M2


def _pad_tokens(arr, M2: int, axis: int):
    M = arr.shape[axis]
    if M == M2:
        return arr
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, M2 - M)
    return jnp.pad(arr, pad)


def _common_specs(T, r1, Mb, H4):
    return [
        pl.BlockSpec((T, r1, Mb), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),          # mid1T
        pl.BlockSpec((Mb, H4), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),          # p1
        pl.BlockSpec(memory_space=pltpu.VMEM),          # b1 (full)
        pl.BlockSpec(memory_space=pltpu.VMEM),          # a2T (full)
    ]


def _run_fwd(mid1T, p1, b1, a2T, scales, interpret):
    T, r1, M = mid1T.shape
    H4 = p1.shape[-1]
    r2 = a2T.shape[1]
    Mb, M2 = _plan(M, H4)
    mid1T = _pad_tokens(mid1T, M2, 2)
    p1 = _pad_tokens(p1, M2, 0)
    kernel = functools.partial(_fwd_kernel, scales=scales)
    out = pl.pallas_call(
        kernel,
        grid=(M2 // Mb,),
        in_specs=_common_specs(T, r1, Mb, H4),
        out_specs=pl.BlockSpec((T, r2, Mb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, r2, M2), mid1T.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(mid1T, p1, b1, a2T)
    return out[:, :, :M]


def _run_bwd(mid1T, p1, b1, a2T, g, scales, interpret):
    T, r1, M = mid1T.shape
    H4 = p1.shape[-1]
    r2 = a2T.shape[1]
    Mb, M2 = _plan(M, H4)
    mid1T = _pad_tokens(mid1T, M2, 2)
    p1 = _pad_tokens(p1, M2, 0)
    g = _pad_tokens(g, M2, 2)  # zero cotangents -> zero contributions
    kernel = functools.partial(_bwd_kernel, scales=scales)
    in_specs = _common_specs(T, r1, Mb, H4)
    in_specs.append(pl.BlockSpec((T, r2, Mb), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM))  # g
    dmid1T, dp1, db1, da2T = pl.pallas_call(
        kernel,
        grid=(M2 // Mb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((T, r1, Mb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mb, H4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, r1, H4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # db1: accumulated
            pl.BlockSpec((T, r2, H4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),   # da2T: accumulated
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, r1, M2), mid1T.dtype),
            jax.ShapeDtypeStruct((M2, H4), p1.dtype),
            jax.ShapeDtypeStruct((T, r1, H4), jnp.float32),
            jax.ShapeDtypeStruct((T, r2, H4), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),  # accumulating outputs
        interpret=interpret,
    )(mid1T, p1, b1, a2T, g)
    return dmid1T[:, :, :M], dp1[:M], db1, da2T


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_adapter_mid(mid1T, p1, b1, a2T, scales, interpret=False):
    """Per-task fc1-hidden -> fc2-A projection without materializing h_t.

    Args:
      mid1T:  [T, r1, M]   task A1-projections (x_t @ A1_t, transposed).
      p1:     [M, H4]      fc1 frozen (pretrained) output, pre-activation.
      b1:     [T, r1, H4]  fc1 task B matrices.
      a2T:    [T, r2, H4]  fc2 task A matrices, transposed (rank first).
      scales: static per-task fc1 scales s1_t.
    Returns:
      mid2T:  [T, r2, M] = gelu(p1 + s1_t * mid1T_t^T B1_t) @ A2_t, transposed.
    """
    return _run_fwd(mid1T, p1, b1, a2T, scales, interpret)


def _fwd_rule(mid1T, p1, b1, a2T, scales, interpret):
    out = _run_fwd(mid1T, p1, b1, a2T, scales, interpret)
    return out, (mid1T, p1, b1, a2T)


def _bwd_rule(scales, interpret, res, g):
    mid1T, p1, b1, a2T = res
    dmid1T, dp1, db1, da2T = _run_bwd(mid1T, p1, b1, a2T, g, scales,
                                      interpret)
    return dmid1T, dp1, db1.astype(b1.dtype), da2T.astype(a2T.dtype)


fused_adapter_mid.defvjp(_fwd_rule, _bwd_rule)


def adapter_mid_reference(mid1T, p1, b1, a2T,
                          scales: Tuple[float, ...]) -> jnp.ndarray:
    """Pure-jnp reference of fused_adapter_mid (materializes h_t)."""
    s = jnp.asarray(scales, jnp.float32).reshape(-1, 1, 1)
    u = jnp.einsum("trm,trh->tmh", mid1T, b1,
                   preferred_element_type=jnp.float32)
    z = p1[None].astype(jnp.float32) + s * u
    h = jax.nn.gelu(z, approximate=False).astype(mid1T.dtype)
    return jnp.einsum("tmh,trh->trm", h, a2T,
                      preferred_element_type=jnp.float32
                      ).astype(mid1T.dtype)
