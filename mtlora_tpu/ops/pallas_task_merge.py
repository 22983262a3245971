"""Fused factored-task PatchMerging: rank streams -> merge+LN+GEMM.

At every stage-final Swin block the MTLoRA task streams exist in
factored form (models/lora.py TaskStream + FactoredTasks):

    y_t = base + c1_t (.) (pre + s1_t * mid1_t^T B1_t)
               + c2_t (.) (p2  + s2_t * mid2_t^T B2_t)

and the only consumer is PatchMerging's 2x2-merge + LayerNorm + 4C->2C
reduction GEMM (the reference applies the shared downsample module to
every task stream, swin_transformer_mtlora.py:546-550).  Expanding the
streams to [T, B, L, C] just to feed them back into the merge kernel was
the single biggest traffic cluster left in the round-5 trace (~25 ms/
step: the [T, M, C] expansion write + task residual add, its backward
reduce_sum over T, a 308 MB cotangent layout copy feeding the d_mid
einsum, and 4/5 of the merge kernel + view-retile work).

This kernel consumes the FACTORED form directly and emits the merged
per-task outputs [T, B, L/4, O]; the [T, B, L, C] tensor never exists.

Key layout facts that make every in-kernel op Mosaic-legal:

* base/pre/p2 enter as the same free-after-retile ``[R, 2, Wh, 2C]``
  row-pair views the shared-stream merge kernel uses
  (ops/pallas_ln_lora.fused_merge_ln_linear); lanes are (dj, c).
* the rank activations enter PAIR-SPLIT: ``midP [T, 2(dj), S, Mp]`` with
  pair-token LANES (Mp = M/2 = R*2*Wh), so a block of th row-pairs is a
  contiguous lane range.  One transposing dot per task,
  ``midP[t].reshape(2S, N)^T @ Bblk[t] -> [N, 2C]`` with the
  BLOCK-DIAGONAL ``Bblk[t] = diag(s1 B1_t, s2 B2_t) x I_dj``, lands the
  rank update U directly in merged rows (th, di, Wh) x lanes (dj, c) —
  no in-kernel transpose, concat, or lane regroup.
* slicing ``di`` off rows (th, 2, Wh, ...) is sublane-tile aligned
  because Wh % 8 == 0 (the merge_ln_supported condition).
* the stochastic-depth coefficients fold in OUTSIDE the kernel for the
  rank terms (midP is pre-scaled; XLA owns that chain rule) and enter as
  a tiny per-row-pair table ``cR [T, 2, R]`` for the c1*pre / c2*p2
  shared terms.

The backward accumulates d_base over the task loop IN VMEM (one write
per block — this is what kills the [T, M, C] reduce_sum), mirrors the
shared merge kernel's LN backward per task, and emits d_midP / d_Bblk
via the same two dot forms transposed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtlora_tpu.ops.pallas_ln_lora import (
    _EPS,
    _VMEM_LIMIT,
    _merge_perm,
    _merge_prep,
    _prec,
)

# dot forms (lhs_contract, rhs_contract): see module note
_DN_TN = (((0,), (0,)), ((), ()))   # [K, N]^T @ [K, O] -> [N, O]
_DN_NN = (((1,), (0,)), ((), ()))   # [N, K]   @ [K, O] -> [N, O]
_DN_NT = (((1,), (1,)), ((), ()))   # [N, K]   @ [O, K]^T -> [N, O]


def _tm_fwd_kernel(b_ref, p_ref, q_ref, m_ref, bb_ref, c_ref, g_ref,
                   be_ref, w_ref, y_ref):
    cdt = b_ref.dtype
    th, _, Wh, C2 = b_ref.shape
    T = m_ref.shape[0]
    S = m_ref.shape[2]
    N = m_ref.shape[3]
    O = w_ref.shape[2]
    n = jnp.float32(2 * C2)

    b = b_ref[...]
    p = p_ref[...]
    q = q_ref[...]
    bf = [b[:, di].astype(jnp.float32) for di in (0, 1)]  # (th, Wh, C2)
    pf = [p[:, di].astype(jnp.float32) for di in (0, 1)]
    qf = [q[:, di].astype(jnp.float32) for di in (0, 1)]

    for t in range(T):
        lhs = m_ref[t].reshape(2 * S, N)
        U = jax.lax.dot_general(
            lhs, bb_ref[t], _DN_TN,
            preferred_element_type=jnp.float32,
            precision=_prec(cdt)).reshape(th, 2, Wh, C2)
        c1 = c_ref[:, 0:1, t:t + 1].astype(jnp.float32)  # (th, 1, 1)
        c2 = c_ref[:, 1:2, t:t + 1].astype(jnp.float32)
        y = [bf[di] + c1 * pf[di] + c2 * qf[di] + U[:, di]
             for di in (0, 1)]
        s1 = (jnp.sum(y[0], axis=-1, keepdims=True)
              + jnp.sum(y[1], axis=-1, keepdims=True))
        s2 = (jnp.sum(y[0] * y[0], axis=-1, keepdims=True)
              + jnp.sum(y[1] * y[1], axis=-1, keepdims=True))
        mu = s1 / n
        var = s2 / n - mu * mu
        inv = jax.lax.rsqrt(var + _EPS)
        acc = None
        for di in (0, 1):
            ln = ((y[di] - mu) * inv * g_ref[di].astype(jnp.float32)
                  + be_ref[di].astype(jnp.float32))
            d = jax.lax.dot_general(
                ln.reshape(th * Wh, C2).astype(cdt), w_ref[di], _DN_NN,
                preferred_element_type=jnp.float32, precision=_prec(cdt))
            acc = d if acc is None else acc + d
        y_ref[t] = acc.reshape(th, Wh, O).astype(y_ref.dtype)


def _tm_bwd_kernel(b_ref, p_ref, q_ref, m_ref, bb_ref, c_ref, g_ref,
                   be_ref, w_ref, gy_ref, db_ref, dp_ref, dq_ref,
                   dm_ref, dbb_ref, dg_ref, dbe_ref, dw_ref, *,
                   train_w):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dbb_ref[...] = jnp.zeros_like(dbb_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbe_ref[...] = jnp.zeros_like(dbe_ref)
        if train_w:
            dw_ref[...] = jnp.zeros_like(dw_ref)

    cdt = b_ref.dtype
    th, _, Wh, C2 = b_ref.shape
    T = m_ref.shape[0]
    S = m_ref.shape[2]
    N = m_ref.shape[3]
    n = jnp.float32(2 * C2)

    b = b_ref[...]
    p = p_ref[...]
    q = q_ref[...]
    bf = [b[:, di].astype(jnp.float32) for di in (0, 1)]
    pf = [p[:, di].astype(jnp.float32) for di in (0, 1)]
    qf = [q[:, di].astype(jnp.float32) for di in (0, 1)]
    dB_acc = [jnp.zeros((th, Wh, C2), jnp.float32) for _ in (0, 1)]
    dP_acc = [jnp.zeros((th, Wh, C2), jnp.float32) for _ in (0, 1)]
    dQ_acc = [jnp.zeros((th, Wh, C2), jnp.float32) for _ in (0, 1)]

    for t in range(T):
        lhs = m_ref[t].reshape(2 * S, N)
        U = jax.lax.dot_general(
            lhs, bb_ref[t], _DN_TN,
            preferred_element_type=jnp.float32,
            precision=_prec(cdt)).reshape(th, 2, Wh, C2)
        c1 = c_ref[:, 0:1, t:t + 1].astype(jnp.float32)  # (th, 1, 1)
        c2 = c_ref[:, 1:2, t:t + 1].astype(jnp.float32)
        y = [bf[di] + c1 * pf[di] + c2 * qf[di] + U[:, di]
             for di in (0, 1)]
        s1 = (jnp.sum(y[0], axis=-1, keepdims=True)
              + jnp.sum(y[1], axis=-1, keepdims=True))
        s2 = (jnp.sum(y[0] * y[0], axis=-1, keepdims=True)
              + jnp.sum(y[1] * y[1], axis=-1, keepdims=True))
        mu = s1 / n
        var = s2 / n - mu * mu
        inv = jax.lax.rsqrt(var + _EPS)

        g = gy_ref[t].reshape(th * Wh, -1).astype(cdt)
        xhat = []
        dxhat = []
        for di in (0, 1):
            xh = (y[di] - mu) * inv
            dln = jax.lax.dot_general(
                g, w_ref[di], _DN_NT,
                preferred_element_type=jnp.float32,
                precision=_prec(cdt)).reshape(th, Wh, C2)
            dg_ref[di, :] += jnp.sum(dln * xh, axis=(0, 1))
            dbe_ref[di, :] += jnp.sum(dln, axis=(0, 1))
            if train_w:
                ln = (xh * g_ref[di].astype(jnp.float32)
                      + be_ref[di].astype(jnp.float32))
                dw_ref[di] += jax.lax.dot_general(
                    ln.reshape(th * Wh, C2).astype(cdt), g,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_prec(cdt))
            xhat.append(xh)
            dxhat.append(dln * g_ref[di].astype(jnp.float32))
        m1 = (jnp.sum(dxhat[0], axis=-1, keepdims=True)
              + jnp.sum(dxhat[1], axis=-1, keepdims=True)) / n
        m2 = (jnp.sum(dxhat[0] * xhat[0], axis=-1, keepdims=True)
              + jnp.sum(dxhat[1] * xhat[1], axis=-1, keepdims=True)) / n
        dy = [inv * (dxhat[di] - m1 - xhat[di] * m2) for di in (0, 1)]
        for di in (0, 1):
            dB_acc[di] = dB_acc[di] + dy[di]
            dP_acc[di] = dP_acc[di] + c1 * dy[di]
            dQ_acc[di] = dQ_acc[di] + c2 * dy[di]
        # dU rows are (th, di, Wh) = the pair-token order of lhs columns
        dU = jnp.stack([dy[0], dy[1]], axis=1).reshape(N, C2).astype(cdt)
        dm_ref[t] = jax.lax.dot_general(
            bb_ref[t], dU, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_prec(cdt)).reshape(2, S, N).astype(dm_ref.dtype)
        dbb_ref[t] += jax.lax.dot_general(
            lhs, dU, _DN_NN,
            preferred_element_type=jnp.float32, precision=_prec(cdt))

    for di in (0, 1):
        db_ref[:, di] = dB_acc[di].astype(db_ref.dtype)
        dp_ref[:, di] = dP_acc[di].astype(dp_ref.dtype)
        dq_ref[:, di] = dQ_acc[di].astype(dq_ref.dtype)


def _tm_row_block(R: int, Wh: int, C2: int, itemsize: int) -> int:
    """Row-pairs per grid step: largest divisor of R whose per-stream
    block (th*2*Wh*C2 elems) stays under ~1.5 MB, preferring lane-tile
    aligned pair-token blocks (th*2*Wh % 128 == 0)."""
    cap = max(1, (3 << 19) // (2 * Wh * C2 * itemsize))
    best = 1
    best_aligned = None
    for d in range(1, min(R, cap) + 1):
        if R % d:
            continue
        best = d
        if (d * 2 * Wh) % 128 == 0:
            best_aligned = d
    return best_aligned if best_aligned is not None else best


def task_merge_supported(R: int, Wh: int, C: int, T: int,
                         S: int) -> bool:
    """Same shape condition as the shared merge kernel (Wh sublane-
    tileable) plus sane factored sizes."""
    return Wh % 8 == 0 and R > 0 and T > 0 and 0 < S <= 64


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def task_merge_ln_linear(base, pre, p2, midP, Bblk, cR, gamma, beta,
                         kernel, train_w=False, interpret=False):
    """Factored task streams -> PatchMerging merge+LN+GEMM, fused.

    base/pre/p2: [R, 2, Wh, 2C] row-pair views of the three shared
    [B, L, C] tensors (R = B*H/2, Wh = W/2; the same views
    fused_merge_ln_linear takes).  midP: [T, 2, S, Mp] pair-split rank
    activations (Mp = R*2*Wh), stochastic-depth coefficients already
    folded in.  Bblk: [T, 2S, 2C] block-diagonal per-task B matrices
    with the static scales folded in (see make_task_merge_operands).
    cR: [R, 2, T] float32 per-row-pair coefficients for the c1*pre /
    c2*p2 shared terms (ones in eval).  gamma/beta: [4C], kernel:
    [4C, O], reference concat channel order.  Returns [T, R, Wh, O].

    cR is treated as a constant (stochastic-depth masks carry no
    gradient); its cotangent is zero.
    """
    return _tm_run_fwd(base, pre, p2, midP, Bblk, cR, gamma, beta,
                       kernel, interpret)


def _tm_run_fwd(base, pre, p2, midP, Bblk, cR, gamma, beta, kernel,
                interpret):
    R, _, Wh, C2 = base.shape
    T, _, S, Mp = midP.shape
    O = kernel.shape[1]
    g2, b2, w2 = _merge_prep(gamma, beta, kernel)
    itemsize = 2 if base.dtype == jnp.bfloat16 else 4
    th = _tm_row_block(R, Wh, C2, itemsize)
    N = th * 2 * Wh
    y = pl.pallas_call(
        _tm_fwd_kernel, grid=(R // th,),
        in_specs=[
            pl.BlockSpec((th, 2, Wh, C2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, 2, Wh, C2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((th, 2, Wh, C2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2, S, N), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((th, 2, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, th, Wh, O), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, R, Wh, O), base.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(base, pre, p2, midP, Bblk, cR, g2, b2, w2)
    return y


def _tm_fwd_rule(base, pre, p2, midP, Bblk, cR, gamma, beta, kernel,
                 train_w, interpret):
    y = task_merge_ln_linear(base, pre, p2, midP, Bblk, cR, gamma,
                             beta, kernel, train_w, interpret)
    return y, (base, pre, p2, midP, Bblk, cR, gamma, beta, kernel)


def _tm_bwd_rule(train_w, interpret, res, gy):
    base, pre, p2, midP, Bblk, cR, gamma, beta, kernel = res
    R, _, Wh, C2 = base.shape
    T, _, S, Mp = midP.shape
    O = kernel.shape[1]
    C4 = 2 * C2
    g2, b2, w2 = _merge_prep(gamma, beta, kernel)
    itemsize = 2 if base.dtype == jnp.bfloat16 else 4
    th = _tm_row_block(R, Wh, C2, itemsize)
    N = th * 2 * Wh
    kern = functools.partial(_tm_bwd_kernel, train_w=train_w)
    xspec = pl.BlockSpec((th, 2, Wh, C2), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    db, dp, dq, dm, dbb, dg, dbe, dw = pl.pallas_call(
        kern, grid=(R // th,),
        in_specs=[
            xspec, xspec, xspec,
            pl.BlockSpec((T, 2, S, N), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((th, 2, T), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((T, th, Wh, O), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            xspec, xspec, xspec,
            pl.BlockSpec((T, 2, S, N), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 2 * S, C2), lambda i: (0, 0, 0),
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
            jax.ShapeDtypeStruct((R, 2, Wh, C2), base.dtype),
            jax.ShapeDtypeStruct((R, 2, Wh, C2), pre.dtype),
            jax.ShapeDtypeStruct((R, 2, Wh, C2), p2.dtype),
            jax.ShapeDtypeStruct((T, 2, S, Mp), midP.dtype),
            jax.ShapeDtypeStruct((T, 2 * S, C2), jnp.float32),
            jax.ShapeDtypeStruct((2, C2), jnp.float32),
            jax.ShapeDtypeStruct((2, C2), jnp.float32),
            jax.ShapeDtypeStruct((2, C2, O) if train_w else (1, 1, 1),
                                 jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(base, pre, p2, midP, Bblk, cR, g2, b2, w2, gy)
    _, iperm = _merge_perm(C4 // 4)
    iidx = jnp.asarray(iperm)
    dgamma = dg.reshape(C4)[iidx].astype(gamma.dtype)
    dbeta = dbe.reshape(C4)[iidx].astype(beta.dtype)
    if train_w:
        dW = dw.reshape(C4, O)[iidx].astype(kernel.dtype)
    else:
        dW = jnp.zeros_like(kernel)
    return (db, dp, dq, dm, dbb.astype(Bblk.dtype),
            jnp.zeros_like(cR), dgamma, dbeta, dW)


task_merge_ln_linear.defvjp(_tm_fwd_rule, _tm_bwd_rule)


# ---------------------------------------------------------------------
# operand preparation (differentiable XLA glue around the kernel)
# ---------------------------------------------------------------------

def _pair_split(midT: jnp.ndarray) -> jnp.ndarray:
    """[T, r, M] rank activations -> [T, 2(dj), r, Mp] pair-split
    (token = 2*pairtok + dj). Skinny retile + transpose; XLA fuses the
    coefficient scaling into this write."""
    T, r, M = midT.shape
    v = midT.reshape(T, r, M // 2, 2)
    return v.transpose(0, 3, 1, 2)


def make_task_merge_operands(stream, f2, coef2, H: int, W: int):
    """Build kernel operands from a TaskStream + the MLP FactoredTasks.

    stream: models/lora.py TaskStream (base/pre [B, L, C],
    midT [T, r1, M], B [T, r1, C], scales, coef [T, B, 1] or None).
    f2: FactoredTasks (pretrained [.., C], midT [T, r2, M],
    B [T, r2, C], scales).  coef2: [T, B, 1] or None.
    Returns (base_v, pre_v, p2_v, midP, Bblk, cR, T, S).
    """
    B_, L, C = stream.base.shape
    T, r1, M = stream.midT.shape
    r2 = f2.midT.shape[1]
    S = r1 + r2
    dt = stream.base.dtype
    R = B_ * H // 2
    Wh = W // 2

    base_v = stream.base.reshape(R, 2, Wh, 2 * C)
    pre_v = stream.pre.reshape(R, 2, Wh, 2 * C)
    p2_v = f2.pretrained.reshape(B_, L, C).reshape(R, 2, Wh, 2 * C)

    def _cM(coef):
        # [T, B, 1] -> [T, 1, M] per-token coefficient (fuses into the
        # _pair_split write)
        return jnp.repeat(coef.astype(dt), L, axis=1).reshape(T, 1, M)

    m1 = stream.midT if stream.coef is None else (
        stream.midT * _cM(stream.coef))
    m2 = f2.midT if coef2 is None else (f2.midT * _cM(coef2))
    midP = jnp.concatenate([_pair_split(m1), _pair_split(m2)], axis=2)

    s1 = jnp.asarray(stream.scales, jnp.float32).reshape(T, 1, 1)
    s2 = jnp.asarray(f2.scales, jnp.float32).reshape(T, 1, 1)
    B1s = (stream.B.astype(jnp.float32) * s1).astype(dt)
    B2s = (f2.B.astype(jnp.float32) * s2).astype(dt)
    Bcat = jnp.concatenate([B1s, B2s], axis=1)            # [T, S, C]
    Bblk = jnp.zeros((T, 2 * S, 2 * C), dt)
    Bblk = Bblk.at[:, :S, :C].set(Bcat)
    Bblk = Bblk.at[:, S:, C:].set(Bcat)

    ones = jnp.ones((T, B_), jnp.float32)
    c1 = ones if stream.coef is None else stream.coef.reshape(T, B_)
    c2 = ones if coef2 is None else coef2.reshape(T, B_)
    # [R, 2, T] so in-kernel per-task slices are (th, 1, 1) with no
    # layout move (rows pair with the x-view's row-pair blocks)
    cBT = jnp.stack([c1, c2], axis=1).astype(jnp.float32)  # [T, 2, B]
    cR = jnp.repeat(cBT.transpose(2, 1, 0), H // 2, axis=0)
    return base_v, pre_v, p2_v, midP, Bblk, cR, T, S


def task_merge_down(stream, f2, coef2, gamma, beta, kernel, H: int,
                    W: int, train_w: bool = False,
                    interpret: bool = False) -> jnp.ndarray:
    """Downsample the factored task streams: returns [T, B, L/4, O]
    matching PatchMerging._folded(expand_task_streams(...)) numerics."""
    base_v, pre_v, p2_v, midP, Bblk, cR, T, _ = (
        make_task_merge_operands(stream, f2, coef2, H, W))
    B_ = stream.base.shape[0]
    y = task_merge_ln_linear(base_v, pre_v, p2_v, midP, Bblk, cR,
                             gamma, beta, kernel, train_w, interpret)
    O = kernel.shape[1]
    return y.reshape(T, B_, (H // 2) * (W // 2), O)


def task_merge_reference(stream, f2, coef2, gamma, beta, kernel,
                         H: int, W: int) -> jnp.ndarray:
    """Pure-jnp oracle: expand the streams, then merge+LN+GEMM exactly
    like models/swin.py PatchMerging._folded's fallback math."""
    from mtlora_tpu.models.lora import expand_task_streams

    y = expand_task_streams(stream, f2, coef2)            # [T, B, L, C]
    T, B_, L, C = y.shape
    x = y.reshape(T * B_, H // 2, 2, W // 2, 2, C)
    cat = jnp.concatenate(
        [x[:, :, 0, :, 0], x[:, :, 1, :, 0],
         x[:, :, 0, :, 1], x[:, :, 1, :, 1]], axis=-1)    # k = di + 2dj
    f = cat.astype(jnp.float32)
    mu = f.mean(-1, keepdims=True)
    var = (f * f).mean(-1, keepdims=True) - mu * mu
    ln = ((f - mu) * jax.lax.rsqrt(var + _EPS)
          * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    out = ln.astype(y.dtype) @ kernel
    return out.reshape(T, B_, (H // 2) * (W // 2), -1).astype(y.dtype)
