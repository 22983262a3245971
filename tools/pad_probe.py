"""A/B probe: pad-104 windowed token layout vs the current N=49/98 one.

Hypothesis (from the round-5 trace): the `[B, L, C] -> [B*nW, 49, 3C]`
and pack-2 `[.., 98, ..]` boundary reshapes around the attention kernel
materialize as HBM repacks because 49/98 are not sublane (8) multiples,
and they are most of the 25.5 ms "layout (blocks)" bucket. Padding each
pack-2 instance to N=104 = 13*8 makes every boundary reshape a free
bitcast; the MXU already pads 98 -> 104 sublanes internally, so kernel
time should not move; the qkv GEMM pays +6% rows.

Pipeline per variant (stage shapes, fwd+bwd):
    take(partition) -> qkv GEMM -> [.., N, 3C] -> kernel -> merge take

Run: python tools/pad_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mtlora_tpu.ops import window as W
from mtlora_tpu.ops import pallas_window_attn as A
from mtlora_tpu.ops.window import _shift_partition_perm

B = 32
WS = 7
NPAD = 104  # 2*49 padded to the next multiple of 8

STAGES = {
    "s0": (112, 112, 96, 3),
    "s1": (56, 56, 192, 6),
    "s2": (28, 28, 384, 12),
}


# ---------------------------------------------------------------- padded perm
@functools.lru_cache(maxsize=None)
def _pad_perms(H, Wd, ws, shift):
    """(perm_pad [Lp], pos [L], pad_mask [Lp]) for the pack-2 padded
    windowed token order: pair i occupies slots [i*NPAD, i*NPAD+98),
    slots [i*NPAD+98, (i+1)*NPAD) are pads (source token 0, masked)."""
    perm, _ = _shift_partition_perm(H, Wd, ws, shift)
    nw = (H // ws) * (Wd // ws)
    npairs = nw // 2
    Lp = npairs * NPAD
    perm_pad = np.zeros(Lp, np.int32)
    pad_mask = np.zeros(Lp, np.bool_)
    pos = np.zeros(H * Wd, np.int32)
    n2 = 2 * ws * ws
    for i in range(npairs):
        src = perm[i * n2:(i + 1) * n2]
        perm_pad[i * NPAD:i * NPAD + n2] = src
        pad_mask[i * NPAD:i * NPAD + n2] = True
        pos[src] = i * NPAD + np.arange(n2)
    return perm_pad, pos, pad_mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def partition_pad(x2, H, Wd, ws, shift):
    perm_pad, _, _ = _pad_perms(H, Wd, ws, shift)
    return jnp.take(x2, jnp.asarray(perm_pad), axis=-2)


def _ppad_fwd(x2, H, Wd, ws, shift):
    return partition_pad(x2, H, Wd, ws, shift), None


def _ppad_bwd(H, Wd, ws, shift, _, g):
    # pad slots carry exactly-zero cotangents (masked keys, discarded
    # queries), so gathering only the real slots is the exact VJP
    _, pos, _ = _pad_perms(H, Wd, ws, shift)
    return (jnp.take(g, jnp.asarray(pos), axis=-2),)


partition_pad.defvjp(_ppad_fwd, _ppad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def merge_pad(xp, H, Wd, ws, shift):
    _, pos, _ = _pad_perms(H, Wd, ws, shift)
    return jnp.take(xp, jnp.asarray(pos), axis=-2)


def _mpad_fwd(xp, H, Wd, ws, shift):
    return merge_pad(xp, H, Wd, ws, shift), None


def _mpad_bwd(H, Wd, ws, shift, _, g):
    # d_xp[real slot] = g[token]; d_xp[pad slot] = 0 (the attention bwd
    # REQUIRES exact zeros: pad queries attend to real keys). The where
    # fuses into the gather.
    perm_pad, _, pad_mask = _pad_perms(H, Wd, ws, shift)
    gp = jnp.take(g, jnp.asarray(perm_pad), axis=-2)
    m = jnp.asarray(pad_mask)[(None,) * (g.ndim - 2) + (slice(None), None)]
    return (jnp.where(m, gp, jnp.zeros((), g.dtype)),)


merge_pad.defvjp(_mpad_fwd, _mpad_bwd)


def _pad_bias(bias):
    """[nH, 49, 49] -> [nH, 104, 104] block-diag at 0/49, -1e9 elsewhere
    (incl. pad rows/cols)."""
    nH, N, _ = bias.shape
    out = jnp.full((nH, NPAD, NPAD), A._PACK_NEG, bias.dtype)
    out = out.at[:, :N, :N].set(bias)
    out = out.at[:, N:2 * N, N:2 * N].set(bias)
    return out


def _pad_mask2(mask):
    """[nW, 49, 49] -> [nW//2, 104, 104] zeros at pads."""
    nW, N, _ = mask.shape
    m = mask.reshape(nW // 2, 2, N, N)
    out = jnp.zeros((nW // 2, NPAD, NPAD), mask.dtype)
    out = out.at[:, :N, :N].set(m[:, 0])
    out = out.at[:, N:2 * N, N:2 * N].set(m[:, 1])
    return out


# ---------------------------------------------------------------- pipelines
def sync(x):
    leaves = jax.tree.leaves(x)
    float(jax.device_get(jnp.sum(leaves[0].astype(jnp.float32))))


def bench(fn, args, warmup=3, iters=30):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def current_pipe(H, Wd, C, nH, shift, wqkv, bias, mask):
    nw = (H // ws_of(H)) * (Wd // ws_of(Wd))
    ws = ws_of(H)

    def f(x):  # [B, L, C]
        xw = W.shift_window_partition(
            x.reshape(B, H, Wd, C), ws, shift).reshape(B, H * Wd, C)
        qkv = xw @ wqkv  # [B, L, 3C]
        qkv_w = qkv.reshape(B * nw, ws * ws, 3 * C)
        out = A._maybe_packed(qkv_w, bias, mask, nH, nw, None
                              or (C // nH) ** -0.5, False)
        return W.window_merge_unshift(
            out.reshape(-1, ws, ws, C), ws, shift, H, Wd,
            (B,)).reshape(B, H * Wd, C)
    return f


def ws_of(H):
    return WS


def padded_pipe(H, Wd, C, nH, shift, wqkv, bias, mask):
    ws = ws_of(H)
    nw = (H // ws) * (Wd // ws)
    npairs = nw // 2
    bias2 = _pad_bias(bias)
    mask2 = _pad_mask2(mask) if mask is not None else None

    def f(x):
        x2 = x  # [B, L, C]
        xp = partition_pad(x2, H, Wd, ws, shift)  # [B, Lp, C]
        qkv = xp @ wqkv  # [B, Lp, 3C]
        qkv_w = qkv.reshape(B * npairs, NPAD, 3 * C)  # FREE (104 % 8 == 0)
        out = A._fused_windows(qkv_w, bias2, mask2, nH, npairs,
                               (C // nH) ** -0.5, False)
        outp = out.reshape(B, npairs * NPAD, C)  # FREE
        return merge_pad(outp, H, Wd, ws, shift)
    return f


def fwdbwd(f):
    def run(x):
        y, pull = jax.vjp(f, x)
        (gx,) = pull(jnp.ones_like(y))
        return y, gx
    return jax.jit(run)


def main():
    r = np.random.RandomState(0)
    from mtlora_tpu.ops.attention import shift_attention_mask
    for name, (H, Wd, C, nH) in STAGES.items():
        x = jnp.asarray(r.randn(B, H * Wd, C), jnp.bfloat16)
        wqkv = jnp.asarray(r.randn(C, 3 * C) * 0.05, jnp.bfloat16)
        bias = jnp.asarray(r.randn(nH, WS * WS, WS * WS) * 0.1,
                           jnp.bfloat16)
        for shift in (0, 3):
            mask = (jnp.asarray(
                shift_attention_mask(H, Wd, WS, shift), jnp.bfloat16)
                if shift else None)
            fc = fwdbwd(current_pipe(H, Wd, C, nH, shift, wqkv, bias,
                                     mask))
            fp = fwdbwd(padded_pipe(H, Wd, C, nH, shift, wqkv, bias,
                                    mask))
            # numeric check first (bf16 tolerance)
            yc, gc = fc(x)
            yp, gp = fp(x)
            err = float(jnp.max(jnp.abs(
                yc.astype(jnp.float32) - yp.astype(jnp.float32))))
            gerr = float(jnp.max(jnp.abs(
                gc.astype(jnp.float32) - gp.astype(jnp.float32))))
            tc = bench(fc, (x,))
            tp = bench(fp, (x,))
            print(f"{name} shift={shift} current {tc:7.3f} ms | "
                  f"pad104 {tp:7.3f} ms | err {err:.2e} gerr {gerr:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
