"""Window partition / reverse and fused cyclic-shift variants.

TPU-native rebuild of the reference's window ops
(``models/swin_transformer_mtlora.py:84-116`` pure-torch path and the
fused CUDA kernel ``kernels/window_process/swin_window_process_kernel.cu``).

On TPU the partition/reverse are pure layout transforms; XLA fuses the
roll+reshape+transpose chain into the surrounding kernels, so the jnp
forms below ARE the fast path (verified by benchmark; the CUDA kernel's
reason to exist — avoiding a materialized ``torch.roll`` — does not apply
under XLA fusion). Shapes are static; everything is jit-safe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """[..., H, W, C] -> [... * nH*nW, ws, ws, C] window tiles.

    Matches reference ``window_partition`` (swin_transformer_mtlora.py:84):
    windows ordered row-major over (H/ws, W/ws) per batch element.
    Leading dims beyond (H, W, C) are treated as batch.
    """
    *lead, H, W, C = x.shape
    ws = window_size
    x = x.reshape(*lead, H // ws, ws, W // ws, ws, C)
    n = len(lead)
    perm = tuple(range(n)) + (n, n + 2, n + 1, n + 3, n + 4)
    x = x.transpose(perm)
    return x.reshape(-1, ws, ws, C)


def window_reverse(windows: jnp.ndarray, window_size: int, H: int, W: int,
                   lead_shape=()) -> jnp.ndarray:
    """[N*nH*nW, ws, ws, C] -> [*lead_shape, H, W, C] (inverse of partition).

    ``lead_shape`` is the original leading batch shape (e.g. ``(B,)`` or
    ``(T, B)``); reference ``window_reverse`` (swin_transformer_mtlora.py:101)
    infers B from the window count — here it is passed explicitly because
    task-stacked streams carry extra leading dims.
    """
    ws = window_size
    C = windows.shape[-1]
    lead = tuple(lead_shape) if lead_shape else (-1,)
    x = windows.reshape(*lead, H // ws, W // ws, ws, ws, C)
    n = len(x.shape) - 5
    perm = tuple(range(n)) + (n, n + 2, n + 1, n + 3, n + 4)
    x = x.transpose(perm)
    return x.reshape(*x.shape[:n], H, W, C)


@functools.lru_cache(maxsize=None)
def _shift_partition_perm(H: int, W: int, ws: int, shift: int):
    """Static token permutation combining roll(-shift, -shift) and window
    partition: out flat windowed index (wi, wj, a, b) -> source flat
    token index. Returns (perm, inverse_perm) numpy arrays — the same
    index arithmetic the reference CUDA kernel hardcodes
    (swin_window_process_kernel.cu:57-64)."""
    src_h = (np.arange(H) + shift) % H
    src_w = (np.arange(W) + shift) % W
    src = src_h[:, None] * W + src_w[None, :]
    perm = src.reshape(H // ws, ws, W // ws, ws).transpose(
        0, 2, 1, 3).reshape(-1)
    return perm, np.argsort(perm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _permute_tokens(x2, H, W, ws, shift, inverse):
    """Permutation gather on the token axis (-2); the custom VJP keeps
    the backward a gather with the inverse permutation instead of the
    scatter jnp.take's default vjp would emit."""
    perm, inv = _shift_partition_perm(H, W, ws, shift)
    return jnp.take(x2, jnp.asarray(inv if inverse else perm), axis=-2)


def _permute_fwd(x2, H, W, ws, shift, inverse):
    return _permute_tokens(x2, H, W, ws, shift, inverse), None


def _permute_bwd(H, W, ws, shift, inverse, _, g):
    return (_permute_tokens(g, H, W, ws, shift, not inverse),)


_permute_tokens.defvjp(_permute_fwd, _permute_bwd)


def npad2(ws: int) -> int:
    """Padded pack-2 row count: 2*ws*ws rounded up to the 8-sublane
    tile (ws=7 -> 104)."""
    return -(-2 * ws * ws // 8) * 8


@functools.lru_cache(maxsize=None)
def _pad2_perms(H: int, W: int, ws: int, shift: int):
    """Index maps for the PADDED pack-2 windowed token order.

    Window pair i occupies padded slots [i*npad, i*npad + 2*ws*ws);
    the remaining slots are pads (they source token 0 and are masked
    with -1e9 key columns in the attention bias). Because npad2(ws) is
    a multiple of the 8-sublane tile, the XLA reshapes [B, Lp, C] <->
    [B*npairs, npad, C] at the kernel boundary are free bitcasts —
    unlike the N=49/98 layouts, whose misaligned reshapes materialize
    as HBM repacks (the round-5 trace's 25.5 ms "layout (blocks)"
    bucket; measured win in tools/pad_probe.py).

    Returns (perm_pad [Lp], pos [L], pad_mask [Lp]) where
    perm_pad maps padded slot -> source token, pos maps token -> its
    padded slot, and pad_mask marks real slots.
    """
    perm, _ = _shift_partition_perm(H, W, ws, shift)
    nw = (H // ws) * (W // ws)
    npairs = nw // 2
    npad = npad2(ws)
    Lp = npairs * npad
    n2 = 2 * ws * ws
    perm_pad = np.zeros(Lp, np.int32)
    pad_mask = np.zeros(Lp, np.bool_)
    pos = np.zeros(H * W, np.int32)
    for i in range(npairs):
        src = perm[i * n2:(i + 1) * n2]
        perm_pad[i * npad:i * npad + n2] = src
        pad_mask[i * npad:i * npad + n2] = True
        pos[src] = i * npad + np.arange(n2)
    return perm_pad, pos, pad_mask


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def shift_window_partition_pad2(x2, H, W, ws, shift):
    """[..., H*W, C] tokens -> [..., Lp, C] padded pack-2 window order
    (fused cyclic shift + partition + pad, one gather). The caller
    reshapes the result to [B*npairs, npad2(ws), C] for FREE."""
    perm_pad, _, _ = _pad2_perms(H, W, ws, shift)
    return jnp.take(x2, jnp.asarray(perm_pad), axis=-2)


def _ppad2_fwd(x2, H, W, ws, shift):
    return shift_window_partition_pad2(x2, H, W, ws, shift), None


def _ppad2_bwd(H, W, ws, shift, _, g):
    # Pad slots carry exactly-zero cotangents — their values reach the
    # loss only through -1e9-masked attention keys (exp underflows to
    # exactly 0) and through pad-query outputs that merge_pad2 discards
    # — so gathering only the real slots is the exact VJP.
    _, pos, _ = _pad2_perms(H, W, ws, shift)
    return (jnp.take(g, jnp.asarray(pos), axis=-2),)


shift_window_partition_pad2.defvjp(_ppad2_fwd, _ppad2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def window_merge_unshift_pad2(xp, H, W, ws, shift):
    """[..., Lp, C] padded window order -> [..., H*W, C] tokens
    (inverse of shift_window_partition_pad2; drops pad slots)."""
    _, pos, _ = _pad2_perms(H, W, ws, shift)
    return jnp.take(xp, jnp.asarray(pos), axis=-2)


def _mpad2_fwd(xp, H, W, ws, shift):
    return window_merge_unshift_pad2(xp, H, W, ws, shift), None


def _mpad2_bwd(H, W, ws, shift, _, g):
    # d_xp[real slot] = g[token]; d_xp[pad slot] = 0. The zeros are
    # REQUIRED for exactness: pad queries attend to real keys, so a
    # nonzero pad cotangent would pollute dV/dK in the attention
    # backward. The where fuses into the gather (one XLA pass).
    perm_pad, _, pad_mask = _pad2_perms(H, W, ws, shift)
    gp = jnp.take(g, jnp.asarray(perm_pad), axis=-2)
    m = jnp.asarray(pad_mask)[(None,) * (g.ndim - 2) + (slice(None), None)]
    return (jnp.where(m, gp, jnp.zeros((), g.dtype)),)


window_merge_unshift_pad2.defvjp(_mpad2_fwd, _mpad2_bwd)


def merge2x2_cat(x, H: int, W: int):
    """PatchMerging's 2x2 gather: [.., H*W, C] -> [.., (H/2)*(W/2), 4C]
    with the reference x0/x1/x2/x3 channel order
    (swin_transformer_mtlora.py:451-455): 4C block k = di + 2*dj,
    i.e. [x(di=0,dj=0), x(1,0), x(0,1), x(1,1)].

    Implemented as free reshapes around ONE 6-D transpose — measured
    fastest of three formulations on v5e at stage-0 scale (fwd+bwd,
    5 streams): 13.1 ms vs 15.9 (token-permutation jnp.take; XLA
    sandwiches the batched gather between full transpose copies) vs
    19.8 (strided slices + concat; scatter-add backward). The
    transpose's autodiff is itself a transpose — no custom VJP needed.
    """
    *lead, L, C = x.shape
    n = len(lead)
    xi = x.reshape(*lead, H // 2, 2, W // 2, 2, C)
    # [.., Hh, 2_di, Wh, 2_dj, C] -> [.., Hh, Wh, 2_dj, 2_di, C]:
    # row-major (2_dj, 2_di) == k = di + 2*dj, the reference order
    perm = tuple(range(n)) + (n, n + 2, n + 3, n + 1, n + 4)
    xc = xi.transpose(perm)
    return xc.reshape(*lead, (H // 2) * (W // 2), 4 * C)


def shift_window_partition(x: jnp.ndarray, window_size: int,
                           shift: int) -> jnp.ndarray:
    """Fused cyclic shift + window partition.

    Equivalent to the reference CUDA ``WindowProcess.apply``
    (kernels/window_process/swin_window_process_kernel.cu:42-67).
    ``shift == 0`` is a plain partition (reshape/transpose); shifted
    blocks run roll+partition as ONE permutation gather instead of a
    roll copy followed by a transpose copy.
    """
    ws = window_size
    if not shift:
        return window_partition(x, ws)
    *lead, H, W, C = x.shape
    x2 = x.reshape(*lead, H * W, C)
    out = _permute_tokens(x2, H, W, ws, shift, False)
    return out.reshape(-1, ws, ws, C)


def window_merge_unshift(windows: jnp.ndarray, window_size: int, shift: int,
                         H: int, W: int, lead_shape=()) -> jnp.ndarray:
    """Fused window merge + reverse cyclic shift.

    Equivalent to the reference CUDA ``WindowProcessReverse.apply``
    (swin_window_process_kernel.cu:96-147); shifted blocks run as ONE
    inverse-permutation gather.
    """
    ws = window_size
    if not shift:
        return window_reverse(windows, ws, H, W, lead_shape)
    C = windows.shape[-1]
    # empty lead_shape infers ONE leading batch dim (-> [B, H, W, C]),
    # exactly like window_reverse above; both branches agree.
    lead = tuple(lead_shape) if lead_shape else (-1,)
    x2 = windows.reshape(*lead, H * W, C)
    out = _permute_tokens(x2, H, W, ws, shift, True)
    return out.reshape(*out.shape[:-2], H, W, C)
