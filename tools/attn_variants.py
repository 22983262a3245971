"""Microbenchmark of window-attention kernel formulations (stage shapes).

Isolates where the fused kernel's time goes (dots vs softmax) and A/Bs
candidate redesigns around bigger MXU passes. Run on the real chip.
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 32
WS = 7
N = WS * WS

# (H, W, C, nH)
STAGES = {
    "s0": (112, 112, 96, 3),
    "s1": (56, 56, 192, 6),
    "s2": (28, 28, 384, 12),
    "s3": (14, 14, 768, 24),
}

_DN_QK = (((2,), (2,)), ((0,), (0,)))
_DN_PV = (((2,), (1,)), ((0,), (0,)))


def sync(x):
    if isinstance(x, (tuple, list)):
        x = x[0]
    float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def bench(fn, args, warmup=3, iters=20):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def _grp(nw, cap):
    g = min(nw, cap)
    while nw % g:
        g -= 1
    return g


# ---------------------------------------------------------------- variants
def kern_full(qkv_ref, bias_ref, o_ref, *, nH, scale):
    """Current pack-2 kernel shape: per-head unrolled QK+softmax+PV."""
    x = qkv_ref[...]
    C = x.shape[-1] // 3
    hd = C // nH
    outs = []
    for h in range(nH):
        q = x[:, :, h * hd:(h + 1) * hd]
        k = x[:, :, C + h * hd:C + (h + 1) * hd]
        s = jax.lax.dot_general(q * scale, k, dimension_numbers=_DN_QK,
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[h][None].astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        v = x[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        outs.append(jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=_DN_PV,
            preferred_element_type=jnp.float32))
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def kern_dots_only(qkv_ref, bias_ref, o_ref, *, nH, scale):
    """Same dots, NO softmax (p = s cast) — isolates matmul time."""
    x = qkv_ref[...]
    C = x.shape[-1] // 3
    hd = C // nH
    outs = []
    for h in range(nH):
        q = x[:, :, h * hd:(h + 1) * hd]
        k = x[:, :, C + h * hd:C + (h + 1) * hd]
        s = jax.lax.dot_general(q * scale, k, dimension_numbers=_DN_QK,
                                preferred_element_type=jnp.float32)
        v = x[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        outs.append(jax.lax.dot_general(
            s.astype(v.dtype), v, dimension_numbers=_DN_PV,
            preferred_element_type=jnp.float32))
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def kern_softmax_only(qkv_ref, bias_ref, o_ref, *, nH, scale):
    """No dots: build s from broadcasting, softmax per head, reduce."""
    x = qkv_ref[...]
    C = x.shape[-1] // 3
    outs = []
    for h in range(nH):
        s = (x[:, :, 0:1] + bias_ref[h][None]).astype(jnp.float32)
        s = jnp.broadcast_to(s, (x.shape[0], x.shape[1], x.shape[1]))
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.sum(p, axis=-1, keepdims=True))
    o_ref[...] = jnp.concatenate(
        outs * (C // nH), axis=-1).astype(o_ref.dtype)


def kern_headbatch(qkv_ref, bias_ref, o_ref, *, nH, scale):
    """One batched dot over [nH*G] instead of nH python-unrolled dots."""
    x = qkv_ref[...]
    G = x.shape[0]
    C = x.shape[-1] // 3
    hd = C // nH
    q = jnp.stack([x[:, :, h * hd:(h + 1) * hd] for h in range(nH)])
    k = jnp.stack([x[:, :, C + h * hd:C + (h + 1) * hd]
                   for h in range(nH)])
    v = jnp.stack([x[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
                   for h in range(nH)])
    q = q.reshape(nH * G, x.shape[1], hd)
    k = k.reshape(nH * G, x.shape[1], hd)
    v = v.reshape(nH * G, x.shape[1], hd)
    s = jax.lax.dot_general(q * scale, k, dimension_numbers=_DN_QK,
                            preferred_element_type=jnp.float32)
    s = s.reshape(nH, G, x.shape[1], x.shape[1])
    s = s + bias_ref[...][:, None].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1).reshape(nH * G, x.shape[1], x.shape[1])
    o = jax.lax.dot_general(p.astype(v.dtype), v,
                            dimension_numbers=_DN_PV,
                            preferred_element_type=jnp.float32)
    o = o.reshape(nH, G, x.shape[1], hd)
    o_ref[...] = jnp.concatenate(
        [o[h] for h in range(nH)], axis=-1).astype(o_ref.dtype)


def kern_headpair(qkv_ref, biashp_ref, o_ref, *, nH, scale):
    """TWO HEADS PER PASS on UNPACKED windows [G, 49, 3C].

    Per head pair (h1, h2): qp [G, 49, 64] = lane-concat(q_h1, q_h2);
    kbd [G, 98, 64] = sublane-concat([k_h1 | 0], [0 | k_h2]).
    QK: ONE dot -> s [G, 49, 98] = [S_h1 | S_h2] (zero blocks kill the
    cross terms exactly). Softmax runs per 49-lane half via the biashp
    layout ([nH/2, 49, 98] with both heads' bias lane-packed) and a
    two-segment max/sum. PV: vst [G, 98, 64] = blockdiag(v_h1; v_h2)
    -> o [G, 49, 64] = [o_h1 | o_h2] directly in output lane order.
    Rows per (window, head): 24.5 vs pack-2's 49.
    """
    x = qkv_ref[...]  # [G, 49, 3C]
    G, N = x.shape[0], x.shape[1]
    C = x.shape[-1] // 3
    hd = C // nH
    outs = []
    zeros = jnp.zeros((G, N, hd), x.dtype)
    for hp in range(nH // 2):
        h1, h2 = 2 * hp, 2 * hp + 1
        q1 = x[:, :, h1 * hd:(h1 + 1) * hd]
        q2 = x[:, :, h2 * hd:(h2 + 1) * hd]
        qp = jnp.concatenate([q1, q2], axis=-1) * scale   # [G, 49, 64]
        k1 = x[:, :, C + h1 * hd:C + (h1 + 1) * hd]
        k2 = x[:, :, C + h2 * hd:C + (h2 + 1) * hd]
        kbd = jnp.concatenate([
            jnp.concatenate([k1, zeros], axis=-1),
            jnp.concatenate([zeros, k2], axis=-1)], axis=-2)  # [G,98,64]
        s = jax.lax.dot_general(qp, kbd, dimension_numbers=_DN_QK,
                                preferred_element_type=jnp.float32)
        s = s + biashp_ref[hp][None].astype(jnp.float32)   # [49, 98]
        # segment softmax over the two 49-lane halves
        s1 = s[:, :, :N]
        s2 = s[:, :, N:]
        p1 = jax.nn.softmax(s1, axis=-1)
        p2 = jax.nn.softmax(s2, axis=-1)
        p = jnp.concatenate([p1, p2], axis=-1)             # [G, 49, 98]
        v1 = x[:, :, 2 * C + h1 * hd:2 * C + (h1 + 1) * hd]
        v2 = x[:, :, 2 * C + h2 * hd:2 * C + (h2 + 1) * hd]
        vst = jnp.concatenate([
            jnp.concatenate([v1, zeros], axis=-1),
            jnp.concatenate([zeros, v2], axis=-1)], axis=-2)  # [G,98,64]
        outs.append(jax.lax.dot_general(
            p.astype(x.dtype), vst, dimension_numbers=_DN_PV,
            preferred_element_type=jnp.float32))           # [G, 49, 64]
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def kern_headpair_fused_softmax(qkv_ref, biashp_ref, o_ref, *, nH,
                                scale):
    """headpair but ONE softmax over 98 lanes using a segment trick:
    subtract per-segment max via broadcast of two 49-lane maxes."""
    x = qkv_ref[...]
    G, N = x.shape[0], x.shape[1]
    C = x.shape[-1] // 3
    hd = C // nH
    outs = []
    zeros = jnp.zeros((G, N, hd), x.dtype)
    for hp in range(nH // 2):
        h1, h2 = 2 * hp, 2 * hp + 1
        q1 = x[:, :, h1 * hd:(h1 + 1) * hd]
        q2 = x[:, :, h2 * hd:(h2 + 1) * hd]
        qp = jnp.concatenate([q1, q2], axis=-1) * scale
        k1 = x[:, :, C + h1 * hd:C + (h1 + 1) * hd]
        k2 = x[:, :, C + h2 * hd:C + (h2 + 1) * hd]
        kbd = jnp.concatenate([
            jnp.concatenate([k1, zeros], axis=-1),
            jnp.concatenate([zeros, k2], axis=-1)], axis=-2)
        s = jax.lax.dot_general(qp, kbd, dimension_numbers=_DN_QK,
                                preferred_element_type=jnp.float32)
        s = s + biashp_ref[hp][None].astype(jnp.float32)
        m1 = jnp.max(s[:, :, :N], axis=-1, keepdims=True)
        m2 = jnp.max(s[:, :, N:], axis=-1, keepdims=True)
        e = jnp.exp(s - jnp.concatenate(
            [jnp.broadcast_to(m1, (G, N, N)),
             jnp.broadcast_to(m2, (G, N, N))], axis=-1))
        d1 = jnp.sum(e[:, :, :N], axis=-1, keepdims=True)
        d2 = jnp.sum(e[:, :, N:], axis=-1, keepdims=True)
        p = e / jnp.concatenate(
            [jnp.broadcast_to(d1, (G, N, N)),
             jnp.broadcast_to(d2, (G, N, N))], axis=-1)
        v1 = x[:, :, 2 * C + h1 * hd:2 * C + (h1 + 1) * hd]
        v2 = x[:, :, 2 * C + h2 * hd:2 * C + (h2 + 1) * hd]
        vst = jnp.concatenate([
            jnp.concatenate([v1, zeros], axis=-1),
            jnp.concatenate([zeros, v2], axis=-1)], axis=-2)
        outs.append(jax.lax.dot_general(
            p.astype(x.dtype), vst, dimension_numbers=_DN_PV,
            preferred_element_type=jnp.float32))
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def kern_headpair8(qkv_ref, biashp_ref, o_ref, *, nH, scale):
    """headpair_fs on DENSE 8-window blocks [G, 392, 3C].

    392 = 8*49 is sublane-tileable, so the block reshapes FREELY from
    the flat win-major token layout [M, 3C] — no N=49 pad repack at
    either kernel boundary. Windows are sliced at unaligned 49-row
    offsets in-kernel (Mosaic masked shifts); measures whether that
    costs more than the repack it saves.
    """
    x = qkv_ref[...]  # [G, 392, 3C]
    G = x.shape[0]
    N = 49
    C = x.shape[-1] // 3
    hd = C // nH
    wouts = []
    for w in range(8):
        xw = x[:, w * N:(w + 1) * N]
        zeros = jnp.zeros((G, N, hd), x.dtype)
        outs = []
        for hp in range(nH // 2):
            h1, h2 = 2 * hp, 2 * hp + 1
            qp = jnp.concatenate(
                [xw[:, :, h1 * hd:(h1 + 1) * hd],
                 xw[:, :, h2 * hd:(h2 + 1) * hd]], axis=-1) * scale
            k1 = xw[:, :, C + h1 * hd:C + (h1 + 1) * hd]
            k2 = xw[:, :, C + h2 * hd:C + (h2 + 1) * hd]
            kbd = jnp.concatenate([
                jnp.concatenate([k1, zeros], axis=-1),
                jnp.concatenate([zeros, k2], axis=-1)], axis=-2)
            s = jax.lax.dot_general(qp, kbd, dimension_numbers=_DN_QK,
                                    preferred_element_type=jnp.float32)
            s = s + biashp_ref[hp][None].astype(jnp.float32)
            m1 = jnp.max(s[:, :, :N], axis=-1, keepdims=True)
            m2 = jnp.max(s[:, :, N:], axis=-1, keepdims=True)
            e = jnp.exp(s - jnp.concatenate(
                [jnp.broadcast_to(m1, (G, N, N)),
                 jnp.broadcast_to(m2, (G, N, N))], axis=-1))
            d1 = jnp.sum(e[:, :, :N], axis=-1, keepdims=True)
            d2 = jnp.sum(e[:, :, N:], axis=-1, keepdims=True)
            p = e / jnp.concatenate(
                [jnp.broadcast_to(d1, (G, N, N)),
                 jnp.broadcast_to(d2, (G, N, N))], axis=-1)
            v1 = xw[:, :, 2 * C + h1 * hd:2 * C + (h1 + 1) * hd]
            v2 = xw[:, :, 2 * C + h2 * hd:2 * C + (h2 + 1) * hd]
            vst = jnp.concatenate([
                jnp.concatenate([v1, zeros], axis=-1),
                jnp.concatenate([zeros, v2], axis=-1)], axis=-2)
            outs.append(jax.lax.dot_general(
                p.astype(x.dtype), vst, dimension_numbers=_DN_PV,
                preferred_element_type=jnp.float32))
        wouts.append(jnp.concatenate(outs, axis=-1))
    o_ref[...] = jnp.concatenate(wouts, axis=-2).astype(o_ref.dtype)


def kern_pack2x4(qkv_ref, bias_ref, o_ref, *, nH, scale):
    """Current pack-2 math on DENSE 8-window blocks [G, 392, 3C]:
    four 98-row chunks sliced at unaligned offsets, per-head unrolled
    dots per chunk. Kernel math identical to full(pack2); measures the
    cost of unaligned slicing vs the saved boundary repacks."""
    x = qkv_ref[...]  # [G, 392, 3C]
    C = x.shape[-1] // 3
    hd = C // nH
    couts = []
    for c4 in range(4):
        xc = x[:, c4 * 98:(c4 + 1) * 98]
        outs = []
        for h in range(nH):
            q = xc[:, :, h * hd:(h + 1) * hd]
            k = xc[:, :, C + h * hd:C + (h + 1) * hd]
            s = jax.lax.dot_general(
                q * scale, k, dimension_numbers=_DN_QK,
                preferred_element_type=jnp.float32)
            s = s + bias_ref[h][None].astype(jnp.float32)
            p = jax.nn.softmax(s, axis=-1)
            v = xc[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
            outs.append(jax.lax.dot_general(
                p.astype(v.dtype), v, dimension_numbers=_DN_PV,
                preferred_element_type=jnp.float32))
        couts.append(jnp.concatenate(outs, axis=-1))
    o_ref[...] = jnp.concatenate(couts, axis=-2).astype(o_ref.dtype)


def run_pack2x4(qkv, bias2, nH, scale, cap=8, check=False):
    Btot, Np, C3 = qkv.shape
    C = C3 // 3
    qkv8 = qkv.reshape(Btot // 8, 8 * Np, C3)
    n8 = Btot // 8
    G = _grp(n8, cap)

    @jax.jit
    def fwd(q, b):
        kernel = functools.partial(kern_pack2x4, nH=nH, scale=scale)
        return pl.pallas_call(
            kernel,
            grid=(n8 // G,),
            in_specs=[
                pl.BlockSpec((G, 8 * Np, C3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, 8 * Np, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n8, 8 * Np, C), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 << 20),
        )(q, b)

    if check:
        out = np.asarray(fwd(qkv8, bias2), np.float32).reshape(
            Btot, Np, C)
        ref = np.asarray(ref_attn(
            qkv.reshape(Btot, Np, C3),
            bias2[:, :49, :49], nH, scale), np.float32)
        err = np.abs(out - ref).max()
        print(f"  pack2x4 max|err| vs ref: {err:.5f}")
    t = bench(fwd, (qkv8, bias2))
    print(f"  {'pack2x4':16s} G={G:3d}: {t:7.3f} ms")
    return t


def run_headpair8(qkv, bias, nH, scale, cap=8, check=False):
    Btot, Np, C3 = qkv.shape
    C = C3 // 3
    qkv8 = qkv.reshape(Btot // 8, 8 * Np, C3)
    n8 = Btot // 8
    G = _grp(n8, cap)
    biashp = jnp.concatenate([bias[0::2], bias[1::2]], axis=-1)

    @jax.jit
    def fwd(q, b):
        kernel = functools.partial(kern_headpair8, nH=nH, scale=scale)
        return pl.pallas_call(
            kernel,
            grid=(n8 // G,),
            in_specs=[
                pl.BlockSpec((G, 8 * Np, C3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, 8 * Np, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n8, 8 * Np, C), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 << 20),
        )(q, b)

    if check:
        out = np.asarray(fwd(qkv8, biashp), np.float32).reshape(
            Btot, Np, C)
        ref = np.asarray(ref_attn(qkv, bias, nH, scale), np.float32)
        err = np.abs(out - ref).max()
        print(f"  headpair8 max|err| vs ref: {err:.5f}")
    t = bench(fwd, (qkv8, biashp))
    print(f"  {'headpair8':16s} G={G:3d}: {t:7.3f} ms")
    return t


def kern_quad(qkv_ref, bias_ref, o_ref, kv_scr, *, nH, scale):
    """8 windows (4 pack-2 rows merged: [Gq, 392, 3C]) per instance.

    QK^T: ONE [392,128]x[128,98] pass per head per quad — Q block-diag
    over four 32-wide k-slots (built as lane-tile * mask, all aligned),
    K as [98, 128] lane-concat of the four packs' k blocks. PV: ONE
    [392,98]x[98,128] pass with the cross-pack garbage masked + lane-
    reduced. 2 MXU passes per 8 windows per head vs pack-2's 8.
    """
    x = qkv_ref[...]  # [Gq, 392, 3C]
    Gq = x.shape[0]
    C = x.shape[-1] // 3
    hd = C // nH
    R, Np = 392, 98
    # block-diag masks (constant per call)
    rowb = jax.lax.broadcasted_iota(jnp.int32, (R, 4 * hd), 0) // Np
    colb = jax.lax.broadcasted_iota(jnp.int32, (R, 4 * hd), 1) // hd
    mq = (rowb == colb)
    rowo = jax.lax.broadcasted_iota(jnp.int32, (R, 4 * hd), 0) // Np
    outs = []
    for h in range(nH):
        q = x[:, :, h * hd:(h + 1) * hd] * scale          # [Gq, 392, hd]
        k = x[:, :, C + h * hd:C + (h + 1) * hd]          # [Gq, 392, hd]
        v = x[:, :, 2 * C + h * hd:2 * C + (h + 1) * hd]
        qt = jnp.concatenate([q] * 4, axis=-1)            # [Gq, 392, 128]
        qbig = jnp.where(mq[None], qt, 0)
        for p in range(4):
            kv_scr[0, :, :, p * hd:(p + 1) * hd] = qkv_ref[
                :, p * Np:(p + 1) * Np, C + h * hd:C + (h + 1) * hd]
            kv_scr[1, :, :, p * hd:(p + 1) * hd] = qkv_ref[
                :, p * Np:(p + 1) * Np,
                2 * C + h * hd:2 * C + (h + 1) * hd]
        kbig = kv_scr[0]
        s = jax.lax.dot_general(
            qbig, kbig, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [Gq, 392, 98]
        s = s + bias_ref[h][None].astype(jnp.float32)
        p_ = jax.nn.softmax(s, axis=-1)
        vwide = kv_scr[1]
        ow = jax.lax.dot_general(
            p_.astype(v.dtype), vwide,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [Gq, 392, 128]
        ow = jnp.where(mq[None], ow, 0)
        oh = (ow[:, :, 0:hd] + ow[:, :, hd:2 * hd]
              + ow[:, :, 2 * hd:3 * hd] + ow[:, :, 3 * hd:4 * hd])
        outs.append(oh)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def kern_quad_pre(qb_ref, kb_ref, bias_ref, o_ref, *, nH, scale):
    """Pure dot-structure probe: pre-marshaled qbig [Gq, nH, 392, 128]
    and kvbig [Gq, nH, 2, 98, 128]; measures ONLY the 2-passes-per-head
    pipeline (no in-kernel marshaling, no output demux)."""
    outs = []
    Gq = qb_ref.shape[0]
    for h in range(nH):
        qbig = qb_ref[:, h]
        kbig = kb_ref[:, h, 0]
        vwide = kb_ref[:, h, 1]
        s = jax.lax.dot_general(
            qbig, kbig, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[h][None].astype(jnp.float32)
        p_ = jax.nn.softmax(s, axis=-1)
        ow = jax.lax.dot_general(
            p_.astype(vwide.dtype), vwide,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        hd = 32
        oh = (ow[:, :, 0:hd] + ow[:, :, hd:2 * hd]
              + ow[:, :, 2 * hd:3 * hd] + ow[:, :, 3 * hd:4 * hd])
        outs.append(oh)
    o_ref[...] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def run_quad_pre(nH, scale, Btot, C, cap):
    rs = np.random.RandomState(1)
    Gq = _grp(Btot // 8, cap)
    nq = Btot // 8
    qb = jnp.asarray(rs.randn(nq, nH, 392, 128) * .5, jnp.bfloat16)
    kb = jnp.asarray(rs.randn(nq, nH, 2, 98, 128) * .5, jnp.bfloat16)
    bias = jnp.asarray(rs.randn(nH, 392, 98) * .1, jnp.float32)

    @jax.jit
    def fwd(qb, kb, b):
        kernel = functools.partial(kern_quad_pre, nH=nH, scale=scale)
        return pl.pallas_call(
            kernel,
            grid=(nq // Gq,),
            in_specs=[
                pl.BlockSpec((Gq, nH, 392, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Gq, nH, 2, 98, 128),
                             lambda i: (i, 0, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Gq, 392, 32 * nH),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nq, 392, 32 * nH),
                                           jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 << 20),
        )(qb, kb, b)

    t = bench(fwd, (qb, kb, bias))
    print(f"  quad_pre        G={Gq:3d}: {t:7.3f} ms")


def run_variant(name, kern, qkv_p, bias2, nH, scale, cap=32):
    Btot, Np, C3 = qkv_p.shape
    C = C3 // 3
    G = _grp(Btot, cap)

    scratch = []
    if kern is kern_quad:
        hd = C // nH
        scratch = [pltpu.VMEM((2, G, 98, 4 * hd), qkv_p.dtype)]

    @jax.jit
    def fwd(q, b):
        kernel = functools.partial(kern, nH=nH, scale=scale)
        return pl.pallas_call(
            kernel,
            grid=(Btot // G,),
            in_specs=[
                pl.BlockSpec((G, Np, C3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Btot, Np, C), qkv_p.dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 << 20),
        )(q, b)

    t = bench(fwd, (qkv_p, bias2))
    print(f"  {name:16s} G={G:3d}: {t:7.3f} ms")
    return t


def run_headpair(kern, name, qkv, bias, nH, scale, cap=32,
                 check=False):
    """Unpacked windows [Btot, 49, 3C]; bias lane-paired
    [nH//2, 49, 98]."""
    Btot, Np, C3 = qkv.shape
    C = C3 // 3
    G = _grp(Btot, cap)
    biashp = jnp.concatenate([bias[0::2], bias[1::2]], axis=-1)

    @jax.jit
    def fwd(q, b):
        kernel = functools.partial(kern, nH=nH, scale=scale)
        return pl.pallas_call(
            kernel,
            grid=(Btot // G,),
            in_specs=[
                pl.BlockSpec((G, Np, C3), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((G, Np, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Btot, Np, C), qkv.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=64 << 20),
        )(q, b)

    if check:
        out = np.asarray(fwd(qkv, biashp), np.float32)
        ref = np.asarray(ref_attn(qkv, bias, nH, scale), np.float32)
        err = np.abs(out - ref).max()
        print(f"  {name} max|err| vs ref: {err:.5f}")
    t = bench(fwd, (qkv, biashp))
    print(f"  {name:16s} G={G:3d}: {t:7.3f} ms")
    return t


def ref_attn(qkv, bias, nH, scale):
    Btot, Np, C3 = qkv.shape
    C = C3 // 3
    hd = C // nH
    q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
    q = q.reshape(Btot, Np, nH, hd).transpose(0, 2, 1, 3)
    k = k.reshape(Btot, Np, nH, hd).transpose(0, 2, 1, 3)
    v = v.reshape(Btot, Np, nH, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
    s = s + bias[None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    return o.transpose(0, 2, 1, 3).reshape(Btot, Np, C)


def main():
    rs = np.random.RandomState(0)
    which = sys.argv[1] if len(sys.argv) > 1 else "s0"
    H, W, C, nH = STAGES[which]
    nw = (H // WS) * (W // WS)
    scale = (C // nH) ** -0.5
    Btot = B * nw
    qkv = jnp.asarray(rs.randn(Btot, N, 3 * C) * 0.5, jnp.bfloat16)
    bias = jnp.asarray(rs.randn(nH, N, N) * 0.1, jnp.float32)
    # pack-2
    qkv_p = qkv.reshape(Btot // 2, 2 * N, 3 * C)
    neg = jnp.full((nH, N, N), -1e9, jnp.float32)
    top = jnp.concatenate([bias, neg], axis=-1)
    bot = jnp.concatenate([neg, bias], axis=-1)
    bias2 = jnp.concatenate([top, bot], axis=-2)

    only = sys.argv[2] if len(sys.argv) > 2 else ""
    print(f"stage {which}: C={C} nH={nH} nw={nw} packed={qkv_p.shape}")
    for cap in (32, 64):
        print(f" cap={cap}")
        if not only or only == "pack2":
            run_variant("full(pack2)", kern_full, qkv_p, bias2, nH,
                        scale, cap)
        if not only or only == "pack2x4":
            run_pack2x4(qkv, bias2, nH, scale, cap // 4,
                        check=(cap == 32))
        if nH % 2 == 0:
            if not only or only == "headpair":
                run_headpair(kern_headpair, "headpair", qkv, bias, nH,
                             scale, cap * 2, check=(cap == 32))
                run_headpair(kern_headpair_fused_softmax, "headpair_fs",
                             qkv, bias, nH, scale, cap * 2)
            if not only or only == "headpair8":
                run_headpair8(qkv, bias, nH, scale, cap // 4,
                              check=(cap == 32))


if __name__ == "__main__":
    main()
