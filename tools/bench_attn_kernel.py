"""Standalone microbenchmark of the fused window-attention kernel.

Measures fwd and fwd+bwd wall time per flagship stage shape (448px,
batch 32) with hard device_get syncs, to localize where the kernel's
step share goes (the full-step trace shows it ~2x over its bandwidth
floor). Run variants with argv[1]: 'base' (default, current kernel).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from mtlora_tpu.ops.pallas_window_attn import _maybe_packed
from mtlora_tpu.ops.attention import shift_attention_mask


# (H, W, C, nH, depth_blocks) at 448px flagship
STAGES = [
    (112, 112, 96, 3, 2),
    (56, 56, 192, 6, 2),
    (28, 28, 384, 12, 6),
    (14, 14, 768, 24, 2),
]
B = 32
WS = 7


def sync(x):
    float(jax.device_get(jnp.sum(x[0].astype(jnp.float32))
                         if isinstance(x, tuple) else
                         jnp.sum(x.astype(jnp.float32))))


def bench(fn, args, warmup=3, iters=10):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    rs = np.random.RandomState(0)
    total_f, total_b = 0.0, 0.0
    for (H, W, C, nH, depth) in STAGES:
        nw = (H // WS) * (W // WS)
        N = WS * WS
        qkv = jnp.asarray(rs.randn(B * nw, N, 3 * C) * 0.5, jnp.bfloat16)
        bias = jnp.asarray(rs.randn(nH, N, N) * 0.1, jnp.float32)
        mask = jnp.asarray(shift_attention_mask(H, W, WS, WS // 2),
                           jnp.float32)
        scale = (C // nH) ** -0.5

        for shifted in (False, True):
            m = mask if shifted else None

            @jax.jit
            def fwd(q):
                return _maybe_packed(q, bias, m, nH, nw, scale, False)

            @jax.jit
            def fwdbwd(q):
                def loss(q):
                    o = _maybe_packed(q, bias, m, nH, nw, scale, False)
                    return jnp.sum(o.astype(jnp.float32) ** 2)
                return jax.grad(loss)(q)

            tf = bench(fwd, (qkv,))
            tb = bench(fwdbwd, (qkv,))
            # per-step contribution: half the blocks are shifted
            nblk = depth // 2
            total_f += tf * nblk
            total_b += tb * nblk
            gb = qkv.nbytes * (2 if not shifted else 2) / 1e9
            print(f"stage C={C:4d} nH={nH:2d} nw={nw:3d} "
                  f"{'SW' if shifted else ' W'}: fwd {tf:6.2f} ms  "
                  f"fwd+bwd {tb:6.2f} ms   qkv {qkv.nbytes/1e6:.0f} MB "
                  f"(fwd floor ~{gb/0.7*1000/2:.2f} ms)")
    print(f"\nper-step totals (x blocks): fwd {total_f:.1f} ms, "
          f"fwd+bwd {total_b:.1f} ms, bwd-only {total_b-total_f:.1f} ms")


if __name__ == "__main__":
    main()
