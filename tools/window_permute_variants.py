"""Microbenchmark: shifted window partition/unshift formulations.

The shifted-block layout ops run as ONE token-permutation ``jnp.take``
(ops/window.py:_permute_tokens). The PatchMerging shootout
(docs/PERF.md round-3 phase 5) found XLA sandwiches such batched takes
between full transpose copies, and free-reshape 6-D transposes beat
them. This measures the same question for the shift+partition pair:

  A take     : current custom-vjp jnp.take permutation
  B rolltr   : jnp.roll (slice+concat) + reshape/6-D-transpose partition
  C composed : block-boundary composition — unshift(block i) fused with
               partition(block i+1) as ONE take (VERDICT #5) vs the two
               takes it replaces

Each variant times the full per-block round trip fwd+bwd at the real
stage shapes (batch 32, 448 input). Run on the real chip:
    python tools/window_permute_variants.py
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

B = 32
WS = 7

# (H, W, C) for the 448 flagship; stage 3 has min(H,W)<=ws -> no shift
STAGES = {
    "s0": (112, 112, 96),
    "s1": (56, 56, 192),
    "s2": (28, 28, 384),
}


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


def fwdbwd(f):
    """time f's forward plus its vjp with a ones cotangent."""
    def run(x):
        y, pull = jax.vjp(f, x)
        (gx,) = pull(jnp.ones_like(y))
        return y, gx
    return jax.jit(run)


# ------------------------------------------------------------ variant A
def take_roundtrip(H, Wd, shift):
    def f(x):  # x [B, L, C]
        xw = W.shift_window_partition(
            x.reshape(B, H, Wd, -1), WS, shift)
        xw = xw * 1.0000001  # keep the pair from cancelling to identity
        return W.window_merge_unshift(
            xw, WS, shift, H, Wd, (B,)).reshape(B, H * Wd, -1)
    return f


# ------------------------------------------------------------ variant B
def _partition_rolltr(x, shift):
    # roll then free-reshape 6-D transpose (window_partition)
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    return W.window_partition(x, WS)


def _unshift_rolltr(xw, shift, H, Wd):
    x = W.window_reverse(xw, WS, H, Wd, (B,))
    if shift:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    return x


def rolltr_roundtrip(H, Wd, shift):
    def f(x):
        xw = _partition_rolltr(x.reshape(B, H, Wd, -1), shift)
        xw = xw * 1.0000001
        return _unshift_rolltr(xw, shift, H, Wd).reshape(B, H * Wd, -1)
    return f


# ------------------------------------------------------------ variant C
@functools.lru_cache(maxsize=None)
def _composed_perm(H, Wd, s_from, s_to):
    """unshift(s_from) then partition(s_to) as one permutation."""
    p_from, inv_from = W._shift_partition_perm(H, Wd, WS, s_from)
    p_to, _ = W._shift_partition_perm(H, Wd, WS, s_to)
    # windowed(s_from) -> tokens is inv? partition does tokens->windowed
    # via take(perm): windowed[i] = tokens[perm[i]]. unshift is
    # take(inv). composed: windowed_to[i] = tokens[p_to[i]] =
    # windowed_from[inv? ...]; tokens[j] = windowed_from[inv_from_pos]:
    # tokens = take(windowed_from, argsort(p_from)) so
    # windowed_to[i] = windowed_from[argsort(p_from)[p_to[i]]]
    return np.argsort(p_from)[p_to]


def composed_pair(H, Wd):
    """two successive blocks' boundary: unshift(3) + partition(0) and
    unshift(0) + partition(3), each as ONE take."""
    c1 = jnp.asarray(_composed_perm(H, Wd, 3, 0))
    c2 = jnp.asarray(_composed_perm(H, Wd, 0, 3))

    def f(xw):  # xw [B, L, C] already in windowed(3) token order
        a = jnp.take(xw, c1, axis=-2) * 1.0000001
        return jnp.take(a, c2, axis=-2)
    return f


def twotake_pair(H, Wd):
    def f(xw):
        x = W._permute_tokens(xw, H, Wd, WS, 3, True) * 1.0000001
        b = W._permute_tokens(x, H, Wd, WS, 3, False)
        return b
    return f


def main():
    r = np.random.RandomState(0)
    for name, (H, Wd, C) in STAGES.items():
        x = jnp.asarray(r.randn(B, H * Wd, C), jnp.bfloat16)
        rows = [
            ("A take      ", fwdbwd(take_roundtrip(H, Wd, 3))),
            ("B rolltr    ", fwdbwd(rolltr_roundtrip(H, Wd, 3))),
            ("A take  s=0 ", fwdbwd(take_roundtrip(H, Wd, 0))),
            ("B rolltr s=0", fwdbwd(rolltr_roundtrip(H, Wd, 0))),
            ("C composed  ", fwdbwd(composed_pair(H, Wd))),
            ("C two-take  ", fwdbwd(twotake_pair(H, Wd))),
        ]
        for label, fn in rows:
            try:
                ms = bench(fn, (x,))
                print(f"{name} {label} {ms:7.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name} {label} FAIL {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
