"""Microbenchmark: PatchMerging LN+GEMM kernel consuming the NATURAL
[M, C] token layout vs the current [R, 2, Wh, 2C] lane-merged view.

The round-4 profile shows the current kernel's input view re-tiles in
HBM whenever C is not a multiple of 128 (stage 0: C=96, stage 1: C=192)
— the "downsample reshape" ops cost ~5-6 ms/step. This probe implements
the merge with the 2x2 gather done ENTIRELY in VMEM from contiguous
[th*2W, C] row blocks (even/odd column split = stride-2 sublane slices;
row pair split = aligned slices), so the HBM input is the residual
stream exactly as the previous op wrote it.

Run: python tools/merge_variants.py  (on the TPU)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mtlora_tpu.ops.pallas_ln_lora import (
    _EPS, fused_merge_ln_linear, merge_ln_reference)

# stage-0 x-stream scale: B=32, H=W=112, C=96 -> O=192
B, H, W, C = 32, 112, 112, 96
O = 2 * C
M = B * H * W


def _merge2_fwd_kernel(x_ref, g_ref, b_ref, w_ref, y_ref, *, W):
    th = x_ref.shape[0] // (2 * W)
    C = x_ref.shape[1]
    Wh = W // 2
    cdt = x_ref.dtype
    v = x_ref[...]                      # [th*2W, C] natural rows
    # Mosaic supports no strided slices; every split is a reshape (free
    # regroup of non-minor dims / supported minor regroups) + an INDEX
    # slice: row half by [th, 2, W, C][:, di], column parity by
    # [th, Wh, 2, C][:, :, dj]
    v4 = v.reshape(th, 2, W, C)
    xs = []
    for k in range(4):                  # reference order k = di + 2*dj
        di, dj = k % 2, k // 2
        h = v4[:, di].reshape(th, Wh, 2, C)[:, :, dj, :]
        xs.append(h.astype(jnp.float32))                # [th, Wh, C]
    n = jnp.float32(4 * C)
    s1 = sum(jnp.sum(v, -1, keepdims=True) for v in xs)
    s2 = sum(jnp.sum(v * v, -1, keepdims=True) for v in xs)
    mu = s1 / n
    var = s2 / n - mu * mu
    inv = jax.lax.rsqrt(var + _EPS)
    acc = None
    for k in range(4):
        ln = ((xs[k] - mu) * inv * g_ref[k].astype(jnp.float32)
              + b_ref[k].astype(jnp.float32))
        d = jax.lax.dot_general(
            ln.reshape(th * Wh, C).astype(cdt), w_ref[k],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y_ref[...] = acc.astype(y_ref.dtype)


def make_v2(dtype, th=16):
    # x [M, C] flat; th row-pairs (2W rows each) per grid cell
    R2 = M // (2 * W)
    assert R2 % th == 0
    f = pl.pallas_call(
        functools.partial(_merge2_fwd_kernel, W=W),
        grid=(R2 // th,),
        in_specs=[
            pl.BlockSpec((th * 2 * W, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((th * (W // 2), O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M // 4, O), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 << 20),
    )
    return jax.jit(f)


def make_current():
    # includes the [B*L, C] -> [R, 2, Wh, 2C] view (the HBM retile)
    def fn(x, gamma, beta, kernel):
        xv = x.reshape(B * H // 2, 2, W // 2, 2 * C)
        return fused_merge_ln_linear(xv, gamma, beta, kernel, False,
                                     False)
    return jax.jit(fn)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.tree.map(lambda v: v.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0]))
    jax.tree.map(lambda v: v.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    r = np.random.RandomState(0)
    dt = jnp.bfloat16
    x = jnp.asarray(r.randn(M, C) * 0.5, dt)
    gamma = jnp.asarray(r.randn(4 * C) * 0.1 + 1.0, dt)
    beta = jnp.asarray(r.randn(4 * C) * 0.1, dt)
    kernel = jnp.asarray(r.randn(4 * C, O) * 0.05, dt)

    # numerics vs the existing kernel's reference
    try:
        f2 = make_v2(x.dtype)
        y2 = f2(x, gamma.reshape(4, C), beta.reshape(4, C),
                kernel.reshape(4, C, O))
        xv = x.reshape(B * H // 2, 2, W // 2, 2 * C)
        ref = merge_ln_reference(xv, gamma, beta, kernel).reshape(
            M // 4, O)
        err = float(jnp.max(jnp.abs(
            y2.astype(jnp.float32) - ref.astype(jnp.float32))))
        print(f"v2 numerics: max abs err {err:.4f}", flush=True)
        ms2 = timeit(f2, x, gamma.reshape(4, C), beta.reshape(4, C),
                     kernel.reshape(4, C, O))
        print(f"v2 (natural [M,C] input):     {ms2:7.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"v2 FAIL {type(e).__name__}: {str(e)[:400]}", flush=True)

    f1 = make_current()
    ms1 = timeit(f1, x, gamma, beta, kernel)
    print(f"current (view retile + kernel): {ms1:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
