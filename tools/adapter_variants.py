"""Microbenchmark variants of the fused adapter MLP-tail kernel.

The round-4 profile puts the stage-0 task-block fc2 kernel
(ops/pallas_adapter_mlp.py) at 10.5 ms/step (4.2 fwd + 6.3 bwd) against
a ~1 ms bandwidth floor. Hypotheses measured here, each as a standalone
pallas kernel at the stage-0 shape (T=4, r=4, M=32*12544, H4=384, bf16):

  base      exact kernel structure (erf-poly gelu, both dots on MXU)
  noact     gelu removed -> isolates the transcendental share
  sig       sigmoid-form gelu  z*sigmoid(1.5957691 z + 0.0713548 z^3)
            (= the tanh approximation rewritten; max |err| ~1e-3, well
            inside bf16 tolerance, NOT fp32-parity safe)
  tanh      0.5 z (1 + tanh(0.79788(z + 0.044715 z^3))) via jnp.tanh
  nodot1    dot1 (the K=r rank-expansion matmul) removed
  nodot2    dot2 (the K=H4 rank-projection matmul) removed

Run: python tools/adapter_variants.py [fwd|bwd|all]
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

from mtlora_tpu.ops.pallas_adapter_mlp import (
    _cdf, _common_specs, _gelu, _pad_tokens, _plan, _INV_SQRT_2PI)

T, R, M, H4 = 4, 4, 32 * 12544, 384
DN_00 = (((0,), (0,)), ((), ()))
DN_11 = (((1,), (1,)), ((), ()))
DN_10 = (((1,), (0,)), ((), ()))


def _sig_gelu(z):
    w = z * (1.5957691216 + 0.0713548163 * z * z)
    e = jnp.exp(-w)
    d = 1.0 + e
    t = pl.reciprocal(d, approx=True)
    t = t * (2.0 - d * t)
    return z * t


def _tanh_gelu(z):
    return 0.5 * z * (1.0 + jnp.tanh(
        0.7978845608 * (z + 0.044715 * z * z * z)))


def make_fwd(act, dot1=True, dot2=True):
    def kern(mid1_ref, p1_ref, b1_ref, a2_ref, out_ref, *, scales):
        cdt = mid1_ref.dtype
        p1 = p1_ref[...].astype(jnp.float32)
        for t in range(T):
            if dot1:
                u = jax.lax.dot_general(
                    mid1_ref[t], b1_ref[t], DN_00,
                    preferred_element_type=jnp.float32)
                z = p1 + scales[t] * u
            else:
                z = p1 * scales[t]
            h = act(z) if act else z
            if dot2:
                out_ref[t] = jax.lax.dot_general(
                    a2_ref[t], h.astype(cdt), DN_11,
                    preferred_element_type=jnp.float32
                ).astype(out_ref.dtype)
            else:
                out_ref[t] = h[:R].astype(out_ref.dtype)

    return kern


def make_fwd_vpu(act, vpu_dot2=False):
    """dot1 (the K=r rank expansion) as r broadcast-FMAs on the VPU
    instead of an MXU dot — the MXU pads K=4 to 128 so the dot wastes
    31/32 of the array AND serializes against dot2; the VPU runs the
    FMAs while the MXU streams dot2.  Requires mid1 in [T, Mb, r]
    layout (tokens on sublanes) so each rank column broadcasts along
    lanes.  With ``vpu_dot2`` the K=H4 projection also moves to the VPU
    as r2 multiply+lane-reduce passes (out layout [T, Mb, r2])."""
    def kern(mid1n_ref, p1_ref, b1_ref, a2_ref, out_ref, *, scales):
        cdt = mid1n_ref.dtype
        p1 = p1_ref[...].astype(jnp.float32)
        for t in range(T):
            m = mid1n_ref[t].astype(jnp.float32)  # [Mb, R]
            z = p1
            for r in range(R):
                z = z + (scales[t] * m[:, r:r + 1]) * (
                    b1_ref[t, r:r + 1, :].astype(jnp.float32))
            h32 = act(z) if act else z
            if vpu_dot2:
                cols = [jnp.sum(
                    h32 * a2_ref[t, r:r + 1, :].astype(jnp.float32),
                    axis=1, keepdims=True) for r in range(R)]
                out_ref[t] = jnp.concatenate(cols, axis=1).astype(
                    out_ref.dtype)
            else:
                out_ref[t] = jax.lax.dot_general(
                    h32.astype(cdt), a2_ref[t], DN_11,
                    preferred_element_type=jnp.float32
                ).astype(out_ref.dtype)
    return kern


def make_fwd_fn_vpu(kern, dtype, scales, vpu_dot2=False):
    Mb, M2 = _plan(M, H4)
    out_shape = ((T, M2, R) if vpu_dot2 else (T, M2, R))
    out_spec = pl.BlockSpec((T, Mb, R), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(kern, scales=scales),
        grid=(M2 // Mb,),
        in_specs=[
            pl.BlockSpec((T, Mb, R), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),      # mid1 [T, M, r]
            pl.BlockSpec((Mb, H4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),      # p1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),      # a2T
        ],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )
    return jax.jit(f)


def make_bwd(act_pair):
    """act_pair(z) -> (h, dgelu)."""
    def kern(mid1_ref, p1_ref, b1_ref, a2_ref, g_ref,
             dmid1_ref, dp1_ref, db1_ref, da2_ref, *, scales):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            db1_ref[...] = jnp.zeros_like(db1_ref)
            da2_ref[...] = jnp.zeros_like(da2_ref)

        cdt = mid1_ref.dtype
        p1 = p1_ref[...].astype(jnp.float32)
        dp1 = jnp.zeros_like(p1)
        for t in range(T):
            u = jax.lax.dot_general(mid1_ref[t], b1_ref[t], DN_00,
                                    preferred_element_type=jnp.float32)
            z = p1 + scales[t] * u
            hf, dg = act_pair(z)
            h = hf.astype(cdt)
            g = g_ref[t]
            dh = jax.lax.dot_general(g, a2_ref[t], DN_00,
                                     preferred_element_type=jnp.float32)
            dz = (dh * dg).astype(cdt)
            dp1 = dp1 + dz
            dmid1_ref[t] = (scales[t] * jax.lax.dot_general(
                b1_ref[t], dz, DN_11,
                preferred_element_type=jnp.float32)).astype(dmid1_ref.dtype)
            db1_ref[t] += scales[t] * jax.lax.dot_general(
                mid1_ref[t], dz, DN_10, preferred_element_type=jnp.float32)
            da2_ref[t] += jax.lax.dot_general(
                g, h, DN_10, preferred_element_type=jnp.float32)
        dp1_ref[...] = dp1.astype(dp1_ref.dtype)

    return kern


def erf_pair(z):
    cdf = _cdf(z)
    return z * cdf, cdf + z * (jnp.exp(-0.5 * z * z) * _INV_SQRT_2PI)


def sig_pair(z):
    z2 = z * z
    w = z * (1.5957691216 + 0.0713548163 * z2)
    e = jnp.exp(-w)
    d = 1.0 + e
    s = pl.reciprocal(d, approx=True)
    s = s * (2.0 - d * s)
    return z * s, s + z * s * (1.0 - s) * (
        1.5957691216 + 3 * 0.0713548163 * z2)


def make_fwd_fn(kern, dtype, scales):
    Mb, M2 = _plan(M, H4)
    f = pl.pallas_call(
        functools.partial(kern, scales=scales),
        grid=(M2 // Mb,),
        in_specs=_common_specs(T, R, Mb, H4),
        out_specs=pl.BlockSpec((T, R, Mb), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, R, M2), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )
    return jax.jit(f)


def make_bwd_fn(kern, dtype, scales):
    Mb, M2 = _plan(M, H4)
    in_specs = _common_specs(T, R, Mb, H4)
    in_specs.append(pl.BlockSpec((T, R, Mb), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM))
    f = pl.pallas_call(
        functools.partial(kern, scales=scales),
        grid=(M2 // Mb,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((T, R, Mb), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mb, H4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, R, H4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, R, H4), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, R, M2), dtype),
            jax.ShapeDtypeStruct((M2, H4), dtype),
            jax.ShapeDtypeStruct((T, R, H4), jnp.float32),
            jax.ShapeDtypeStruct((T, R, H4), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )
    return jax.jit(f)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.tree.map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = jax.tree.leaves(out)[0]
    float(jax.device_get(s.reshape(-1)[0]))
    jax.tree.map(lambda x: x.block_until_ready(), out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    r = np.random.RandomState(0)
    dt = jnp.bfloat16
    Mb, M2 = _plan(M, H4)
    mid1T = jnp.asarray(r.randn(T, R, M2) * 0.3, dt)
    p1 = jnp.asarray(r.randn(M2, H4) * 0.7, dt)
    b1 = jnp.asarray(r.randn(T, R, H4) * 0.3, dt)
    a2T = jnp.asarray(r.randn(T, R, H4) * 0.3, dt)
    g = jnp.asarray(r.randn(T, R, M2) * 0.3, dt)
    scales = tuple([2.0] * T)
    print(f"shape T={T} r={R} M={M} H4={H4} Mb={Mb} bf16")

    if which in ("fwd", "all"):
        for name, kern in [
            ("base   ", make_fwd(_gelu)),
            ("noact  ", make_fwd(None)),
            ("sig    ", make_fwd(_sig_gelu)),
            ("tanh   ", make_fwd(_tanh_gelu)),
            ("nodot1 ", make_fwd(_gelu, dot1=False)),
        ]:
            try:
                fn = make_fwd_fn(kern, dt, scales)
                ms = timeit(fn, mid1T, p1, b1, a2T)
                print(f"fwd {name} {ms:7.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"fwd {name} FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
        # VPU-FMA rank-dot variants (mid1 in [T, M, r] layout)
        mid1N = jnp.swapaxes(mid1T, 1, 2)
        for name, kern, v2 in [
            ("vpu1sig ", make_fwd_vpu(_sig_gelu), False),
            ("vpu12sig", make_fwd_vpu(_sig_gelu, vpu_dot2=True), True),
            ("vpu1noac", make_fwd_vpu(None), False),
        ]:
            try:
                fn = make_fwd_fn_vpu(kern, dt, scales, vpu_dot2=v2)
                ms = timeit(fn, mid1N, p1, b1, a2T)
                print(f"fwd {name} {ms:7.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"fwd {name} FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

    if which in ("bwd", "all"):
        for name, pair in [("base   ", erf_pair), ("sig    ", sig_pair)]:
            try:
                fn = make_bwd_fn(make_bwd(pair), dt, scales)
                ms = timeit(fn, mid1T, p1, b1, a2T, g)
                print(f"bwd {name} {ms:7.3f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"bwd {name} FAIL {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)

    # numeric sanity of the cheap gelus vs exact erf (fp32 host)
    z = np.linspace(-6, 6, 20001, dtype=np.float64)
    exact = z * 0.5 * (1 + np.vectorize(__import__("math").erf)(
        z / np.sqrt(2)))
    tanh_a = 0.5 * z * (1 + np.tanh(0.7978845608 * (z + 0.044715 * z**3)))
    print(f"max|tanh-form err| = {np.abs(tanh_a - exact).max():.2e}")


if __name__ == "__main__":
    main()
