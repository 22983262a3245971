"""Probe Mb block-size and gelu-form variants for the adapter-tail kernel.

The _plan() VMEM budget (~2 MB for the fp32 [Mb, H4] block) predates the
64 MB per-kernel VMEM ceiling; larger Mb amortizes MXU pipeline fill
across fewer, bigger dots (4 tasks x 2 dots x grid cells invocations).

Run: python tools/tail_mb_probe.py [fwd|bwd|all]
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

import mtlora_tpu.ops.pallas_adapter_mlp as am

T, R, M, H4 = 4, 4, 32 * 12544, 384


def run(which, mb, gelu_name, r, iters=30):
    dt = jnp.bfloat16
    M2 = -(-M // mb) * mb
    mid1T = jnp.asarray(r.randn(T, R, M2) * 0.3, dt)
    p1 = jnp.asarray(r.randn(M2, H4) * 0.7, dt)
    b1 = jnp.asarray(r.randn(T, R, H4) * 0.3, dt)
    a2T = jnp.asarray(r.randn(T, R, H4) * 0.3, dt)
    g = jnp.asarray(r.randn(T, R, M2) * 0.3, dt)
    scales = tuple([2.0] * T)

    if gelu_name == "tanh":
        def gf(z, cheap):
            return 0.5 * z * (1.0 + jnp.tanh(
                0.7978845608 * (z + 0.044715 * z * z * z)))

        def gp(z, cheap):
            th = jnp.tanh(0.7978845608 * (z + 0.044715 * z * z * z))
            h = 0.5 * z * (1.0 + th)
            dg = 0.5 * (1.0 + th) + 0.5 * z * (1.0 - th * th) * (
                0.7978845608 * (1.0 + 3 * 0.044715 * z * z))
            return h, dg
    else:
        gf, gp = am._gelu_fwd, am._gelu_pair

    orig_plan, orig_gf, orig_gp = am._plan, am._gelu_fwd, am._gelu_pair
    am._plan = lambda MM, HH: (mb, -(-MM // mb) * mb)
    am._gelu_fwd, am._gelu_pair = gf, gp
    try:
        if which == "fwd":
            fn = jax.jit(lambda *a: am._run_fwd(*a, scales, False))
            args = (mid1T, p1, b1, a2T)
        else:
            fn = jax.jit(lambda *a: am._run_bwd(*a, scales, False))
            args = (mid1T, p1, b1, a2T, g)
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(jax.device_get(jax.tree.leaves(out)[0].reshape(-1)[0]))
        jax.tree.map(lambda x: x.block_until_ready(), out)
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{which} Mb={mb:5d} gelu={gelu_name:4s} {ms:7.3f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{which} Mb={mb:5d} gelu={gelu_name:4s} FAIL "
              f"{type(e).__name__}: {str(e)[:100]}", flush=True)
    finally:
        am._plan, am._gelu_fwd, am._gelu_pair = orig_plan, orig_gf, orig_gp


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    r = np.random.RandomState(0)
    for w in (["fwd", "bwd"] if which == "all" else [which]):
        for mb in (1024, 2048, 4096, 8192):
            for gname in ("sig", "tanh"):
                run(w, mb, gname, r)


if __name__ == "__main__":
    main()
