"""Training-throughput benchmark on real TPU hardware.

Measures images/sec for the flagship workload: Swin-T 448, MTLoRA
r64/scale4 per-task adapters, 4 PASCAL tasks (semseg, normals, sal,
human_parts), FULL training step (fwd + bwd + AdamW) in bf16 compute,
properly synchronized with block_until_ready — unlike the reference's
throughput harness whose cuda syncs are commented out (main.py:540-545).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the
denominator is an analytic A100 estimate for the same training step:
Swin-T@448 4-task MTLoRA is ~110 GFLOPs/image forward (ptflops-style
count x4 task streams in stage tails), ~3.2x for fwd+bwd, at 35% MFU on
A100 bf16 (312 TFLOPs) -> ~95 img/s. The north star is >=2x that per
chip (BASELINE.json).
"""

import argparse
import json
import sys
import time

A100_BASELINE_IMGS_PER_SEC = 95.0

VARIANTS = {
    "tiny": "mtlora_tiny_448_r64_scale4_pertask.yaml",
    "small": "mtlora_small_448_r64_scale4_pertask.yaml",
    "base": "mtlora_base_448_r64_scale4_pertask.yaml",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", choices=sorted(VARIANTS), default="tiny",
                    help="model scale (the driver metric is the tiny "
                    "flagship; small/base record scale datapoints)")
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mtlora_tpu.config import load_config
    from mtlora_tpu.models.mtl import build_mtl_model
    from mtlora_tpu.parallel.mesh import (
        make_mesh, replicate_tree, shard_batch)
    from mtlora_tpu.train.optim import build_optimizer
    from mtlora_tpu.train.step import (
        TrainState, jit_train_step, make_train_step)

    tasks = ("semseg", "normals", "sal", "human_parts")
    img = 448
    n_dev = len(jax.devices())
    mesh = make_mesh([-1])

    def run(batch_per_chip, use_pallas=True):
        B = batch_per_chip * n_dev
        cfg = load_config(
            "configs/mtlora/tiny_448/" + VARIANTS[args.variant],
            tasks=list(tasks), img_size=img,
            opts=["DATA.BATCH_SIZE", str(B),
                  "TPU.USE_PALLAS", str(use_pallas)])
        model = build_mtl_model(cfg)  # AMP on -> bf16 compute dtype
        x0 = jnp.zeros((2, img, img, 3), jnp.float32)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
        tx = build_optimizer(cfg, variables["params"],
                             n_iter_per_epoch=1000, world_size=n_dev)
        state = TrainState.create(
            params=variables["params"], tx=tx,
            batch_stats=variables.get("batch_stats", {}),
            rng=jax.random.PRNGKey(0))
        state = replicate_tree(state, mesh)
        r = np.random.RandomState(0)
        batch = shard_batch({
            "image": r.randn(B, img, img, 3).astype(np.float32),
            "semseg": r.randint(0, 21, (B, img, img, 1)).astype(np.float32),
            "normals": r.uniform(-1, 1, (B, img, img, 3)).astype(np.float32),
            "sal": (r.rand(B, img, img, 1) > 0.5).astype(np.float32),
            "human_parts": r.randint(0, 7, (B, img, img, 1)).astype(
                np.float32),
        }, mesh)
        step = jit_train_step(make_train_step(model, tx, tasks), mesh)

        warmup, timed = 5, 20
        for _ in range(warmup):
            state, metrics = step(state, batch)
        # NOTE: device_get forces a real sync; block_until_ready returns
        # early on the experimental axon platform.
        float(jax.device_get(metrics["loss"]))
        t0 = time.perf_counter()
        for _ in range(timed):
            state, metrics = step(state, batch)
        float(jax.device_get(metrics["loss"]))
        dt = time.perf_counter() - t0
        # achieved bandwidth / MFU from XLA cost analysis so regressions
        # are diagnosable from the driver artifact alone
        extras = {"step_ms": round(dt / timed * 1000, 2)}
        try:
            from mtlora_tpu.utils.profiling import summarize
            s = summarize(step, state, batch, seconds=dt / timed)
            extras["hbm_gbps"] = round(s.get("achieved_bw_gbps", 0.0), 1)
            extras["mfu"] = round(s.get("mfu", 0.0), 4)
        except Exception as e:  # cost analysis unavailable on platform
            extras["cost_analysis_error"] = type(e).__name__
        return timed * B / dt, extras

    imgs_per_sec = None
    err = None
    winning = None
    extras = {}
    fallbacks = []
    for bpc, pallas in ((32, True), (16, True), (8, True), (4, True),
                        (32, False), (16, False), (8, False)):
        try:
            imgs_per_sec, extras = run(bpc, pallas)
            winning = {"batch_per_chip": bpc, "use_pallas": pallas}
            break
        except Exception as e:  # OOM / kernel-compat backoff
            err = e
            fallbacks.append(
                f"bpc={bpc},pallas={pallas}: {type(e).__name__}")
            print(f"bench config bpc={bpc} pallas={pallas} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
    if imgs_per_sec is None:
        raise err

    per_chip = imgs_per_sec / n_dev
    metric = "train_images_per_sec_per_chip_swin_t_448_mtlora_4task"
    if args.variant != "tiny":
        metric = ("train_images_per_sec_per_chip_swin_"
                  f"{args.variant[0]}_448_mtlora_4task")
    print(json.dumps({
        "metric": metric,
        "value": round(per_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(per_chip / A100_BASELINE_IMGS_PER_SEC, 3),
        "config": winning,
        "fallbacks": fallbacks,
        **extras,
    }))


if __name__ == "__main__":
    sys.exit(main())
