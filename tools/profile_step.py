"""Capture an on-device profiler trace of the flagship train step and dump
the op-level time breakdown (top HLO ops / op categories by self time).

Usage: python tools/profile_step.py [--eval] [--batch N] [--no-pallas]
Writes the raw trace under /tmp/mtlora_trace and prints a table.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(batch_per_chip: int, use_pallas: bool, eval_only: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mtlora_tpu.config import load_config
    from mtlora_tpu.models.mtl import build_mtl_model
    from mtlora_tpu.parallel.mesh import make_mesh, replicate_tree, shard_batch
    from mtlora_tpu.train.optim import build_optimizer
    from mtlora_tpu.train.step import (
        TrainState, jit_train_step, make_train_step, make_eval_step,
        jit_eval_step)

    tasks = ("semseg", "normals", "sal", "human_parts")
    img = 448
    n_dev = len(jax.devices())
    mesh = make_mesh([-1])
    B = batch_per_chip * n_dev
    cfg = load_config(
        "configs/mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml",
        tasks=list(tasks), img_size=img,
        opts=["DATA.BATCH_SIZE", str(B), "TPU.USE_PALLAS", str(use_pallas)])
    model = build_mtl_model(cfg)
    x0 = jnp.zeros((2, img, img, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)
    tx = build_optimizer(cfg, variables["params"], n_iter_per_epoch=1000,
                         world_size=n_dev)
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
        "human_parts": r.randint(0, 7, (B, img, img, 1)).astype(np.float32),
    }, mesh)
    if eval_only:
        estep = jit_eval_step(make_eval_step(model), mesh)

        def run_once(s, b):
            out = estep(s.params, s.batch_stats, b["image"])
            return s, out
        return state, batch, run_once
    step = jit_train_step(make_train_step(model, tx, tasks), mesh)
    return state, batch, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--trace-dir", default="/tmp/mtlora_trace")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import time

    state, batch, step = build_step(args.batch, not args.no_pallas,
                                    args.eval)
    # warmup / compile
    for _ in range(3):
        state, out = step(state, batch)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))

    t0 = time.perf_counter()
    for _ in range(10):
        state, out = step(state, batch)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    dt = (time.perf_counter() - t0) / 10
    n_img = batch["image"].shape[0]
    print(f"step time: {dt * 1e3:.1f} ms  ({n_img / dt:.1f} img/s)")

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.steps):
        state, out = step(state, batch)
    float(jax.device_get(jax.tree.leaves(out)[0].ravel()[0]))
    jax.profiler.stop_trace()

    xplanes = sorted(glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not xplanes:
        print("no xplane captured (profiler unsupported on this platform?)")
        return 1
    xp = xplanes[-1]
    print(f"xplane: {xp}")
    dump_op_stats(xp, args.steps)
    return 0


def dump_op_stats(xplane_path: str, n_steps: int):
    """Parse the xplane with xprof/tensorboard-plugin-profile and print the
    top ops by self time."""
    try:
        from xprof.convert import raw_to_tool_data as rtd
    except ImportError:
        from tensorboard_plugin_profile.convert import (  # type: ignore
            raw_to_tool_data as rtd)
    import gzip
    import json

    params = {"tqx": "out:json;"}
    try:
        data, _ = rtd.xspace_to_tool_data([xplane_path], "framework_op_stats",
                                          params)
    except Exception as e:
        print(f"framework_op_stats failed ({e}); trying op_profile")
        data, _ = rtd.xspace_to_tool_data([xplane_path], "op_profile", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    try:
        obj = json.loads(data)
    except json.JSONDecodeError:
        out = xplane_path + ".opstats.txt"
        with open(out, "w") as f:
            f.write(data)
        print(f"wrote raw tool output to {out}")
        return
    out = xplane_path + ".opstats.json"
    with open(out, "w") as f:
        json.dump(obj, f, indent=1)
    print(f"wrote {out}")
    summarize_tablejson(obj, n_steps)


def summarize_tablejson(obj, n_steps):
    """framework_op_stats comes back as gviz table json; aggregate."""
    try:
        tables = obj if isinstance(obj, list) else [obj]
        for t in tables:
            if not isinstance(t, dict) or "rows" not in t:
                continue
            cols = [c.get("label") or c.get("id") for c in t["cols"]]
            rows = [[c.get("v") for c in r["c"]] for r in t["rows"]]
            print(" | ".join(map(str, cols)))
            for r in rows[:40]:
                print(" | ".join(map(str, r)))
            break
    except Exception as e:
        print(f"(table summary failed: {e})")


if __name__ == "__main__":
    sys.exit(main())
