#!/usr/bin/env python
"""Convert a reference torch checkpoint (.pth) to an orbax checkpoint.

Usage:
  python tools/convert_checkpoint.py \
    --cfg configs/mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml \
    --tasks semseg,normals,sal,human_parts \
    --input mtlora.pth --output ./converted_ckpt [--skip-decoder]

Initializes the JAX model from the config, overlays the converted torch
weights (with the full key surgery from utils.py:41-277), and writes an
orbax checkpoint that `main.py --resume` accepts.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--tasks", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--skip-decoder", action="store_true")
    p.add_argument("--db", default="PASCALContext")
    p.add_argument("--opts", nargs="+", default=None,
                   help="config overrides: KEY VALUE pairs")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mtlora_tpu.ckpt.checkpoint import save_checkpoint
    from mtlora_tpu.ckpt.torch_convert import (
        load_torch_checkpoint, merge_converted)
    from mtlora_tpu.config import load_config
    from mtlora_tpu.models.mtl import build_mtl_model
    from mtlora_tpu.train.optim import build_optimizer
    from mtlora_tpu.train.step import TrainState

    tasks = args.tasks.split(",")
    cfg = load_config(args.cfg, tasks=tasks, db_name=args.db,
                      img_size=args.img_size, opts=args.opts)
    model = build_mtl_model(cfg)
    img = int(cfg.DATA.IMG_SIZE)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.SEED), jnp.zeros((2, img, img, 3)))
    conv = load_torch_checkpoint(
        args.input, tasks,
        target_window_size=cfg.MODEL.SWIN.WINDOW_SIZE,
        target_num_patches=(img // 4) ** 2,
        skip_decoder=args.skip_decoder, verbose=True)
    variables = merge_converted(variables, conv)
    tx = build_optimizer(cfg, variables["params"], n_iter_per_epoch=1000)
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}))
    path = save_checkpoint(args.output, epoch=0, state=state,
                           config_dump=cfg.dump())
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
