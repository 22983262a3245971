"""MTLoRA-TPU command-line driver.

CLI-compatible rebuild of the reference entry point (main.py:53-145
argparse surface + main():148-311 control flow): config + data + model +
optimizer assembly, checkpoint resume/pretrained load (torch .pth via the
converter, orbax natively), LoRA freezing, epoch loop with periodic
save/validate, eval-only and throughput modes. Distributed init is
jax.distributed over the TPU mesh instead of torch NCCL process groups.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import time


def parse_option():
    p = argparse.ArgumentParser(
        "MTLoRA-TPU training and evaluation", add_help=True)
    p.add_argument("--cfg", type=str, required=True, metavar="FILE",
                   help="path to config yaml")
    p.add_argument("--opts", nargs="+", default=None,
                   help="override config options: KEY VALUE pairs")
    p.add_argument("--batch-size", type=int, help="global batch size")
    p.add_argument("--data-path", type=str, help="dataset path")
    p.add_argument("--pascal", type=str, help="PASCAL-Context root")
    p.add_argument("--nyud", type=str, help="NYUD root")
    p.add_argument("--tasks", type=str,
                   help="comma-separated task list, e.g. semseg,normals")
    p.add_argument("--pretrained", type=str,
                   help="pretrained backbone checkpoint (.pth or orbax)")
    p.add_argument("--resume", type=str, help="resume checkpoint")
    p.add_argument("--resume-backbone", action="store_true",
                   help="load checkpoint into backbone only")
    p.add_argument("--freeze_backbone", action="store_true")
    p.add_argument("--accumulation-steps", type=int)
    p.add_argument("--use-checkpoint", action="store_true",
                   help="activation rematerialization")
    p.add_argument("--disable_amp", action="store_true",
                   help="disable bf16 compute")
    p.add_argument("--output", default="output", type=str, metavar="PATH")
    p.add_argument("--tag", type=str, help="tag of experiment")
    p.add_argument("--name", type=str, help="override model name")
    p.add_argument("--eval", action="store_true",
                   help="evaluation only")
    p.add_argument("--merged", action="store_true",
                   help="with --eval: fold shared LoRA into the kernels "
                        "and skip the adapter GEMMs (merge_lora_weights)")
    p.add_argument("--throughput", action="store_true",
                   help="throughput only")
    p.add_argument("--epochs", type=int)
    p.add_argument("--ckpt-freq", type=int, default=5)
    p.add_argument("--eval-freq", type=int, default=5)
    p.add_argument("--eval_training_freq", type=int)
    p.add_argument("--skip_initial_validation", action="store_true")
    p.add_argument("--no_eval_50", action="store_false",
                   help="disable the extra epoch-50 validation")
    p.add_argument("--decoder_map", type=str,
                   help="json file mapping task -> decoder head")
    p.add_argument("--skip_decoder", action="store_true",
                   help="drop decoder weights when loading checkpoints")
    p.add_argument("--save_sample", action="store_true")
    p.add_argument("--run_name", type=str)
    p.add_argument("--disable_wandb", action="store_true")
    p.add_argument("--synthetic-data", action="store_true",
                   help="train on synthetic data (no dataset needed)")
    # multi-host launch (reference main.py:552-575 torch.distributed env
    # init; here jax.distributed — on Cloud TPU pods all three default
    # from the TPU metadata, so none are needed):
    p.add_argument("--coordinator", type=str,
                   default=os.environ.get("MTLORA_COORDINATOR"),
                   help="host:port of process 0 (multi-host)")
    p.add_argument("--num-processes", type=int,
                   default=int(os.environ.get("MTLORA_NUM_PROCESSES", 0))
                   or None)
    p.add_argument("--process-id", type=int,
                   default=int(os.environ.get("MTLORA_PROCESS_ID", -1))
                   if os.environ.get("MTLORA_PROCESS_ID") else None)
    # accepted for reference-CLI compatibility (no-ops on TPU):
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--fused_window_process", action="store_true")
    p.add_argument("--fused_layernorm", action="store_true")
    p.add_argument("--optim", type=str)
    p.add_argument("--zip", action="store_true")
    p.add_argument("--cache-mode", type=str, default="part")
    p.add_argument("--amp-opt-level", type=str)
    p.add_argument("--mti", type=int)
    args = p.parse_args()

    from mtlora_tpu.config import get_config

    return args, get_config(args)


def build_all(config, logger):
    import jax
    import jax.numpy as jnp

    from mtlora_tpu.models.mtl import build_mtl_model
    from mtlora_tpu.parallel.mesh import make_mesh
    from mtlora_tpu.train.optim import build_optimizer, count_params
    from mtlora_tpu.train.step import TrainState

    mesh = make_mesh(list(config.TPU.MESH_SHAPE))
    n_dev = mesh.devices.size
    logger.info(f"mesh: {mesh}")
    model = build_mtl_model(config)
    img = int(config.DATA.IMG_SIZE)
    x0 = jnp.zeros((2, img, img, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(config.SEED), x0)
    counts = count_params(variables["params"], config)
    logger.info(
        f"Number of trainable params: {counts['trainable']:,}\n"
        f"Decoder params:             {counts['decoder']:,}\n"
        f"LoRA params:                {counts['lora']:,}\n"
        f"Extra params:               {counts['extra']:,}\n"
        f"Total params:               {counts['total']:,} "
        f"(trainable ratio: "
        f"{counts['trainable'] / counts['total'] * 100:.2f}%)")
    return mesh, n_dev, model, variables


def main(args, config):
    import jax
    import numpy as np

    from mtlora_tpu.parallel.distributed import initialize

    # multi-host wiring (reference main.py:552-575): join the global
    # mesh, then rank-offset the HOST-SIDE randomness (augmentation
    # draws; ref main.py:570 `seed + rank`). Model/optimizer init and
    # the jit-internal dropout rng stay at config.SEED — SPMD params
    # must be identical on every process, and sharded-batch dropout is
    # already globally consistent under jit.
    info = initialize(getattr(args, "coordinator", None),
                      getattr(args, "num_processes", None),
                      getattr(args, "process_id", None))
    np.random.seed(config.SEED + info["rank"])

    from mtlora_tpu.ckpt.checkpoint import (
        auto_resume_helper, load_checkpoint, save_checkpoint)
    from mtlora_tpu.ckpt.torch_convert import (
        load_torch_checkpoint, merge_converted)
    from mtlora_tpu.parallel.mesh import replicate_tree
    from mtlora_tpu.train.loop import throughput, train_one_epoch, validate
    from mtlora_tpu.train.optim import build_optimizer
    from mtlora_tpu.train.step import (
        TrainState, jit_eval_step, jit_train_step, make_eval_step,
        make_train_step)
    from mtlora_tpu.utils.logger import create_logger

    os.makedirs(config.OUTPUT, exist_ok=True)
    logger = create_logger(config.OUTPUT, dist_rank=jax.process_index(),
                           name=config.MODEL.NAME)
    with open(os.path.join(config.OUTPUT, "config.json"), "w") as f:
        f.write(json.dumps(config.to_dict(), default=str, indent=1))
    logger.info(f"Full config saved to {config.OUTPUT}/config.json")

    # data ----------------------------------------------------------------
    if getattr(args, "synthetic_data", False) or not config.DATA.DATA_PATH:
        logger.warning("using synthetic data (no --pascal/--nyud given)")
        from mtlora_tpu.data.loader import DataLoader, ignore_fill_sample
        from mtlora_tpu.data.synthetic import SyntheticMTL
        from mtlora_tpu.data.transforms import get_transformations

        tr_train, tr_val = get_transformations(
            config.DATA.DBNAME, config.TASKS_CONFIG)
        ds_train = SyntheticMTL(config.TASKS, config.DATA.IMG_SIZE,
                                length=64, db_name=config.DATA.DBNAME,
                                transform=tr_train)
        val_len = int(os.environ.get("MTLORA_SYNTH_VAL_LEN", "16"))
        ds_val = SyntheticMTL(config.TASKS, config.DATA.IMG_SIZE,
                              length=val_len, db_name=config.DATA.DBNAME,
                              transform=tr_val, seed=1)
        loader_train = DataLoader(ds_train, config.DATA.BATCH_SIZE,
                                  num_workers=config.DATA.NUM_WORKERS,
                                  seed=config.SEED,
                                  process_index=info["rank"],
                                  process_count=info["world"])
        loader_val = DataLoader(ds_val, config.DATA.BATCH_SIZE,
                                shuffle=False, drop_last=False,
                                num_workers=config.DATA.NUM_WORKERS,
                                process_index=info["rank"],
                                process_count=info["world"],
                                pad_last=True,
                                pad_fill=ignore_fill_sample)
    else:
        from mtlora_tpu.data.loader import build_loader

        _, _, loader_train, loader_val, _ = build_loader(config)

    # model + optimizer ---------------------------------------------------
    mesh, n_dev, model, variables = build_all(config, logger)
    tx = build_optimizer(config, variables["params"],
                         n_iter_per_epoch=len(loader_train),
                         world_size=n_dev)
    state = TrainState.create(params=variables["params"], tx=tx,
                              batch_stats=variables.get("batch_stats", {}),
                              rng=jax.random.PRNGKey(config.SEED))

    start_epoch = 0
    max_accuracy = 0.0

    # checkpoint surgery paths (reference main.py:208-253) ---------------
    resume = config.MODEL.RESUME
    if config.TRAIN.AUTO_RESUME and not resume:
        found = auto_resume_helper(config.OUTPUT)
        if found:
            logger.info(f"auto resuming from {found}")
            resume = found
    if resume:
        if resume.endswith(".pth"):
            conv = load_torch_checkpoint(
                resume, config.TASKS,
                target_window_size=config.MODEL.SWIN.WINDOW_SIZE,
                skip_decoder=config.TRAIN.SKIP_DECODER_CKPT)
            params = merge_converted(
                {"params": state.params,
                 "batch_stats": state.batch_stats}, conv)
            state = state.replace(
                params=params["params"],
                batch_stats=params.get("batch_stats", state.batch_stats))
        else:
            out = load_checkpoint(resume, state, mesh)
            state = out["state"]
            start_epoch = out["epoch"] + 1
            max_accuracy = out["max_accuracy"]
    elif config.MODEL.PRETRAINED:
        conv = load_torch_checkpoint(
            config.MODEL.PRETRAINED, config.TASKS,
            target_window_size=config.MODEL.SWIN.WINDOW_SIZE,
            target_num_patches=(config.DATA.IMG_SIZE // 4) ** 2,
            skip_decoder=True)
        params = merge_converted(
            {"params": state.params, "batch_stats": state.batch_stats},
            conv)
        state = state.replace(
            params=params["params"],
            batch_stats=params.get("batch_stats", state.batch_stats))
        logger.info(f"loaded pretrained {config.MODEL.PRETRAINED}")

    from mtlora_tpu.parallel.distributed import barrier

    # replicate_tree's device_put runs a cross-process equality check —
    # the first collective; align processes after the (possibly skewed)
    # init compiles
    barrier("pre_replicate")
    state = replicate_tree(state, mesh)
    train_step = jit_train_step(
        make_train_step(model, tx, config.TASKS,
                        accum_steps=config.TRAIN.ACCUMULATION_STEPS),
        mesh)
    # fp32 eval clone by default (reference runs validate() outside
    # autocast, main.py:473); TPU.EVAL_DTYPE=bfloat16 for the fast path
    from mtlora_tpu.models.mtl import eval_model_for

    eval_model = eval_model_for(model, config)
    eval_step = jit_eval_step(make_eval_step(eval_model), mesh)

    log_fn = _wandb_log_fn(args, config, logger)

    if config.THROUGHPUT_MODE:
        # measure BOTH forward paths in one run (the reference has one
        # path, main.py:531-549; we have the fp32 reference-parity eval
        # clone AND the bf16/Pallas production path — report both so the
        # default doesn't undersell the build)
        batch = next(iter(loader_val.iter_epoch(0)))
        throughput(config, state, eval_step, mesh=mesh, logger=logger,
                   batch=batch,
                   label=None if eval_model is model else
                   "fp32, Pallas kernels disabled (reference eval-parity "
                   "path)")
        if eval_model is not model:
            fast_step = jit_eval_step(make_eval_step(model), mesh)
            throughput(config, state, fast_step, mesh=mesh, logger=logger,
                       batch=batch,
                       label="bf16 + Pallas kernels (production eval "
                             "path)")
        return
    if config.EVAL_MODE:
        if getattr(args, "merged", False):
            # fold shared adapters into the kernels and re-jit the eval
            # step on the merged model (skips the shared-LoRA GEMMs on
            # every layer where merging is valid)
            from mtlora_tpu.models.lora import (
                MTLoRASpec, merge_lora_weights)

            merged_params, merged_spec = merge_lora_weights(
                state.params, MTLoRASpec.from_config(config))
            state = state.replace(params=merged_params)
            eval_step = jit_eval_step(
                make_eval_step(eval_model.clone(mtlora=merged_spec)),
                mesh)
            logger.info("merged shared LoRA into kernels (fast eval path)")
        scores = validate(config, state, eval_step, loader_val, 0, mesh,
                          logger, log_fn)
        _dump_scores(config, scores)
        return

    logger.info("Start training")
    start = time.perf_counter()
    epoch = start_epoch
    for epoch in range(start_epoch, config.TRAIN.EPOCHS):
        state, _ = train_one_epoch(config, state, train_step, loader_train,
                                   epoch, mesh, logger, log_fn,
                                   eval_step=eval_step)
        if (epoch % config.SAVE_FREQ == 0
                or epoch == config.TRAIN.EPOCHS - 1):
            # EVERY process calls into orbax: its save path runs cross-
            # process barriers, so a rank-0-only call deadlocks a pod
            # (orbax itself writes replicated arrays from process 0)
            save_checkpoint(config.OUTPUT, epoch, state, max_accuracy,
                            config_dump=config.dump())
        if epoch % config.EVAL_FREQ == 0 or (
                getattr(args, "no_eval_50", True) and epoch == 50):
            validate(config, state, eval_step, loader_val, epoch, mesh,
                     logger, log_fn)
    scores = validate(config, state, eval_step, loader_val, epoch, mesh,
                      logger, log_fn)
    _dump_scores(config, scores)
    total = time.perf_counter() - start
    logger.info(
        f"Training time {datetime.timedelta(seconds=int(total))}")


def _dump_scores(config, scores):
    """Write the final task-score dict per process (rank-suffixed when
    multi-host) — machine-readable eval results next to the log."""
    import jax

    path = os.path.join(config.OUTPUT,
                        f"val_scores_r{jax.process_index()}.json")
    with open(path, "w") as f:
        json.dump(scores, f, default=float, indent=1)


def main_classification(args, config):
    """Non-MTL ImageNet classification mode (reference main.py without
    --tasks: CE/smoothing/mixup training, top-1/5 validation).

    Parity with the MTL driver (reference uses ONE driver for both
    modes, main.py:290-307): multi-host initialize + per-process loader
    sharding, checkpoint save every SAVE_FREQ + auto-resume
    (utils.py:280-321), sample-exact padded validation, --eval and
    --throughput modes. Mixup mixes within each process's local rows
    (host-side augmentation; rank-offset RNG like ref main.py:570).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mtlora_tpu.ckpt.checkpoint import (
        auto_resume_helper, load_checkpoint, save_checkpoint)
    from mtlora_tpu.data.imagenet import (
        ClassificationTransform, ImageFolder, ZipImageFolder, mixup_cutmix)
    from mtlora_tpu.data.loader import DataLoader
    from mtlora_tpu.models.build import build_model
    from mtlora_tpu.parallel.distributed import initialize
    from mtlora_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicated, replicate_tree)
    from mtlora_tpu.train.classification import (
        make_classification_eval_step, make_classification_train_step)
    from mtlora_tpu.train.loop import _device_batch
    from mtlora_tpu.train.optim import build_optimizer
    from mtlora_tpu.train.step import TrainState, jit_train_step
    from mtlora_tpu.utils.logger import AverageMeter, create_logger

    info = initialize(getattr(args, "coordinator", None),
                      getattr(args, "num_processes", None),
                      getattr(args, "process_id", None))
    np.random.seed(config.SEED + info["rank"])
    os.makedirs(config.OUTPUT, exist_ok=True)
    logger = create_logger(config.OUTPUT, dist_rank=jax.process_index(),
                           name=config.MODEL.NAME)
    img = int(config.DATA.IMG_SIZE)
    tr = ClassificationTransform(img)
    root = config.DATA.DATA_PATH
    DS = ZipImageFolder if config.DATA.ZIP_MODE else ImageFolder
    ds_train = DS(os.path.join(root, "train") if not config.DATA.ZIP_MODE
                  else root, transform=tr, img_size=img)
    ds_val = DS(os.path.join(root, "val") if not config.DATA.ZIP_MODE
                else root, transform=tr, img_size=img)

    def _cls_pad_fill(sample):
        sample["label"] = np.zeros_like(sample["label"])  # weight-0 row
        return sample

    loader_train = DataLoader(ds_train, config.DATA.BATCH_SIZE,
                              num_workers=config.DATA.NUM_WORKERS,
                              seed=config.SEED,
                              process_index=info["rank"],
                              process_count=info["world"])
    loader_val = DataLoader(ds_val, config.DATA.BATCH_SIZE, shuffle=False,
                            drop_last=False,
                            num_workers=config.DATA.NUM_WORKERS,
                            process_index=info["rank"],
                            process_count=info["world"],
                            pad_last=True, pad_fill=_cls_pad_fill)
    mesh = make_mesh(list(config.TPU.MESH_SHAPE))
    model = build_model(config)
    v = jax.jit(lambda r, x: model.init(r, x, return_stages=False,
                                        flatten_ft=True))(
        jax.random.PRNGKey(config.SEED),
        jnp.zeros((2, img, img, 3), jnp.float32))
    start_epoch = 0
    max_accuracy = 0.0
    resume = config.MODEL.RESUME
    if config.TRAIN.AUTO_RESUME and not resume:
        found = auto_resume_helper(config.OUTPUT)
        if found:
            logger.info(f"auto resuming from {found}")
            resume = found
    tx = build_optimizer(config, v["params"], len(loader_train),
                         world_size=mesh.devices.size)
    state = TrainState.create(params=v["params"], tx=tx,
                              rng=jax.random.PRNGKey(config.SEED))
    if resume:
        out = load_checkpoint(resume, state, mesh)
        state = out["state"]
        start_epoch = out["epoch"] + 1
        max_accuracy = out["max_accuracy"]
        logger.info(f"resumed from {resume} at epoch {start_epoch}")
    elif config.MODEL.PRETRAINED:
        # pretrained surgery incl. 22K->1K head remap (utils.py:179-277)
        from mtlora_tpu.ckpt.torch_convert import (
            load_torch_checkpoint, merge_converted, strip_backbone_prefix)
        conv = strip_backbone_prefix(load_torch_checkpoint(
            config.MODEL.PRETRAINED,
            target_window_size=config.MODEL.SWIN.WINDOW_SIZE,
            target_num_patches=(img // 4) ** 2,
            num_classes=int(config.MODEL.NUM_CLASSES), verbose=True))
        state = state.replace(params=merge_converted(
            {"params": state.params}, conv)["params"])
        logger.info(f"loaded pretrained {config.MODEL.PRETRAINED}")

    from mtlora_tpu.parallel.distributed import barrier

    barrier("cls_pre_replicate")
    state = replicate_tree(state, mesh)
    step = jit_train_step(make_classification_train_step(
        model, tx, config.MODEL.LABEL_SMOOTHING), mesh)
    rep, shd = replicated(mesh), batch_sharding(mesh)
    eval_step = jax.jit(make_classification_eval_step(model),
                        in_shardings=(rep, shd, shd, shd),
                        out_shardings=rep)

    def run_validate():
        sums = {"n": 0.0, "correct1": 0.0, "correct5": 0.0}
        for batch in loader_val.iter_epoch(0):
            dev = _device_batch(batch, mesh)
            w = dev.get("_valid",
                        jnp.ones(dev["label"].shape[:1], jnp.float32))
            counts = jax.device_get(eval_step(
                state.params, dev["image"], dev["label"], w))
            for k in sums:
                sums[k] += float(counts[k])
        n = max(sums["n"], 1.0)
        return 100.0 * sums["correct1"] / n, 100.0 * sums["correct5"] / n

    if config.THROUGHPUT_MODE:
        from mtlora_tpu.train.loop import throughput

        fwd = jax.jit(
            lambda p, bs, x: model.apply({"params": p}, x,
                                         return_stages=False,
                                         flatten_ft=True),
            in_shardings=(rep, rep, shd), out_shardings=shd)
        throughput(config, state, fwd, loader_val, mesh, logger)
        return
    if config.EVAL_MODE:
        a1, a5 = run_validate()
        logger.info(f"eval: acc@1 {a1:.2f} acc@5 {a5:.2f}")
        _dump_scores(config, {"classification": {"acc1": a1, "acc5": a5}})
        return

    use_mixup = config.AUG.MIXUP > 0
    num_classes = int(config.MODEL.NUM_CLASSES)
    epoch = start_epoch
    for epoch in range(start_epoch, config.TRAIN.EPOCHS):
        # per-epoch (seed, epoch)-keyed host RNG, mirroring the loader's
        # permutation keying: resume-at-epoch-N replays the exact mixup
        # stream of the uninterrupted run (a run-scoped RNG would restart
        # from the seed at resume and diverge)
        rng = np.random.RandomState(
            np.array([config.SEED + info["rank"], epoch], np.uint32))
        lm = AverageMeter()
        for batch in loader_train.iter_epoch(epoch):
            imgs, labels = batch["image"], batch["label"]
            if use_mixup:
                imgs, labels = mixup_cutmix(
                    imgs, labels, num_classes,
                    mixup_alpha=config.AUG.MIXUP,
                    cutmix_alpha=config.AUG.CUTMIX,
                    switch_prob=config.AUG.MIXUP_SWITCH_PROB,
                    label_smoothing=config.MODEL.LABEL_SMOOTHING, rng=rng)
            dev = _device_batch({"image": imgs, "label": labels}, mesh)
            state, m = step(state, dev)
            lm.update(float(m["loss"]))
        if epoch % config.EVAL_FREQ == 0:
            a1, a5 = run_validate()
            max_accuracy = max(max_accuracy, a1)
            logger.info(f"epoch {epoch}: loss {lm.avg:.4f} "
                        f"acc@1 {a1:.2f} acc@5 {a5:.2f} "
                        f"(max {max_accuracy:.2f})")
        if (epoch % config.SAVE_FREQ == 0
                or epoch == config.TRAIN.EPOCHS - 1):
            # after validation, so the stored max_accuracy includes this
            # epoch's accuracy (the reference saves post-validate,
            # main.py:300-307); EVERY process calls into orbax (cross-
            # process barriers inside; see the MTL driver note above)
            save_checkpoint(config.OUTPUT, epoch, state, max_accuracy,
                            config_dump=config.dump())
    a1, a5 = run_validate()
    max_accuracy = max(max_accuracy, a1)
    logger.info(f"final: acc@1 {a1:.2f} acc@5 {a5:.2f}")
    _dump_scores(config, {"classification": {"acc1": a1, "acc5": a5,
                                             "max_acc1": max_accuracy}})


def _wandb_log_fn(args, config, logger):
    if getattr(args, "disable_wandb", False):
        return None
    try:
        import wandb
    except ImportError:
        return None
    try:
        wandb.init(project="mtlora_tpu",
                   name=getattr(args, "run_name", None)
                   or config.MODEL.NAME,
                   config=config.to_dict())
        return wandb.log
    except Exception as e:  # offline/not logged in
        logger.warning(f"wandb disabled: {e}")
        return None


if __name__ == "__main__":
    if os.environ.get("MTLORA_PLATFORM"):
        # the environment may force a TPU platform at interpreter start
        # (sitecustomize); tests drive multi-process CPU-mesh runs of
        # this CLI via this override (see tests/mp_worker.py note)
        import jax

        jax.config.update("jax_platforms", os.environ["MTLORA_PLATFORM"])
    args, config = parse_option()
    import numpy as np

    np.random.seed(config.SEED)
    if config.get("MTL", False):
        main(args, config)
    else:
        main_classification(args, config)
