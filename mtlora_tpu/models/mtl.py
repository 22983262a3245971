"""Multi-task model assembly (reference models/swin_mtl.py).

``MultiTaskSwin`` wraps the Swin backbone, routes per-task feature streams
through per-task channel downsamplers, applies per-task decode heads, and
bilinearly resizes logits to image size.

TPU-first redesign: the per-task 1x1-conv downsamplers
(reference Downsampler, swin_mtl.py:88-135 — a ModuleDict of T modules run
in a Python loop) are stored as task-stacked kernels ``[T, C_in, C_out]``
and applied to the stacked ``[T, B, H, W, C]`` streams as ONE einsum per
scale, so all tasks ride a single MXU matmul.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mtlora_tpu.models.heads import get_head, resize_bilinear
from mtlora_tpu.models.lora import MTLoRASpec
from mtlora_tpu.models.swin import SwinTransformerMTLoRA


class PerTaskDownsampler(nn.Module):
    """Task-stacked 1x1-conv channel reducers, one kernel per scale.

    Parameter ``scale_{i}/kernel`` has shape [T, dims[i], channels[i]];
    torch equivalent is ``downsampler.{task}.downsample_{i}.weight``
    (swin_mtl.py:95-102), stacked over tasks.
    """
    num_tasks: int
    dims: Tuple[int, ...]
    channels: Tuple[int, ...]
    input_res: Tuple[int, ...]
    enabled: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, stage_feats: Sequence[jnp.ndarray]):
        """stage_feats: per scale [T, B, L_s, C_s] -> [T, B, r, r, ch_s]."""
        outs = []
        for i, f in enumerate(stage_feats):
            T, B, L, C = f.shape
            r = self.input_res[i]
            f = f.reshape(T, B, r, r, C)
            if self.enabled:
                k = self.param(
                    f"scale_{i}",
                    nn.initializers.variance_scaling(1 / 3, "fan_in",
                                                     "uniform"),
                    (self.num_tasks, self.dims[i], self.channels[i]),
                    jnp.float32)
                # tokens flattened: a [T,B,H,W,C] einsum gives the dW
                # backward 3 contracting dims, which XLA:TPU lowers as a
                # windowed convolution (see models/lora.py note)
                f2 = f.reshape(T, B * r * r, C)
                f = jnp.einsum("tmc,tco->tmo", f2, k.astype(f.dtype),
                               preferred_element_type=jnp.float32
                               ).astype(f.dtype).reshape(
                    T, B, r, r, self.channels[i])
            outs.append(f)
        return outs


class SharedDownsampler(nn.Module):
    """Single-stream channel reducer (non-MTL path; swin_mtl.py:186-191)."""
    dims: Tuple[int, ...]
    channels: Tuple[int, ...]
    input_res: Tuple[int, ...]
    enabled: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, stage_feats: Sequence[jnp.ndarray]):
        outs = []
        for i, f in enumerate(stage_feats):
            B, L, C = f.shape
            r = self.input_res[i]
            f = f.reshape(B, r, r, C)
            if self.enabled:
                f = nn.Conv(self.channels[i], (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"downsample_{i}")(f)
            outs.append(f)
        return outs


class MultiTaskSwin(nn.Module):
    """Backbone + per-task downsamplers + per-task decode heads
    (reference MultiTaskSwin, swin_mtl.py:138-246).

    __call__(x [B, H, W, 3]) -> {task: [B, H, W, num_outputs]} (NHWC).
    """
    tasks: Tuple[str, ...]
    num_outputs: Tuple[int, ...]
    img_size: int
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    mtlora: MTLoRASpec = MTLoRASpec()
    decoder_channels: Tuple[int, ...] = (18, 36, 72, 144)
    decoder_downsampler: bool = True
    per_task_downsampler: bool = True
    head_types: Tuple[str, ...] = ()     # resolved per task in build
    segformer_channels: int = 256
    use_remat: bool = False
    use_pallas: bool = False
    use_pallas_gemm: bool = False
    use_pallas_adapter: bool = False
    use_pallas_ln: bool = False
    dtype: Optional[jnp.dtype] = None

    # head factory needs a config-like view; build_mtl_model injects one
    def _head_cfg(self):
        class _NS:
            pass

        ns = _NS()
        ns.MODEL = _NS()
        ns.MODEL.DECODER_HEAD = {
            t: (self.head_types[i] if self.head_types else "hrnet")
            for i, t in enumerate(self.tasks)}
        ns.MODEL.SEGFORMER_CHANNELS = self.segformer_channels
        return ns

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        n = len(self.depths)
        # stage i output is post-downsample except the last
        # (reference swin_mtl.py:149-157)
        return tuple(int(self.embed_dim * 2 ** (i + 1 if i < n - 1 else i))
                     for i in range(n))

    @property
    def stage_res(self) -> Tuple[int, ...]:
        n = len(self.depths)
        pr = self.img_size // 4
        return tuple(pr // (2 ** (i + 1 if i < n - 1 else i))
                     for i in range(n))

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 train_bn: Optional[bool] = None):
        train_bn = (not deterministic) if train_bn is None else train_bn
        backbone = SwinTransformerMTLoRA(
            img_size=self.img_size, num_classes=0, embed_dim=self.embed_dim,
            depths=self.depths, num_heads=self.num_heads,
            window_size=self.window_size, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop_rate=self.drop_rate, attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate, ape=self.ape,
            patch_norm=self.patch_norm, mtlora=self.mtlora,
            use_remat=self.use_remat, use_pallas=self.use_pallas,
            use_pallas_gemm=self.use_pallas_gemm,
            use_pallas_adapter=self.use_pallas_adapter,
            use_pallas_ln=self.use_pallas_ln,
            dtype=self.dtype, name="backbone")
        stages = backbone(x, deterministic=deterministic, return_stages=True)

        channels = (self.decoder_channels if self.decoder_downsampler
                    else self.stage_dims)
        T = len(self.tasks)

        if self.mtlora.enabled or self.per_task_downsampler:
            if self.mtlora.enabled:
                per_scale = [t for (_, t) in stages]  # [T, B, L, C] each
            else:
                per_scale = [
                    jnp.broadcast_to(s[None], (T,) + s.shape)
                    for (s, _) in stages]
            down = PerTaskDownsampler(
                num_tasks=T, dims=self.stage_dims, channels=channels,
                input_res=self.stage_res,
                enabled=self.decoder_downsampler, dtype=self.dtype,
                name="downsampler")
            feats = down(per_scale)  # per scale [T, B, r, r, ch]
            head_types = (self.head_types if self.head_types
                          else ("hrnet",) * T)
            # Default OFF: the task-batched einsum form measured SLOWER
            # end-to-end than XLA's four sequential head chains (153.0
            # vs 156.0 img/s at flagship 448/batch-32) — the [T, M, 4C]
            # hidden materialization beats conv fusion's locality. Kept
            # (parity-tested) for wider-T configs where batching wins.
            batched_heads = os.environ.get(
                "MTLORA_BATCHED_HEADS", "0") != "0"
            if batched_heads and all(h == "hrnet" for h in head_types):
                # task-batched HRNet heads: ONE einsum per layer over
                # stacked [T, ...] kernels instead of T sequential
                # convs; param paths identical to the module form
                from mtlora_tpu.models.heads import (
                    HRNetHeadParams, batched_hrnet_heads)

                cin = sum(channels)
                params = [HRNetHeadParams(cin, self.num_outputs[i],
                                          name=f"decoder_{t}")()
                          for i, t in enumerate(self.tasks)]
                logits = batched_hrnet_heads(
                    params, feats, list(self.num_outputs),
                    train=train_bn, dtype=self.dtype)
                return {t: resize_bilinear(
                    logits[i], (self.img_size, self.img_size))
                    for i, t in enumerate(self.tasks)}
            task_feats = {t: [f[i] for f in feats]
                          for i, t in enumerate(self.tasks)}
        else:
            down = SharedDownsampler(
                dims=self.stage_dims, channels=channels,
                input_res=self.stage_res, enabled=True, dtype=self.dtype,
                name="downsampler")
            feats = down([s for (s, _) in stages])
            task_feats = {t: feats for t in self.tasks}

        cfg = self._head_cfg()
        # fused VMEM head kernel (expand->BN->ReLU->pred, BN stats via
        # the input covariance); env kill-switch for A/B runs
        fused_heads = (self.use_pallas and os.environ.get(
            "MTLORA_FUSED_HEADS", "1") != "0")
        out = {}
        for i, task in enumerate(self.tasks):
            head = get_head(task, self.num_outputs[i], cfg,
                            dtype=self.dtype, use_pallas=fused_heads)
            logits = head(task_feats[task], train=train_bn)
            out[task] = resize_bilinear(
                logits, (self.img_size, self.img_size))
        return out


def build_mtl_model(config, *, dtype=None) -> MultiTaskSwin:
    """Model factory from a frozen config (reference models/build.py:22-86)."""
    tasks = tuple(config.TASKS)
    num_outputs = tuple(
        int(config.TASKS_CONFIG.ALL_TASKS.NUM_OUTPUT[t]) for t in tasks)
    swin = config.MODEL.SWIN
    if dtype is None and config.get("AMP_ENABLE", False):
        compute = config.get("TPU", {}).get("COMPUTE_DTYPE", "bfloat16")
        dtype = jnp.bfloat16 if compute == "bfloat16" else None
    return MultiTaskSwin(
        tasks=tasks,
        num_outputs=num_outputs,
        img_size=int(config.DATA.IMG_SIZE),
        embed_dim=int(swin.EMBED_DIM),
        depths=tuple(swin.DEPTHS),
        num_heads=tuple(swin.NUM_HEADS),
        window_size=int(swin.WINDOW_SIZE),
        mlp_ratio=float(swin.MLP_RATIO),
        qkv_bias=bool(swin.QKV_BIAS),
        qk_scale=swin.QK_SCALE,
        drop_rate=float(config.MODEL.DROP_RATE),
        attn_drop_rate=0.0,
        drop_path_rate=float(config.MODEL.DROP_PATH_RATE),
        ape=bool(swin.APE),
        patch_norm=bool(swin.PATCH_NORM),
        mtlora=MTLoRASpec.from_config(config),
        decoder_channels=tuple(config.MODEL.DECODER_CHANNELS),
        decoder_downsampler=bool(config.MODEL.DECODER_DOWNSAMPLER),
        per_task_downsampler=bool(config.MODEL.PER_TASK_DOWNSAMPLER),
        head_types=tuple(config.MODEL.DECODER_HEAD.get(t, "hrnet")
                         for t in tasks),
        segformer_channels=int(config.MODEL.SEGFORMER_CHANNELS),
        use_remat=bool(config.get("TPU", {}).get("REMAT", False)
                       or config.TRAIN.USE_CHECKPOINT),
        use_pallas=_pallas_available(config),
        use_pallas_gemm=(_pallas_available(config) and bool(
            config.get("TPU", {}).get("USE_PALLAS_LORA_GEMM", False))),
        use_pallas_adapter=(_pallas_available(config) and bool(
            config.get("TPU", {}).get("USE_PALLAS_ADAPTER", True))),
        use_pallas_ln=(_pallas_available(config) and bool(
            config.get("TPU", {}).get("USE_PALLAS_LN", False))),
        dtype=dtype,
    )


def _pallas_available(config) -> bool:
    """Pallas kernels run on real TPU only (tests use the CPU mesh)."""
    import jax

    if not bool(config.get("TPU", {}).get("USE_PALLAS", True)):
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False


def eval_model_for(model, config=None):
    """Eval-precision model clone (reference parity: the reference runs
    its validate() forward OUTSIDE autocast, i.e. fp32 —
    /root/reference/main.py:473 vs :478 — while training runs under
    autocast). Returns a parameter-dtype (fp32) clone with the Pallas
    kernels disabled: the kernels force HIGHEST-precision fp32 matmuls
    (minutes of Mosaic compile per shape), while the plain XLA fp32 path
    at default matmul precision matches the reference's eval numerics
    (torch on Ampere evaluates with TF32 matmuls).

    Set ``TPU.EVAL_DTYPE: bfloat16`` to keep the fast bf16/Pallas eval
    path instead (metrics become bf16-quantized).
    """
    if (config is not None and str(config.get("TPU", {}).get(
            "EVAL_DTYPE", "float32")) == "bfloat16"):
        return model
    return model.clone(dtype=None, use_pallas=False,
                       use_pallas_gemm=False, use_pallas_adapter=False,
                       use_pallas_ln=False)
