"""Model factories (reference models/build.py:22-86).

``build_model`` returns the bare backbone (classification head when
NUM_CLASSES > 0 — the non-MTL ImageNet path); ``build_mtl_model`` (in
mtl.py) wraps it into the multi-task assembly. The reference's optional
apex FusedLayerNorm (models/build.py:26-32) needs no equivalent: XLA
fuses LayerNorm automatically.

Model-type coverage notes vs the reference:
  - 'swin' (vanilla + MTLoRA): supported.
  - SwinV2 / Swin-MoE / Swin-MLP: the reference carries config stubs for
    these but cannot build them either (models/build.py handles only
    'swin'; SURVEY.md section 2.2) — same surface here.
"""

from __future__ import annotations

import jax.numpy as jnp

from mtlora_tpu.models.lora import MTLoRASpec
from mtlora_tpu.models.mtl import build_mtl_model  # noqa: F401
from mtlora_tpu.models.swin import SwinTransformerMTLoRA


def build_model(config, *, dtype=None) -> SwinTransformerMTLoRA:
    """Backbone factory. MTL configs get num_classes=0 (head=identity,
    reference config.py:412 + swin_transformer_mtlora.py:712-713)."""
    if config.MODEL.TYPE != "swin":
        raise NotImplementedError(
            f"Unknown model type {config.MODEL.TYPE!r} (the reference "
            "builds only 'swin' as well)")
    swin = config.MODEL.SWIN
    if dtype is None and config.get("AMP_ENABLE", False):
        compute = config.get("TPU", {}).get("COMPUTE_DTYPE", "bfloat16")
        dtype = jnp.bfloat16 if compute == "bfloat16" else None
    mtlora = MTLoRASpec.from_config(config) if config.MODEL.MTLORA.ENABLED \
        else MTLoRASpec()
    return SwinTransformerMTLoRA(
        img_size=int(config.DATA.IMG_SIZE),
        patch_size=int(swin.PATCH_SIZE),
        num_classes=int(config.MODEL.NUM_CLASSES),
        embed_dim=int(swin.EMBED_DIM),
        depths=tuple(swin.DEPTHS),
        num_heads=tuple(swin.NUM_HEADS),
        window_size=int(swin.WINDOW_SIZE),
        mlp_ratio=float(swin.MLP_RATIO),
        qkv_bias=bool(swin.QKV_BIAS),
        qk_scale=swin.QK_SCALE,
        drop_rate=float(config.MODEL.DROP_RATE),
        drop_path_rate=float(config.MODEL.DROP_PATH_RATE),
        ape=bool(swin.APE),
        patch_norm=bool(swin.PATCH_NORM),
        mtlora=mtlora,
        use_remat=bool(config.TRAIN.USE_CHECKPOINT),
        dtype=dtype,
    )
