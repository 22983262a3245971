"""Utilities to load the read-only reference torch implementation as a
black-box numerical oracle for parity tests (no reference code is copied;
modules are imported from /root/reference at test time and skipped when
absent)."""

import os
import sys
import types

REF = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF, "models"))


def install_timm_stub():
    """The reference imports three trivial helpers from timm (absent in
    this environment); provide torch-native equivalents."""
    import torch

    if "timm.models.layers" in sys.modules:
        return

    def to_2tuple(x):
        return x if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x / keep * mask

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    timm.models = models
    models.layers = layers
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers

    # seg_hrnet imports ptflops at module level but the HRNet head never
    # uses it; stub it out.
    if "ptflops" not in sys.modules:
        ptflops = types.ModuleType("ptflops")
        ptflops.get_model_complexity_info = lambda *a, **k: (0, 0)
        sys.modules["ptflops"] = ptflops


def load_reference_models():
    """Import reference model modules under the 'models' package name."""
    install_timm_stub()
    if "models" not in sys.modules:
        pkg = types.ModuleType("models")
        pkg.__path__ = [os.path.join(REF, "models")]
        sys.modules["models"] = pkg
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    ref_swin = importlib.import_module("models.swin_transformer_mtlora")
    ref_mtl = importlib.import_module("models.swin_mtl")
    return ref_swin, ref_mtl


def build_reference_model(cfg, tasks):
    """Instantiate the reference MultiTaskSwin from a (my-format) config."""
    ref_swin, ref_mtl = load_reference_models()
    swin = cfg.MODEL.SWIN
    common = dict(
        img_size=int(cfg.DATA.IMG_SIZE), patch_size=4, in_chans=3,
        num_classes=0, embed_dim=int(swin.EMBED_DIM),
        depths=list(swin.DEPTHS), num_heads=list(swin.NUM_HEADS),
        window_size=int(swin.WINDOW_SIZE), mlp_ratio=float(swin.MLP_RATIO),
        qkv_bias=bool(swin.QKV_BIAS), qk_scale=swin.QK_SCALE,
        drop_rate=float(cfg.MODEL.DROP_RATE), attn_drop_rate=0.0,
        drop_path_rate=float(cfg.MODEL.DROP_PATH_RATE),
        ape=bool(swin.APE), patch_norm=bool(swin.PATCH_NORM))
    if cfg.MODEL.MTLORA.ENABLED:
        backbone = ref_swin.SwinTransformerMTLoRA(
            tasks=list(tasks), mtlora=cfg.MODEL.MTLORA, **common)
    else:
        import importlib
        vanilla = importlib.import_module("models.swin_transformer")
        backbone = vanilla.SwinTransformer(**common)
    model = ref_mtl.MultiTaskSwin(backbone, cfg)
    model.eval()
    return model
