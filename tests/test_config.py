"""Config system tests: YAML parsing, BASE inheritance, MTLoRA
normalization (reference config.py:329-341,477-557), and compatibility
with the reference repo's own YAML files when present."""

import glob
import os

import pytest

from mtlora_tpu.config import ConfigNode, default_config, load_config

pytestmark = pytest.mark.quick  # always-run gate tier

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
REF_CFG_DIR = "/root/reference/configs"
TASKS4 = ["semseg", "normals", "sal", "human_parts"]


def test_confignode_basic():
    c = ConfigNode({"A": 1, "B": {"C": [1, 2]}})
    assert c.A == 1 and c.B.C == [1, 2]
    c.freeze()
    with pytest.raises(AttributeError):
        c.A = 2
    c2 = c.clone()
    c2.A = 3
    assert c.A == 1 and c2.A == 3


def test_merge_from_list_coerces_types():
    c = default_config()
    c.merge_from_list(["TRAIN.BASE_LR", "1e-3", "DATA.BATCH_SIZE", "16",
                       "MODEL.MTLORA.ENABLED", "True"])
    assert c.TRAIN.BASE_LR == 1e-3
    assert c.DATA.BATCH_SIZE == 16
    assert c.MODEL.MTLORA.ENABLED is True


def test_flagship_config_normalization():
    cfg = load_config(
        os.path.join(CFG_DIR, "mtlora/tiny_448/mtlora_tiny_448_r64_scale4_pertask.yaml"),
        tasks=TASKS4)
    assert cfg.MODEL.NAME == "mtlora_tiny_448_r64_scale4_pertask"
    assert cfg.DATA.IMG_SIZE == 448
    m = cfg.MODEL.MTLORA
    assert m.ENABLED
    assert m.R == [64, 64, 64, 64]
    # SHARED_SCALE: [4.0] broadcast to 4 stages
    assert m.SHARED_SCALE == [4.0] * 4
    assert len(m.R_PER_TASK_LIST) == 4
    for stage in m.R_PER_TASK_LIST:
        assert stage["shared"] == 64
        for t in TASKS4:
            assert stage[t] == 4
    for stage in m.SCALE_PER_TASK_LIST:
        for t in TASKS4:
            assert stage[t] == 4.0
    # task config injected
    assert cfg.TASKS_CONFIG.ALL_TASKS.NUM_OUTPUT["semseg"] == 21
    assert cfg.TASKS_CONFIG.ALL_TASKS.NUM_OUTPUT["human_parts"] == 7
    assert cfg.MODEL.NUM_CLASSES == 0
    assert cfg.is_frozen()


def test_base_inheritance():
    cfg = load_config(
        os.path.join(CFG_DIR, "mtlora/tiny_448/mtlora_plus_tiny_448_r4_scale4.yaml"),
        tasks=TASKS4)
    # from base
    assert cfg.MODEL.SWIN.WINDOW_SIZE == 7
    assert cfg.MODEL.DROP_PATH_RATE == 0.2
    # overridden in variant
    assert cfg.MODEL.MTLORA.R == [4, 4, 4, 4]
    assert cfg.MODEL.MTLORA.DOWNSAMPLER_ENABLED is True
    # no per-task override -> broadcast from R
    for stage in cfg.MODEL.MTLORA.R_PER_TASK_LIST:
        assert stage["shared"] == 4 and stage["semseg"] == 4


def test_all_shipped_configs_parse():
    files = glob.glob(os.path.join(CFG_DIR, "**", "*.yaml"), recursive=True)
    files = [f for f in files if not os.path.basename(f).startswith("_")]
    assert len(files) >= 10
    for f in files:
        cfg = load_config(f, tasks=TASKS4)
        assert cfg.MODEL.SWIN.DEPTHS[0] == 2


@pytest.mark.skipif(not os.path.isdir(REF_CFG_DIR),
                    reason="reference configs not mounted")
def test_reference_yamls_parse_unchanged():
    """Public-surface requirement: the reference's own YAML files load."""
    files = glob.glob(os.path.join(REF_CFG_DIR, "**", "*.yaml"), recursive=True)
    assert len(files) >= 10
    for f in files:
        cfg = load_config(f, tasks=TASKS4)
        if cfg.MODEL.MTLORA.ENABLED:
            assert len(cfg.MODEL.MTLORA.R_PER_TASK_LIST) == 4


def test_swin_baseline_config():
    cfg = load_config(
        os.path.join(CFG_DIR, "swin/swin_tiny_patch4_window7_448.yaml"),
        tasks=TASKS4)
    assert not cfg.MODEL.MTLORA.ENABLED
    assert cfg.MODEL.NAME == "swin_tiny_patch4_window7_448"
