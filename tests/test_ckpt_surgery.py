"""Checkpoint key-surgery units: rel-pos bicubic resize, abs-pos resize,
22K->1K head remap, skip-decoder, backbone-prefix detection."""

import numpy as np
import pytest

from mtlora_tpu.ckpt.torch_convert import (
    convert_torch_state_dict,
    remap_22k_to_1k_head,
    resize_abs_pos_embed,
    resize_rel_pos_bias_table,
)


def test_rel_pos_resize_shapes():
    t = np.random.RandomState(0).randn(13 * 13, 3).astype(np.float32)
    out = resize_rel_pos_bias_table(t, (2 * 12 - 1) ** 2)  # w 7 -> 12
    assert out.shape == (23 * 23, 3)
    # identity when already matching
    same = resize_rel_pos_bias_table(t, 13 * 13)
    np.testing.assert_array_equal(same, t)


def test_rel_pos_resize_constant_preserved():
    t = np.full((13 * 13, 2), 3.25, np.float32)
    out = resize_rel_pos_bias_table(t, 23 * 23)
    np.testing.assert_allclose(out, 3.25, rtol=1e-5)


def test_abs_pos_resize():
    pe = np.random.RandomState(1).randn(1, 56 * 56, 96).astype(np.float32)
    out = resize_abs_pos_embed(pe, 112 * 112)
    assert out.shape == (1, 112 * 112, 96)


def test_22k_head_remap(tmp_path):
    k = np.arange(12, dtype=np.float32).reshape(3, 4)  # [in=3, out22k=4]
    b = np.arange(4, dtype=np.float32)
    mapf = tmp_path / "map.txt"
    mapf.write_text("2\n-1\n0\n")
    ok, ob = remap_22k_to_1k_head(k, b, str(mapf))
    assert ok.shape == (3, 3)
    np.testing.assert_array_equal(ok[:, 0], k[:, 2])
    np.testing.assert_array_equal(ok[:, 1], 0)
    np.testing.assert_array_equal(ok[:, 2], k[:, 0])
    np.testing.assert_array_equal(ob, [b[2], 0, b[0]])


def _tiny_sd():
    r = np.random.RandomState(0)
    return {
        "patch_embed.proj.weight": r.randn(24, 3, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": r.randn(24).astype(np.float32),
        "patch_embed.norm.weight": r.randn(24).astype(np.float32),
        "patch_embed.norm.bias": r.randn(24).astype(np.float32),
        "layers.0.blocks.0.attn.qkv.weight":
            r.randn(72, 24).astype(np.float32),
        "layers.0.blocks.0.attn.relative_position_bias_table":
            r.randn(49, 2).astype(np.float32),  # window 4
        "layers.0.blocks.0.attn.relative_position_index":
            np.zeros((16, 16), np.int64),
        "layers.0.blocks.0.attn_mask": np.zeros((4, 16, 16), np.float32),
        "head.weight": r.randn(10, 24).astype(np.float32),
    }


def test_backbone_only_checkpoint_gets_prefix_and_skips_buffers():
    conv = convert_torch_state_dict(_tiny_sd(), [])
    p = conv["params"]
    assert "backbone" in p
    bb = p["backbone"]
    assert bb["patch_embed"]["proj"]["kernel"].shape == (4, 4, 3, 24)
    assert "kernel" in bb["layers_0"]["blocks_0"]["attn"]["qkv"]
    # buffers and the classification head are dropped
    flat = str(p)
    assert "attn_mask" not in flat
    assert "relative_position_index" not in flat


def test_window_size_retarget():
    conv = convert_torch_state_dict(_tiny_sd(), [], target_window_size=7)
    tbl = conv["params"]["backbone"]["layers_0"]["blocks_0"]["attn"][
        "relative_position_bias_table"]
    assert tbl.shape == (13 * 13, 2)


def test_22k_head_remap_end_to_end():
    """Fabricated 21841-class head through convert_torch_state_dict with
    the vendored map file (reference utils.py:250-263 +
    data/map22kto1k.txt)."""
    from mtlora_tpu.ckpt.torch_convert import DEFAULT_MAP22K

    r = np.random.RandomState(3)
    sd = _tiny_sd()
    sd["head.weight"] = r.randn(21841, 24).astype(np.float32)
    sd["head.bias"] = r.randn(21841).astype(np.float32)
    conv = convert_torch_state_dict(sd, [], num_classes=1000)
    head = conv["params"]["backbone"]["head"]
    assert head["kernel"].shape == (24, 1000)
    assert head["bias"].shape == (1000,)
    with open(DEFAULT_MAP22K) as f:
        idx = [int(line.strip()) for line in f if line.strip()]
    assert len(idx) == 1000
    np.testing.assert_array_equal(np.asarray(head["kernel"]),
                                  sd["head.weight"][idx].T)
    np.testing.assert_array_equal(np.asarray(head["bias"]),
                                  sd["head.bias"][idx])


def test_head_kept_zeroed_or_dropped():
    sd = _tiny_sd()
    sd["head.bias"] = np.arange(10, dtype=np.float32)
    # matching class count: transposed through
    conv = convert_torch_state_dict(sd, [], num_classes=10)
    head = conv["params"]["backbone"]["head"]
    np.testing.assert_array_equal(np.asarray(head["kernel"]),
                                  sd["head.weight"].T)
    # mismatch (not the 22K case): zero re-init (utils.py:264-269)
    conv = convert_torch_state_dict(sd, [], num_classes=5)
    head = conv["params"]["backbone"]["head"]
    assert head["kernel"].shape == (24, 5)
    np.testing.assert_array_equal(np.asarray(head["kernel"]), 0)
    # MTL mode (num_classes=0): dropped entirely
    conv = convert_torch_state_dict(sd, [])
    assert "head" not in conv["params"].get("backbone", {})


def test_strip_backbone_prefix():
    from mtlora_tpu.ckpt.torch_convert import strip_backbone_prefix

    conv = convert_torch_state_dict(_tiny_sd(), [], num_classes=10)
    bare = strip_backbone_prefix(conv)
    assert "patch_embed" in bare["params"]
    assert "head" in bare["params"]
    assert "backbone" not in bare["params"]


def test_skip_decoder():
    sd = _tiny_sd()
    sd = {"backbone." + k: v for k, v in sd.items()}
    sd["decoders.decoders.semseg.last_layer.0.weight"] = \
        np.zeros((8, 4, 1, 1), np.float32)
    conv = convert_torch_state_dict(sd, ["semseg"], skip_decoder=True)
    assert "decoder_semseg" not in conv["params"]
    conv2 = convert_torch_state_dict(sd, ["semseg"], skip_decoder=False)
    assert "decoder_semseg" in conv2["params"]
