"""Fused window-attention kernel vs pure-jnp reference (the reference's
kernel test pattern, kernels/window_process/unit_test.py: fused vs naive
composition, forward and backward, multiple dtypes — here in Pallas
interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mtlora_tpu.ops.attention import (
    relative_position_index,
    shift_attention_mask,
    window_attention,
)
from mtlora_tpu.ops.pallas_window_attn import fused_window_attention
from mtlora_tpu.ops.window import (
    shift_window_partition,
    window_merge_unshift,
)


def reference_path(qkv_map, num_heads, rel_bias, ws, shift, mask):
    B, H, W, C3 = qkv_map.shape
    C = C3 // 3
    qkv_w = shift_window_partition(qkv_map, ws, shift).reshape(
        -1, ws * ws, C3)
    out = window_attention(qkv_w, num_heads, rel_bias, mask)
    return window_merge_unshift(out.reshape(-1, ws, ws, C), ws, shift,
                                H, W, (B,)).reshape(B, H, W, C)


def make_case(seed, B=2, H=16, W=16, C=48, heads=4, ws=4, shift=0,
              dtype=jnp.float32):
    r = np.random.RandomState(seed)
    qkv = jnp.asarray(r.randn(B, H, W, 3 * C), dtype)
    table = jnp.asarray(r.randn((2 * ws - 1) ** 2, heads) * 0.1,
                        jnp.float32)
    idx = relative_position_index(ws)
    bias = table[idx.reshape(-1)].reshape(ws * ws, ws * ws,
                                          heads).transpose(2, 0, 1)
    mask = (jnp.asarray(shift_attention_mask(H, W, ws, shift))
            if shift else None)
    return qkv, bias, mask


@pytest.mark.parametrize("shift", [0, 2])
def test_fused_matches_reference_fwd(shift):
    qkv, bias, mask = make_case(0, shift=shift)
    ref = reference_path(qkv, 4, bias, 4, shift, mask)
    out = fused_window_attention(qkv, 4, bias, 4, shift, mask,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shift", [0, 2])
def test_fused_matches_reference_grad(shift):
    qkv, bias, mask = make_case(1, shift=shift)

    def loss_ref(qkv, bias):
        o = reference_path(qkv, 4, bias, 4, shift, mask)
        return jnp.sum(o * jnp.cos(o))

    def loss_fused(qkv, bias):
        o = fused_window_attention(qkv, 4, bias, 4, shift, mask,
                                   interpret=True)
        return jnp.sum(o * jnp.cos(o))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    g_fused = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(g_fused[0]),
                               np.asarray(g_ref[0]), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_fused[1]),
                               np.asarray(g_ref[1]), atol=2e-4, rtol=1e-4)


def test_fused_bf16_close():
    qkv, bias, mask = make_case(2, dtype=jnp.bfloat16)
    ref = reference_path(qkv, 4, bias, 4, 0, None)
    out = fused_window_attention(qkv, 4, bias, 4, 0, None, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)


def test_fused_uneven_heads_channels():
    # swin-tiny stage0 geometry: C=96, heads=3, ws=7, H=W=28
    qkv, bias, mask = make_case(3, B=1, H=28, W=28, C=96, heads=3, ws=7,
                                shift=3)
    mask = jnp.asarray(shift_attention_mask(28, 28, 7, 3))
    ref = reference_path(qkv, 3, bias, 7, 3, mask)
    out = fused_window_attention(qkv, 3, bias, 7, 3, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shift", [0, 3])
@pytest.mark.parametrize("geom", [
    (2, 28, 28, 24, 3),   # nw2 % 4 == 0: per-image mask periods
    (2, 14, 14, 16, 4),   # 4 % nw2 == 0: mask tiles across images
    (8, 14, 14, 16, 2),   # no-mask cells span images
])
def test_dense_mode_matches_reference(shift, geom, monkeypatch):
    """With MTLORA_ATTN_DENSE=1, bf16 ws=7 routes through the dense
    392-row cells (4 window-pairs reshaped FREELY from the flat layout;
    `_fused_windows_dense`) — cover both mask tilings, fwd + dqkv +
    dbias. Default is OFF (measured ~1 img/s slower end-to-end); the
    path stays equality-gated for future layout work."""
    monkeypatch.setenv("MTLORA_ATTN_DENSE", "1")
    B, H, W, C, heads = geom
    qkv, bias, _ = make_case(11, B=B, H=H, W=W, C=C, heads=heads, ws=7,
                             shift=shift, dtype=jnp.bfloat16)
    mask = (jnp.asarray(shift_attention_mask(H, W, 7, shift))
            if shift else None)
    ref = reference_path(qkv, heads, bias, 7, shift, mask)
    out = fused_window_attention(qkv, heads, bias, 7, shift, mask,
                                 interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)

    def loss_fused(qkv, bias):
        o = fused_window_attention(qkv, heads, bias, 7, shift, mask,
                                   interpret=True)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    def loss_ref(qkv, bias):
        o = reference_path(qkv, heads, bias, 7, shift, mask)
        return jnp.sum(jnp.sin(o.astype(jnp.float32)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(
        np.asarray(g_fused[0], np.float32),
        np.asarray(g_ref[0], np.float32), atol=5e-2, rtol=5e-2)
    np.testing.assert_allclose(
        np.asarray(g_fused[1], np.float32),
        np.asarray(g_ref[1], np.float32), atol=2e-2, rtol=2e-2)


def test_merge2x2_cat_matches_strided_slices():
    """PatchMerging's transpose-based 2x2 gather must reproduce the
    reference x0/x1/x2/x3 strided-slice+concat order
    (swin_transformer_mtlora.py:451-455), fwd and VJP."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mtlora_tpu.ops.window import merge2x2_cat

    B, H, W, C = 2, 8, 6, 5
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H * W, C), jnp.float32)

    def ref(x):
        xi = x.reshape(B, H, W, C)
        return jnp.concatenate(
            [xi[:, 0::2, 0::2], xi[:, 1::2, 0::2],
             xi[:, 0::2, 1::2], xi[:, 1::2, 1::2]],
            axis=-1).reshape(B, -1, 4 * C)

    got = merge2x2_cat(x, H, W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(x)))

    g = jnp.asarray(rs.randn(*got.shape), jnp.float32)
    gk = jax.grad(lambda x: jnp.sum(merge2x2_cat(x, H, W) * g))(x)
    gr = jax.grad(lambda x: jnp.sum(ref(x) * g))(x)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr))


# ------------------------------------------------------ padded pack-2 path
def padded_path(qkv_map, num_heads, rel_bias, ws, shift, mask,
                interpret=True):
    """The model's pad-104 route: padded partition -> padded kernel ->
    padded merge (swin.py WindowAttention pad2 branch)."""
    from mtlora_tpu.ops.pallas_window_attn import (
        fused_window_attention_padded)
    from mtlora_tpu.ops.window import (
        npad2, shift_window_partition_pad2, window_merge_unshift_pad2)
    B, H, W, C3 = qkv_map.shape
    C = C3 // 3
    nw = (H // ws) * (W // ws)
    npairs = nw // 2
    npad = npad2(ws)
    xp = shift_window_partition_pad2(
        qkv_map.reshape(B, H * W, C3), H, W, ws, shift)
    qkv_p = xp.reshape(B * npairs, npad, C3)
    out = fused_window_attention_padded(
        qkv_p, num_heads, rel_bias, npairs, mask, interpret=interpret)
    return window_merge_unshift_pad2(
        out.reshape(B, npairs * npad, C), H, W, ws, shift).reshape(
        B, H, W, C)


@pytest.mark.parametrize("shift", [0, 2])
def test_padded_matches_reference_fwd(shift):
    """ws=5 -> pack-2 rows 50 pad to 56: real pad slots exercised
    (pad keys masked, pad query rows dropped by the merge)."""
    qkv, bias, mask = make_case(7, B=2, H=20, W=20, C=48, heads=4, ws=5,
                                shift=shift)
    ref = reference_path(qkv, 4, bias, 5, shift, mask)
    out = padded_path(qkv, 4, bias, 5, shift, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shift", [0, 2])
def test_padded_matches_reference_grad(shift):
    """dqkv through both padded permutes' custom VJPs (exact zeros at
    pad slots are load-bearing) + dbias through _pad2_bias's scatter."""
    qkv, bias, mask = make_case(8, B=2, H=20, W=20, C=48, heads=4, ws=5,
                                shift=shift)

    def loss_ref(qkv, bias):
        o = reference_path(qkv, 4, bias, 5, shift, mask)
        return jnp.sum(o * jnp.cos(o))

    def loss_pad(qkv, bias):
        o = padded_path(qkv, 4, bias, 5, shift, mask)
        return jnp.sum(o * jnp.cos(o))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    g_pad = jax.grad(loss_pad, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(g_pad[0]),
                               np.asarray(g_ref[0]), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_pad[1]),
                               np.asarray(g_ref[1]), atol=2e-4, rtol=1e-4)


def test_padded_flagship_geometry_bf16():
    """ws=7 pack-2 -> 104 rows, swin-tiny stage-0 channel geometry."""
    qkv, bias, _ = make_case(9, B=1, H=28, W=28, C=96, heads=3, ws=7,
                             shift=3, dtype=jnp.bfloat16)
    mask = jnp.asarray(shift_attention_mask(28, 28, 7, 3))
    ref = reference_path(qkv, 3, bias, 7, 3, mask)
    out = padded_path(qkv, 3, bias, 7, 3, mask)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=3e-2, rtol=3e-2)
