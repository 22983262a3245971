"""Per-task decode heads (NHWC, flax).

Rebuilds of the reference heads selected by ``get_head``
(models/swin_mtl.py:15-57):
  - ``hrnet``     -> HighResolutionHead (models/seg_hrnet.py:498-526), default
  - ``segformer`` -> SegFormerHead (models/segformer.py:54-111)
  - ``aspp``      -> DeepLabHead (models/aspp.py:19-94 multiscale /
                     models/aspp_single.py single-scale)
  - ``updecoder`` -> Decoder (models/updecoder.py:18-111)

All heads consume a list of 4 NHWC feature maps [B, H_s, W_s, C_s]
(1/8, 1/16, 1/32, 1/32 of input for the Swin-448 config) and emit logits
at the finest scale; the DecoderGroup resizes to image size.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# torch Conv2d/Linear default init (kaiming_uniform a=sqrt(5) ->
# U(+-1/sqrt(fan_in))), so training-from-scratch matches the reference's
# head initialization statistics.
torch_default_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(key, shape, dtype, fan_in):
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def resize_bilinear(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize, torch align_corners=False semantics."""
    B, H, W, C = x.shape
    if (H, W) == tuple(size):
        return x
    return jax.image.resize(x, (B, size[0], size[1], C), method="bilinear")


def _upcat(xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Upsample scales 1..3 to scale 0's resolution and concat channels
    (the shared prologue of every reference head)."""
    size = xs[0].shape[1:3]
    return jnp.concatenate(
        [xs[0]] + [resize_bilinear(x, size) for x in xs[1:]], axis=-1)


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 1
    dilation: int = 1
    use_bias: bool = True
    bn_momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = self.dilation * (self.kernel - 1) // 2
        fan_in = x.shape[-1] * self.kernel * self.kernel
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=pad, kernel_dilation=(self.dilation,) * 2,
                    use_bias=self.use_bias,
                    kernel_init=torch_default_kernel_init,
                    bias_init=functools.partial(torch_default_bias_init,
                                                fan_in=fan_in),
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class HighResolutionHead(nn.Module):
    """Default head: 1x1 conv expand (4x) + BN + ReLU + 1x1 predict
    (reference seg_hrnet.py:498-526).

    With ``use_pallas`` the whole chain runs as ONE fused VMEM kernel
    (ops/pallas_head.py): the [M, 4C] hidden never touches HBM, and the
    BN batch statistics come exactly from the input covariance (h is
    linear in x, so its moments are quadratic forms in x's moments) —
    computed differentiably outside the kernel so BN-training gradients
    are preserved. Parameter tree paths are identical to the module
    form (``expand/{conv,bn}``, ``pred``), so checkpoints interchange.
    """
    num_outputs: int
    dtype: Optional[jnp.dtype] = None
    use_pallas: bool = False
    bn_momentum: float = 0.9

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], *, train: bool = False):
        x = _upcat(xs)
        c = x.shape[-1]
        if self.use_pallas:
            from mtlora_tpu.ops.pallas_head import head_mlp_supported

            B, H, W, _ = x.shape
            if head_mlp_supported(B * H * W, c, self.num_outputs):
                return self._fused(x, train=train)
        x = ConvBNRelu(c * 4, kernel=1, dtype=self.dtype, name="expand")(
            x, train=train)
        return nn.Conv(self.num_outputs, (1, 1),
                       kernel_init=torch_default_kernel_init,
                       bias_init=functools.partial(
                           torch_default_bias_init, fan_in=x.shape[-1]),
                       dtype=self.dtype, name="pred")(x)

    def _fused(self, x, *, train: bool):
        from mtlora_tpu.ops.pallas_head import (
            bn_stats_from_x, fused_head_mlp)

        B, H, W, c = x.shape
        c4 = c * 4
        n = self.num_outputs
        ek, eb, bs, bb, rm, rv = _ConvBNParams(c, c4, name="expand")()
        pk, pb = _ConvParams(c4, n, name="pred")()
        cdt = self.dtype or x.dtype
        x2 = x.reshape(B * H * W, c).astype(cdt)
        ekc = ek.reshape(c, c4).astype(cdt)
        if train:
            mu, var = bn_stats_from_x(x2, ekc, eb)
            if hasattr(rm, "value"):
                rm.value = (self.bn_momentum * rm.value
                            + (1 - self.bn_momentum) * mu)
                rv.value = (self.bn_momentum * rv.value
                            + (1 - self.bn_momentum) * var)
        else:
            mu = jnp.asarray(rm.value, jnp.float32)
            var = jnp.asarray(rv.value, jnp.float32)
        inv = jax.lax.rsqrt(var + 1e-5)
        mul = (inv * bs)[None]
        add = (bb - mu * inv * bs)[None]
        interpret = jax.devices()[0].platform == "cpu"  # test path
        y = fused_head_mlp(x2, ekc, eb[None], mul, add,
                           pk.reshape(c4, n).astype(cdt), pb[None],
                           interpret)
        return y.reshape(B, H, W, n)


class SegFormerHead(nn.Module):
    """Per-scale linear embed -> resize -> fuse -> predict
    (reference segformer.py:54-111)."""
    num_outputs: int
    channels: int = 256
    dropout_ratio: float = 0.1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], *, train: bool = False):
        size = xs[0].shape[1:3]
        embeds = []
        # concat order [c4, c3, c2, c1] (reference segformer.py:105)
        for i in (3, 2, 1, 0):
            e = nn.Dense(self.channels, dtype=self.dtype,
                         name=f"linear_c{i + 1}")(xs[i])
            embeds.append(resize_bilinear(e, size))
        x = jnp.concatenate(embeds, axis=-1)
        x = ConvBNRelu(self.channels, kernel=1, use_bias=False,
                       dtype=self.dtype, name="linear_fuse")(x, train=train)
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        return nn.Conv(self.num_outputs, (1, 1), dtype=self.dtype,
                       name="linear_pred")(x)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference aspp.py:55-94)."""
    out_channels: int = 256
    rates: Tuple[int, ...] = (12, 24, 36)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        res = [ConvBNRelu(self.out_channels, kernel=1, use_bias=False,
                          dtype=self.dtype, name="conv1x1")(x, train=train)]
        for i, rate in enumerate(self.rates):
            res.append(ConvBNRelu(
                self.out_channels, kernel=3, dilation=rate, use_bias=False,
                dtype=self.dtype, name=f"atrous_{i}")(x, train=train))
        # global-pool branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBNRelu(self.out_channels, kernel=1, use_bias=False,
                       dtype=self.dtype, name="pool_conv")(g, train=train)
        res.append(jnp.broadcast_to(g, res[0].shape))
        x = jnp.concatenate(res, axis=-1)
        x = ConvBNRelu(self.out_channels, kernel=1, use_bias=False,
                       dtype=self.dtype, name="project")(x, train=train)
        return nn.Dropout(0.5, deterministic=not train)(x)


class DeepLabHead(nn.Module):
    """ASPP head (reference aspp.py:19-28 / aspp_single.py)."""
    num_outputs: int
    multiscale: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs, *, train: bool = False):
        x = _upcat(xs) if self.multiscale else (
            xs if not isinstance(xs, (list, tuple)) else xs[0])
        x = ASPP(dtype=self.dtype, name="aspp")(x, train=train)
        x = ConvBNRelu(256, kernel=3, use_bias=False, dtype=self.dtype,
                       name="fuse")(x, train=train)
        return nn.Conv(self.num_outputs, (1, 1), dtype=self.dtype,
                       name="pred")(x)


class UpDecoder(nn.Module):
    """3x stride-2 deconv stack + conv + 2x bilinear up
    (reference updecoder.py:18-61; num_deconv=3, filters 32, kernels 2)."""
    num_outputs: int
    num_filters: Tuple[int, ...] = (32, 32, 32)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], *, train: bool = False):
        x = _upcat(xs)
        for i, f in enumerate(self.num_filters):
            x = nn.ConvTranspose(f, (2, 2), strides=(2, 2), use_bias=False,
                                 dtype=self.dtype, name=f"deconv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"deconv_bn_{i}")(x)
            x = nn.relu(x)
        x = ConvBNRelu(self.num_outputs, kernel=3, dtype=self.dtype,
                       name="out_conv")(x, train=train)
        B, H, W, C = x.shape
        return jax.image.resize(x, (B, H * 4, W * 4, C), method="bilinear")


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's 1x1 param layout/init —
    declares the same tree paths the module form would, so checkpoints
    written by either form are interchangeable."""
    cin: int
    cout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_default_kernel_init,
                       (1, 1, self.cin, self.cout), jnp.float32)
        b = (self.param("bias",
                        functools.partial(torch_default_bias_init,
                                          fan_in=self.cin),
                        (self.cout,), jnp.float32)
             if self.use_bias else None)
        return k, b


class _BNParams(nn.Module):
    """Parameter/variable holder matching nn.BatchNorm's layout."""
    n: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.n,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.n,),
                       jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.n,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.n,), jnp.float32))
        return s, b, mean, var


class _ConvBNParams(nn.Module):
    """Parameter holder matching ConvBNRelu's `conv` + `bn` paths."""
    cin: int
    cout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k, b = _ConvParams(self.cin, self.cout, self.use_bias,
                           name="conv")()
        return (k, b) + _BNParams(self.cout, name="bn")()


class HRNetHeadParams(nn.Module):
    """Parameters of ONE HighResolutionHead (expand conv+bn, pred conv)
    under the exact module paths `expand/{conv,bn}` / `pred` — used by
    the task-batched head path (`batched_hrnet_heads`), which stacks the
    T heads' kernels and runs ONE einsum per layer instead of T
    sequential convs (reference runs a Python loop of per-task modules,
    models/swin_mtl.py:78-85)."""
    cin: int
    num_outputs: int

    @nn.compact
    def __call__(self):
        c4 = self.cin * 4
        ek, eb, bs, bb, rm, rv = _ConvBNParams(self.cin, c4,
                                               name="expand")()
        pk, pb = _ConvParams(c4, self.num_outputs, name="pred")()
        return dict(ek=ek, eb=eb, bs=bs, bb=bb, rm=rm, rv=rv,
                    pk=pk, pb=pb)


def batched_hrnet_heads(params, feats, num_outputs, *, train: bool,
                        bn_momentum: float = 0.9, dtype=None):
    """Task-batched HighResolutionHead forward.

    Args:
      params: list of T dicts from :class:`HRNetHeadParams`.
      feats: per scale ``[T, B, r_s, r_s, ch_s]`` stacked task features.
      num_outputs: per-task logit channel counts.
    Returns: list of T ``[B, r0, r0, n_t]`` logit maps (finest scale).

    Numerics match the per-task module path exactly: the 1x1 convs are
    the same contractions (stacked over T in one einsum), and the BN
    mirrors nn.BatchNorm (fp32 batch stats over (B, H, W), biased
    variance, running update ra = m*ra + (1-m)*batch).
    """
    T = feats[0].shape[0]
    size = feats[0].shape[2:4]
    # upcat, batched over (T, B)
    ups = [feats[0]]
    for f in feats[1:]:
        tb = f.shape[:2]
        ups.append(jax.image.resize(
            f, tb + size + f.shape[-1:], method="bilinear"))
    x = jnp.concatenate(ups, axis=-1)          # [T, B, r0, r0, C]
    Tn, B, r0, _, C = x.shape
    cdt = dtype or x.dtype
    x = x.reshape(T, B * r0 * r0, C).astype(cdt)

    # expand: ONE einsum over stacked [T, C, 4C] kernels. The [T, M, 4C]
    # hidden materializes ONCE in the compute dtype (an fp32 carry here
    # costs a ~7 GB round-trip at 448/batch-32 and was measured -7
    # img/s); BN statistics read it back with fp32 reductions exactly
    # like nn.BatchNorm does.
    ek = jnp.stack([p["ek"].reshape(C, 4 * C) for p in params])
    eb = jnp.stack([p["eb"] for p in params])
    h = jnp.einsum("tmc,tco->tmo", x, ek.astype(cdt),
                   preferred_element_type=jnp.float32)
    h = (h + eb[:, None]).astype(cdt)

    # batched per-task BatchNorm (fp32 stats, nn.BatchNorm semantics)
    if train:
        hf = h.astype(jnp.float32)
        mu = jnp.mean(hf, axis=1, keepdims=True)         # [T, 1, 4C]
        var = jnp.mean(jnp.square(hf), axis=1,
                       keepdims=True) - jnp.square(mu)
        for t, p in enumerate(params):
            if hasattr(p["rm"], "value"):
                p["rm"].value = (bn_momentum * p["rm"].value
                                 + (1 - bn_momentum) * mu[t, 0])
                p["rv"].value = (bn_momentum * p["rv"].value
                                 + (1 - bn_momentum) * var[t, 0])
    else:
        mu = jnp.stack([jnp.asarray(p["rm"].value) for p in params]
                       )[:, None]
        var = jnp.stack([jnp.asarray(p["rv"].value) for p in params]
                        )[:, None]
    bs = jnp.stack([p["bs"] for p in params])[:, None]
    bb = jnp.stack([p["bb"] for p in params])[:, None]
    # normalize in the compute dtype (scale/offset fold into one
    # mul+add pass; matches nn.BatchNorm's dtype behavior)
    mul = (jax.lax.rsqrt(var + 1e-5) * bs).astype(cdt)
    add = (bb - mu * jax.lax.rsqrt(var + 1e-5) * bs).astype(cdt)
    h = nn.relu(h * mul + add)                           # [T, M, 4C]

    # pred: per-task output widths are ragged; stack kernels padded to
    # n_max (zero pad; n pads to the 128-lane MXU tile regardless) and
    # slice per task
    n_max = max(num_outputs)
    pk = jnp.stack([
        jnp.pad(p["pk"].reshape(4 * C, -1),
                ((0, 0), (0, n_max - n)))
        for p, n in zip(params, num_outputs)])
    pb = jnp.stack([jnp.pad(p["pb"], (0, n_max - n))
                    for p, n in zip(params, num_outputs)])
    y = jnp.einsum("tmc,tcn->tmn", h, pk.astype(cdt),
                   preferred_element_type=jnp.float32)
    y = (y + pb[:, None]).astype(cdt)
    return [y[t, :, :n].reshape(B, r0, r0, n)
            for t, n in enumerate(num_outputs)]


def get_head(task: str, num_outputs: int, config, *, dtype=None,
             multiscale: bool = True,
             use_pallas: bool = False) -> nn.Module:
    """Head factory (reference models/swin_mtl.py:15-57)."""
    head_type = config.MODEL.DECODER_HEAD.get(task, "hrnet")
    if head_type == "hrnet":
        return HighResolutionHead(num_outputs=num_outputs, dtype=dtype,
                                  use_pallas=use_pallas,
                                  name=f"decoder_{task}")
    if head_type == "segformer":
        return SegFormerHead(num_outputs=num_outputs,
                             channels=config.MODEL.SEGFORMER_CHANNELS,
                             dtype=dtype, name=f"decoder_{task}")
    if head_type == "updecoder":
        return UpDecoder(num_outputs=num_outputs, dtype=dtype,
                         name=f"decoder_{task}")
    return DeepLabHead(num_outputs=num_outputs, multiscale=multiscale,
                       dtype=dtype, name=f"decoder_{task}")
