"""Swin Transformer backbone with MTLoRA adapters (TPU-native).

Rebuild of reference ``models/swin_transformer_mtlora.py`` (and, with
``MTLoRASpec(enabled=False)``, of the vanilla ``models/swin_transformer.py``
used by the full-fine-tune / frozen-backbone baselines).

Design differences from the reference (torch):
  - Per-task feature streams are a stacked ``[T, B, L, C]`` array, not a
    ``{task: tensor}`` dict; all per-task compute is batched over T.
  - NHWC layout end to end; window shift/partition are fused layout
    transforms (``mtlora_tpu.ops.window``) that XLA folds into neighbors
    — the TPU equivalent of the reference's fused CUDA window kernel.
  - Attention mask / relative-position index are trace-time numpy
    constants; everything is static-shape and jit-safe.

Structural contract preserved (reference file:line):
  - qkv adapters never have task branches (swin_transformer_mtlora.py:166)
  - proj/fc1/fc2 carry task branches only on the LAST block of a stage
    unless INTERMEDIATE_SPECIALIZATION (:531, :53, :174)
  - task streams do not propagate across blocks; within a block the attn
    task streams feed the MLP's fc1/fc2 (:395-408)
  - PatchMerging is applied to the shared AND every task stream (:546-550)
  - stages without adapters broadcast shared features per task (:744-745)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mtlora_tpu.models.lora import (
    DeferredTasks,
    FactoredTasks,
    LoRASpec,
    MTLoRALinear,
    MTLoRASpec,
    TaskStream,
    droppath_coef,
    expand_factored_tasks,
    expand_task_streams,
)
from mtlora_tpu.ops.attention import (
    relative_position_index,
    shift_attention_mask,
    window_attention,
)
from mtlora_tpu.ops.pallas_window_attn import (
    fused_window_attention_padded,
    fused_window_attention_windowed,
)
from mtlora_tpu.ops.window import (
    npad2,
    shift_window_partition,
    shift_window_partition_pad2,
    window_merge_unshift,
    window_merge_unshift_pad2,
)

_NO_LORA = LoRASpec(r_shared=0)


def _manual_ln(x, gamma, beta, eps: float = 1e-5):
    """nn.LayerNorm numerics as a function (fp32 statistics) — used when
    a block carries LN parameters for the fused LN+GEMM kernel but a
    particular consumer cannot fuse."""
    if x is None:
        return None
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = (x32 * x32).mean(-1, keepdims=True) - mu * mu
    out = ((x32 - mu) * jax.lax.rsqrt(var + eps)
           * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    return out.astype(x.dtype)


def _ln_fusible(spec: LoRASpec, mtlora: MTLoRASpec, lora_on: bool,
                M: int, C: int, O: int, dtype,
                deterministic: bool = True) -> bool:
    """Can a pre-norm input fuse into this MTLoRALinear via
    ops/pallas_ln_lora.py?"""
    from mtlora_tpu.ops.pallas_ln_lora import ln_lora_supported

    # The in-kernel dropout mask comes from the Mosaic PRNG, which has
    # no CPU interpreter: train-mode dropout on a CPU host routes to the
    # manual-LN unfused path instead of failing inside the kernel.
    if (spec.dropout > 0.0 and not deterministic
            and jax.default_backend() == "cpu"):
        return False
    # VMEM: the kernel holds the full [C, O] weight, and the backward's
    # gelu-recompute path additionally needs ~4 fp32 [Mb, O] buffers
    # (measured: C=1024/O=4096 bf16 act-bwd wants 17.5 MB vs the 16 MB
    # scoped-vmem limit — Swin-B fc1 must fall back). fp32 runs
    # HIGHEST-precision multi-pass matmuls (~3x weight scratch).
    from mtlora_tpu.ops.pallas_ln_lora import _row_block

    itemsize = 2 if dtype == jnp.bfloat16 else 4
    passes = 1 if itemsize == 2 else 3
    mb = _row_block(M, C, O) or 128
    if (C * O * itemsize * passes
            + 4 * mb * max(C, O) * 4) > (14 << 20):
        return False
    return (lora_on and spec.r_shared > 0
            and spec.shared_mode == "matrix"
            and not spec.trainable_scale_shared
            and not spec.shared_merged
            and mtlora.freeze_pretrained
            and ln_lora_supported(M, C, O))


def _ln_mlp_fusible(spec: LoRASpec, freeze_pretrained: bool, M: int,
                    C: int, H4: int, dtype,
                    deterministic: bool = True) -> bool:
    """Can a no-task block's whole norm2->fc1->gelu->fc2 chain run as
    ONE kernel (ops/pallas_ln_mlp.py)? Mirrors `_ln_fusible`'s spec
    gates; the VMEM budget covers BOTH weight matrices, the four
    fp32 adapter-grad accumulators, and ~8 fp32 [Mb, H4] row buffers
    in the recompute backward."""
    if (spec.dropout > 0.0 and not deterministic
            and jax.default_backend() == "cpu"):
        return False  # Mosaic PRNG has no CPU interpreter
    from mtlora_tpu.ops.pallas_ln_mlp import ln_mlp_supported
    from mtlora_tpu.ops.pallas_ln_lora import _row_block

    itemsize = 2 if dtype == jnp.bfloat16 else 4
    passes = 1 if itemsize == 2 else 3
    mb = _row_block(M, C, H4) or 128
    r = spec.r_shared
    weights = 2 * C * H4 * itemsize * passes
    accums = 4 * (2 * (C * r + r * H4))
    rows = 8 * mb * max(C, H4) * 4
    if weights + accums + rows > (48 << 20):
        return False
    return (r > 0 and spec.shared_mode == "matrix"
            and not spec.trainable_scale_shared
            and not spec.shared_merged
            and freeze_pretrained
            and ln_mlp_supported(M, C, H4))


def _drop_seed(module, spec: LoRASpec, deterministic: bool):
    """int32 [2] PRNG seeds for the in-kernel dropout masks (seed[0]:
    LN-input dropout; seed[1]: the optional dropped second output)."""
    if spec.dropout > 0.0 and not deterministic:
        return jax.random.randint(module.make_rng("dropout"), (2,), 0,
                                  2 ** 31 - 1, dtype=jnp.int32)
    return jnp.zeros((2,), jnp.int32)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        # mask over all leading (batch-like) dims, broadcast over (L, C)
        shape = x.shape[:-2] + (1, 1)
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(self.make_rng("droppath"), keep, shape)
        # reciprocal-multiply (divide is ~60% of multiply bandwidth)
        return jnp.where(mask, x * (1.0 / keep), 0.0)


class Mlp(nn.Module):
    """Transformer MLP with MTLoRA task threading (reference Mlp:44-81)."""
    in_features: int
    hidden_features: int
    spec: LoRASpec
    fc1_tasks: bool
    fc2_tasks: bool
    drop: float = 0.0
    freeze_pretrained: bool = False
    use_pallas: bool = False
    use_pallas_gemm: bool = False
    use_pallas_adapter: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_tasks=None, *, deterministic: bool = True,
                 ln2=None, mtlora: MTLoRASpec = MTLoRASpec(),
                 factored_out: bool = False):
        """``ln2=(gamma, beta)``: ``x``/``x_tasks`` are PRE-norm and
        norm2 fuses into fc1's GEMMs when eligible. ``factored_out``:
        when the fused adapter path is active, return the task output as
        a :class:`FactoredTasks` for the caller to expand once."""
        fc1 = MTLoRALinear(self.in_features, self.hidden_features,
                           spec=self.spec, has_tasks=self.fc1_tasks,
                           freeze_pretrained=self.freeze_pretrained,
                           use_pallas=self.use_pallas_gemm,
                           dtype=self.dtype, name="fc1")
        fc2 = MTLoRALinear(self.hidden_features, self.in_features,
                           spec=self.spec, has_tasks=self.fc2_tasks,
                           freeze_pretrained=self.freeze_pretrained,
                           use_pallas=self.use_pallas_gemm,
                           dtype=self.dtype, name="fc2")
        drop = nn.Dropout(self.drop, deterministic=deterministic)

        # Fused adapter path: route the per-task fc1->gelu->fc2 chain
        # through the Pallas kernel so the [T, ..., hidden] task tensor
        # stays in VMEM (ops/pallas_adapter_mlp.py). Valid when both fc
        # layers carry task adapters, 'matrix' shared mode, static task
        # scales, and no hidden dropout is active.
        fused = (self.use_pallas_adapter and self.fc1_tasks
                 and self.fc2_tasks and len(self.spec.r_tasks) > 0
                 and max(self.spec.r_tasks) > 0
                 and self.spec.shared_mode == "matrix"
                 and not self.spec.trainable_scale_per_task
                 and (self.drop == 0.0 or deterministic))

        if ln2 is not None:
            gamma2, beta2 = ln2
            M = 1
            for d in x.shape[:-1]:
                M *= d
            # whole-MLP fusion for no-task blocks: norm2 -> fc1 -> gelu
            # -> fc2 (shared adapters on both) as ONE kernel; the
            # [M, hidden] tensor never touches HBM
            # (ops/pallas_ln_mlp.py)
            if (not self.fc1_tasks and not self.fc2_tasks
                    and (self.drop == 0.0 or deterministic)
                    and _ln_mlp_fusible(
                        self.spec, self.freeze_pretrained, M,
                        self.in_features, self.hidden_features,
                        self.dtype or x.dtype, deterministic)):
                from mtlora_tpu.ops.pallas_ln_mlp import fused_ln_mlp

                k1, bi1, A1, B1 = fc1(x, params_only=True)
                k2, bi2, A2, B2 = fc2(x, params_only=True)
                seed = _drop_seed(self, self.spec, deterministic)
                dtype = self.dtype or x.dtype
                lead = x.shape[:-1]
                x2 = x.astype(dtype).reshape(-1, self.in_features)
                drop_rate = (float(self.spec.dropout)
                             if (self.spec.dropout > 0.0
                                 and not deterministic) else 0.0)
                interp = jax.default_backend() == "cpu"
                y2 = fused_ln_mlp(
                    x2, gamma2.astype(dtype), beta2.astype(dtype),
                    k1.astype(dtype), bi1.astype(dtype),
                    A1.astype(dtype), B1.astype(dtype),
                    k2.astype(dtype), bi2.astype(dtype),
                    A2.astype(dtype), B2.astype(dtype), seed,
                    float(self.spec.shared_scale),
                    float(self.spec.shared_scale), drop_rate,
                    interpret=interp)
                return y2.reshape(lead + (self.in_features,)), None
            # LN->fc1 fusion needs the factored task path (or no tasks):
            # _ln_fused has no materialized-task form
            ln_ok = (_ln_fusible(self.spec, mtlora, True, M,
                                 self.in_features, self.hidden_features,
                                 self.dtype or x.dtype, deterministic)
                     and (fused or not self.fc1_tasks))
            if ln_ok:
                seed = _drop_seed(self, self.spec, deterministic)
                # task streams pass RAW: the fc1 factored path folds the
                # LayerNorm into its rank-r A-projection (lora.py
                # _ln_fused), so LN(x_tasks) never materializes
                xt_n = x_tasks if fused else None
                # fc2's shared-adapter branch needs dropout(gelu(fc1));
                # emit it as a SECOND kernel output (second PRNG
                # stream) — otherwise that where() runs as a standalone
                # full-tensor pass (cannot fuse into a pallas output).
                # Invalid if the hidden nn.Dropout is active (fc2's
                # input would be re-dropped).
                want_xd = (self.spec.dropout > 0.0 and not deterministic
                           and (self.drop == 0.0 or deterministic))
                # gelu applies INSIDE the kernel (ln_act): elementwise
                # consumers cannot fuse into a pallas output, so an
                # outside gelu costs a full extra pass over [M, 4C]
                res = fc1(x, xt_n, deterministic=deterministic,
                          factored_tasks=fused,
                          ln_params=(gamma2, beta2, seed), ln_act=True,
                          out_drop=want_xd)
                if want_xd:
                    x, t, xd = res
                else:
                    (x, t), xd = res, None
                x = drop(x)
                if fused and t is not None:
                    x, t = fc2(x, None, task_factored=t,
                               deterministic=deterministic,
                               x_dropped=xd,
                               factored_tasks=factored_out)
                else:
                    if t is not None:
                        t = drop(jax.nn.gelu(t, approximate=False))
                    x, t = fc2(x, t, deterministic=deterministic,
                               x_dropped=xd)
                x = drop(x)
                if t is not None and not isinstance(t, FactoredTasks):
                    t = drop(t)
                return x, t
            else:
                x, t = fc1(_manual_ln(x, gamma2, beta2),
                           _manual_ln(x_tasks, gamma2, beta2),
                           deterministic=deterministic,
                           factored_tasks=fused)
        else:
            x, t = fc1(x, x_tasks, deterministic=deterministic,
                       factored_tasks=fused)
        x = drop(jax.nn.gelu(x, approximate=False))
        if fused and t is not None:
            # gelu on the task hidden happens inside the fused kernel
            x, t = fc2(x, None, task_factored=t,
                       deterministic=deterministic,
                       factored_tasks=factored_out)
        else:
            if t is not None:
                t = drop(jax.nn.gelu(t, approximate=False))
            x, t = fc2(x, t, deterministic=deterministic)
        x = drop(x)
        if t is not None and not isinstance(t, FactoredTasks):
            t = drop(t)
        return x, t


class WindowAttention(nn.Module):
    """W-MSA with relative position bias + MTLoRA on qkv/proj
    (reference WindowAttention:119-227).

    TPU layout redesign: the reference computes qkv/proj on the windowed
    [B*nW, 49, C] layout (tiny per-window GEMMs). Since qkv/proj are
    per-token linear maps they commute with the window partition, so here
    they run on the flat token layout [B, L, C] — one large MXU-saturating
    GEMM — and only the attention core touches the window layout. The
    caller passes token-layout x plus (H, W, shift); numerics are
    unchanged (verified by the torch parity suite).
    """
    dim: int
    window_size: int
    num_heads: int
    spec: LoRASpec
    qkv_lora: bool          # QKV_ENABLED (shared-only adapters)
    proj_lora: bool         # PROJ_ENABLED
    proj_tasks: bool        # proj produces per-task streams
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_pallas: bool = False
    use_pallas_gemm: bool = False
    freeze_pretrained: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, hw: Tuple[int, int], shift: int,
                 shift_mask=None, *, deterministic: bool = True,
                 ln1=None, mtlora: MTLoRASpec = MTLoRASpec(),
                 factored_tasks: bool = False):
        """``ln1=(gamma, beta)``: ``x`` is PRE-norm and norm1 fuses into
        the qkv GEMM when eligible (falls back to a manual LN).
        ``factored_tasks``: return proj's per-task output as a
        :class:`FactoredTasks` (rank space) instead of materialized
        [T, ..., C] streams; the caller expands once."""
        H, W = hw
        B, L, C = x.shape
        ws = self.window_size
        N = ws * ws
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02, lower=-2, upper=2),
            ((2 * ws - 1) ** 2, self.num_heads), jnp.float32)
        rel_idx = relative_position_index(ws)  # static [N, N]
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(
            N, N, self.num_heads).transpose(2, 0, 1)  # [nH, N, N]

        qkv = MTLoRALinear(
            self.dim, self.dim * 3,
            spec=self.spec if self.qkv_lora else _NO_LORA,
            has_tasks=False, use_bias=self.qkv_bias,
            freeze_pretrained=self.freeze_pretrained,
            use_pallas=self.use_pallas_gemm,
            dtype=self.dtype, name="qkv")
        proj = MTLoRALinear(
            self.dim, self.dim,
            spec=self.spec if self.proj_lora else _NO_LORA,
            has_tasks=self.proj_tasks,
            freeze_pretrained=self.freeze_pretrained,
            use_pallas=self.use_pallas_gemm,
            dtype=self.dtype, name="proj")

        # Permute the INPUT into windowed token order before the qkv
        # GEMM: LN and the qkv projection are per-token, so they commute
        # with the window partition, and permuting the C-wide input
        # costs 1/3 the layout traffic of permuting the 3C-wide qkv
        # output (the reference CUDA kernel permutes the full qkv,
        # swin_window_process_kernel.cu:42-67). The qkv output is then
        # born in window order and feeds the attention core directly.
        #
        # Kernel route: the partition emits the PADDED pack-2 order
        # (window pairs padded 2*ws*ws -> NPAD2 sublane-aligned rows) so
        # the [B, Lp, C] <-> [B*npairs, NPAD2, *] reshapes at the kernel
        # boundary are free bitcasts instead of HBM repacks; the qkv
        # GEMM pays the ~6% pad rows, the attention kernel's MXU cost is
        # unchanged (it padded the rows internally anyway), outputs are
        # bit-identical (tools/pad_probe.py).
        nw = (H // ws) * (W // ws)
        attn_dropping = self.attn_drop > 0 and not deterministic
        use_fused = self.use_pallas and not attn_dropping
        pad2 = use_fused and nw % 2 == 0 and 2 * N <= 128
        if pad2:
            npairs = nw // 2
            npad = npad2(ws)
            xw = shift_window_partition_pad2(x, H, W, ws, shift)
        else:
            xw = shift_window_partition(
                x.reshape(B, H, W, C), ws, shift).reshape(B, L, C)
        Lw = xw.shape[1]
        if ln1 is not None:
            gamma1, beta1 = ln1
            if _ln_fusible(self.spec, mtlora, self.qkv_lora,
                           B * Lw, C, 3 * C, self.dtype or x.dtype,
                           deterministic):
                seed = _drop_seed(self, self.spec, deterministic)
                qkv_out, _ = qkv(xw, deterministic=deterministic,
                                 ln_params=(gamma1, beta1, seed))
            else:
                qkv_out, _ = qkv(_manual_ln(xw, gamma1, beta1),
                                 deterministic=deterministic)
        else:
            qkv_out, _ = qkv(xw, deterministic=deterministic)  # windowed
        interp = jax.default_backend() == "cpu"
        if pad2:
            qkv_w = qkv_out.reshape(B * npairs, npad, 3 * C)  # free
            attn_out = fused_window_attention_padded(
                qkv_w, self.num_heads, rel_bias, npairs, shift_mask,
                scale=self.qk_scale, interpret=interp)
            attn_tok = window_merge_unshift_pad2(
                attn_out.reshape(B, npairs * npad, C), H, W, ws,
                shift)  # [B, L, C]
        else:
            qkv_w = qkv_out.reshape(B * nw, N, 3 * C)
            if use_fused:
                attn_out = fused_window_attention_windowed(
                    qkv_w, self.num_heads, rel_bias, nw, shift_mask,
                    scale=self.qk_scale, interpret=interp)
            else:
                drop_rng = (self.make_rng("dropout")
                            if attn_dropping else None)
                attn_out = window_attention(
                    qkv_w, self.num_heads, rel_bias, shift_mask,
                    scale=self.qk_scale,
                    dropout_rate=(0.0 if deterministic
                                  else self.attn_drop),
                    dropout_rng=drop_rng)  # [B*nW, N, C]
            attn_tok = window_merge_unshift(
                attn_out.reshape(-1, ws, ws, C), ws, shift, H, W,
                (B,)).reshape(B, L, C)
        y, y_tasks = proj(attn_tok, deterministic=deterministic,
                          factored_tasks=factored_tasks and
                          self.proj_tasks)
        pdrop = nn.Dropout(self.proj_drop, deterministic=deterministic)
        y = pdrop(y)
        if y_tasks is not None and not factored_tasks:
            y_tasks = pdrop(y_tasks)
        return y, y_tasks


class SwinBlock(nn.Module):
    """One Swin block: (S)W-MSA + MLP with task-stream production
    (reference SwinTransformerBlock:246-408)."""
    dim: int
    input_resolution: Tuple[int, int]
    num_heads: int
    spec: LoRASpec
    mtlora: MTLoRASpec
    produce_tasks: bool      # last-block-of-stage or intermediate spec.
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_pallas: bool = False
    use_pallas_gemm: bool = False
    use_pallas_adapter: bool = False
    use_pallas_ln: bool = False
    # hand the stage-final task streams to PatchMerging UNEXPANDED
    # (DeferredTasks) for the fused factored-task merge kernel
    defer_expand: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # NOTE: `deterministic` is positional (not keyword-only) so
        # nn.remat can mark it static (static_argnums) in BasicLayer.
        H, W = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(H, W) <= ws:
            ws, shift = min(H, W), 0
        B, L, C = x.shape
        assert L == H * W, "input feature has wrong size"
        m = self.mtlora
        lora_on = m.enabled and self.produce_tasks
        proj_tasks = lora_on and m.proj_enabled
        fc1_tasks = lora_on and m.fc1_enabled
        fc2_tasks = lora_on and m.fc2_enabled

        shortcut = x
        ln1 = None
        if self.use_pallas_ln:
            # LN params only; normalization happens fused into qkv (or
            # via _manual_ln) — identical param paths/init to the module
            g1, b1 = _LNParams(C, name="norm1")()
            ln1 = (g1, b1)
        else:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name="norm1")(x)

        mask = (jnp.asarray(shift_attention_mask(H, W, ws, shift))
                if shift > 0 else None)
        # factored task streams: proj emits rank-space task outputs and
        # the expansion to [T, B, L, C] happens ONCE, fused with the
        # shortcut add and the stochastic-depth mask — the module path's
        # separate task-einsum, +pretrained, and DropPath passes (each a
        # full-width read+write) collapse into a single write
        fact = (self.use_pallas_adapter and proj_tasks
                and self.spec.shared_mode == "matrix"
                and len(self.spec.r_tasks) > 0
                and max(self.spec.r_tasks) > 0
                and not self.spec.trainable_scale_per_task
                and (self.drop == 0.0 or deterministic))
        attn = WindowAttention(
            dim=C, window_size=ws, num_heads=self.num_heads,
            spec=self.spec,
            qkv_lora=m.enabled and m.qkv_enabled,
            proj_lora=m.enabled and m.proj_enabled,
            proj_tasks=proj_tasks,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            use_pallas=self.use_pallas,
            use_pallas_gemm=self.use_pallas_gemm,
            freeze_pretrained=m.enabled and m.freeze_pretrained,
            dtype=self.dtype, name="attn")
        aw, aw_tasks = attn(x, (H, W), shift, mask,
                            deterministic=deterministic, ln1=ln1,
                            mtlora=m, factored_tasks=fact)

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(aw, deterministic=deterministic)

        attn_tasks = None
        if isinstance(aw_tasks, FactoredTasks):
            # fully-implicit task streams: when the downstream MLP can
            # consume them factored (fused adapter + LN-folded fc1),
            # the [T, B, L, C] attn task tensor never materializes —
            # stats and the fc1 rank projection come from the shared
            # tensors + rank-space cross terms (lora.py TaskStream)
            T = aw_tasks.B.shape[0]
            hidden = int(C * self.mlp_ratio)
            stream_ok = (
                self.use_pallas_ln and fc1_tasks and fc2_tasks
                and _ln_fusible(self.spec, m, True, B * L, C, hidden,
                                self.dtype or x.dtype, deterministic))
            rng = (self.make_rng("droppath")
                   if self.drop_path > 0.0 and not deterministic
                   else None)
            if stream_ok:
                attn_tasks = TaskStream(
                    base=shortcut, pre=aw_tasks.pretrained.reshape(
                        B, L, C),
                    midT=aw_tasks.midT, B=aw_tasks.B,
                    scales=aw_tasks.scales,
                    coef=droppath_coef(rng, self.drop_path, T, B,
                                       deterministic))
            else:
                attn_tasks = expand_factored_tasks(
                    aw_tasks, (B, L), self.drop_path, deterministic,
                    rng, base=shortcut)
        elif aw_tasks is not None:
            # task streams emerge in token layout directly — the
            # reference's per-task window_reverse+roll (:378-390) is gone
            attn_tasks = shortcut[None] + dp(aw_tasks,
                                             deterministic=deterministic)

        # FFN; task streams enter through norm2 (reference :395-396)
        mlp = Mlp(in_features=C, hidden_features=int(C * self.mlp_ratio),
                  spec=self.spec, fc1_tasks=fc1_tasks, fc2_tasks=fc2_tasks,
                  drop=self.drop,
                  freeze_pretrained=m.enabled and m.freeze_pretrained,
                  use_pallas=self.use_pallas_gemm,
                  use_pallas_adapter=self.use_pallas_adapter,
                  dtype=self.dtype, name="mlp")
        if self.use_pallas_ln:
            g2, b2 = _LNParams(C, name="norm2")()
            mlp_out, mlp_tasks = mlp(x, attn_tasks,
                                     deterministic=deterministic,
                                     ln2=(g2, b2), mtlora=m,
                                     factored_out=True)
        else:
            norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="norm2")
            mlp_out, mlp_tasks = mlp(
                norm2(x),
                norm2(attn_tasks) if attn_tasks is not None else None,
                deterministic=deterministic, factored_out=True)
        x = x + dp(mlp_out, deterministic=deterministic)

        if mlp_tasks is None:
            if isinstance(attn_tasks, TaskStream):
                return x, expand_task_streams(attn_tasks, None)
            return x, attn_tasks
        def _dp_rng():
            return (self.make_rng("droppath")
                    if self.drop_path > 0.0 and not deterministic
                    else None)

        if isinstance(attn_tasks, TaskStream):
            # the ONLY materialization of the task streams in this
            # block: base + dp1(attn delta) + dp2(mlp delta), one write
            # — or NO materialization at all when the downstream
            # PatchMerging consumes the factored form directly
            assert isinstance(mlp_tasks, FactoredTasks)
            T = attn_tasks.midT.shape[0]
            coef2 = droppath_coef(_dp_rng(), self.drop_path, T, B,
                                  deterministic)
            if self.defer_expand:
                return x, DeferredTasks(attn_tasks, mlp_tasks, coef2)
            return x, expand_task_streams(attn_tasks, mlp_tasks, coef2)
        if isinstance(mlp_tasks, FactoredTasks):
            # quirk preserved: no shortcut when only the MLP produced
            # task streams (reference :401-403)
            return x, expand_factored_tasks(
                mlp_tasks, (B, L), self.drop_path, deterministic,
                _dp_rng(), base=attn_tasks)
        if attn_tasks is None:
            return x, dp(mlp_tasks, deterministic=deterministic)
        return x, attn_tasks + dp(mlp_tasks, deterministic=deterministic)


class _LNParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's param layout (used by the
    folded PatchMerging path so checkpoint paths stay identical)."""
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones,
                           (self.dim,), jnp.float32),
                self.param("bias", nn.initializers.zeros,
                           (self.dim,), jnp.float32))


class _KernelParam(nn.Module):
    """Parameter holder matching MTLoRALinear's frozen kernel layout."""
    shape: Tuple[int, int]

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.truncated_normal(0.02, lower=-2,
                                                       upper=2),
            self.shape, jnp.float32)


class PatchMerging(nn.Module):
    """2x2 patch merge + linear reduction (reference PatchMerging:429-472).

    Pure single-stream function; BasicLayer batches shared + task streams
    through it in one call.

    TPU fast path (no reduction adapters — the default; DOWNSAMPLER LoRA
    off): the 4-slice concat, the LayerNorm, and the 4C->2C reduction
    GEMM are algebraically folded so neither the concatenated [.., 4C]
    tensor nor its fp32 LayerNorm output is ever materialized:

        LN(cat) @ W = (cat @ (gamma (.) W)) * rsqrt(var+eps)
                      - mu * rsqrt(var+eps) * (gamma @ W) + beta @ W

    with mu/var reduced straight off the un-concatenated 6-D view.
    Measured on v5e at stage-0 shapes (5 streams, batch 32): fwd+bwd
    23.8 -> 12.0 ms. (A reshape/transpose space-to-depth was also tried
    and measured SLOWER than the strided slices; both superseded by this
    folding.) Parameter paths/init match the module form exactly.
    """
    input_resolution: Tuple[int, int]
    dim: int
    spec: LoRASpec          # _NO_LORA unless DOWNSAMPLER_ENABLED
    freeze_pretrained: bool = False
    use_pallas: bool = False
    use_pallas_gemm: bool = False
    use_pallas_ln: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_tasks=None, *, deterministic: bool = True):
        """``x`` [..., L, C]; optional ``x_tasks`` [T, ..., L, C] run
        through the SAME parameters (the reference applies the shared
        downsample module to every stream, swin_transformer_mtlora.py:
        546-550). Passing tasks here instead of concatenating them onto
        x avoids a full [T+1, B, L, C] copy + its backward split
        (measured ~4.5 ms/step on the flagship trace)."""
        H, W = self.input_resolution
        *lead, L, C = x.shape
        assert L == H * W and H % 2 == 0 and W % 2 == 0

        if self.spec.r_shared == 0:
            gamma, beta = _LNParams(4 * C, name="norm")()
            kernel = _KernelParam((4 * C, 2 * C), name="reduction")()
            if self.freeze_pretrained:
                kernel = jax.lax.stop_gradient(kernel)
            out = self._folded(x, H, W, C, lead, gamma, beta, kernel)
            if x_tasks is None:
                return out, None
            if isinstance(x_tasks, DeferredTasks):
                # factored task streams -> fused merge kernel; the
                # [T, B, L, C] expansion (and its backward reduce_sum
                # over T + cotangent layout copy) never happens
                from mtlora_tpu.ops.pallas_task_merge import (
                    task_merge_down,
                    task_merge_supported,
                )

                d = x_tasks
                dtype = self.dtype or x.dtype
                Bb = d.stream.base.shape[0]
                T = d.stream.midT.shape[0]
                S = d.stream.midT.shape[1] + d.f2.midT.shape[1]
                if (task_merge_supported(Bb * H // 2, W // 2, C, T, S)
                        and self._fold_kernel_ok(T * Bb * H * W, C,
                                                 dtype)):
                    interp = jax.default_backend() == "cpu"
                    out_t = task_merge_down(
                        d.stream, d.f2, d.coef2, gamma.astype(dtype),
                        beta.astype(dtype), kernel.astype(dtype), H, W,
                        train_w=not self.freeze_pretrained,
                        interpret=interp)
                    return out, out_t
                x_tasks = expand_task_streams(d.stream, d.f2, d.coef2)
            T = x_tasks.shape[0]
            t2 = x_tasks.reshape((-1,) + x_tasks.shape[-2:])
            out_t = self._folded(t2, H, W, C, [t2.shape[0]], gamma, beta,
                                 kernel)
            return out, out_t.reshape((T,) + out.shape)

        # adapter-reduction path (DOWNSAMPLER_ENABLED): batch shared +
        # task streams through the single module call
        if isinstance(x_tasks, DeferredTasks):  # not deferred here
            x_tasks = expand_task_streams(x_tasks.stream, x_tasks.f2,
                                          x_tasks.coef2)
        if x_tasks is not None:
            T, B = x_tasks.shape[0], x.shape[0]
            x = jnp.concatenate([x[None], x_tasks], axis=0).reshape(
                (T + 1) * B, L, C)
            lead = [(T + 1) * B]
        x = x.reshape(*lead, H, W, C)
        x0 = x[..., 0::2, 0::2, :]
        x1 = x[..., 1::2, 0::2, :]
        x2 = x[..., 0::2, 1::2, :]
        x3 = x[..., 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(*lead, (H // 2) * (W // 2), 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x, _ = MTLoRALinear(4 * C, 2 * C, spec=self.spec, has_tasks=False,
                            use_bias=False,
                            freeze_pretrained=self.freeze_pretrained,
                            use_pallas=self.use_pallas_gemm,
                            dtype=self.dtype,
                            name="reduction")(x, deterministic=deterministic)
        if x_tasks is not None:
            x = x.reshape(T + 1, B, *x.shape[1:])
            return x[0], x[1:]
        return x, None

    def _fold_kernel_ok(self, M, C, dtype):
        """PatchMerging = LN + GEMM — the 2x2 gather feeds the fused
        LN kernel (ops/pallas_ln_lora.py, train_w for the trainable
        reduction) so stats/normalized tensors never hit HBM; the
        algebraic fold below remains the fallback."""
        if not self.use_pallas_ln:
            return False
        from mtlora_tpu.ops.pallas_ln_lora import (
            ln_lora_supported,
            merge_ln_supported,
        )

        H, W = self.input_resolution
        Ci, O = 4 * C, 2 * C
        itemsize = 2 if dtype == jnp.bfloat16 else 4
        passes = 1 if itemsize == 2 else 3
        # weight + fp32 dW accumulator + row blocks must fit scoped VMEM
        if Ci * O * (itemsize * passes + 4) > (12 << 20):
            return False
        if merge_ln_supported(M // (2 * W), W // 2, C):
            # in-VMEM merge kernel path (any R works — th=1 at worst)
            return True
        # fallback kernel consumes the 2x2-gathered [M/4, 4C] rows
        return ln_lora_supported(M // 4, Ci, O)

    def _folded_pallas(self, x, H, W, C, lead, gamma, beta, kernel,
                       dtype):
        from mtlora_tpu.ops.pallas_ln_lora import (
            fused_ln_lora_linear,
            fused_merge_ln_linear,
            merge_ln_supported,
        )
        from mtlora_tpu.ops.window import merge2x2_cat

        interp = jax.default_backend() == "cpu"
        R = 1
        for d in lead:
            R *= d
        R *= H // 2
        if merge_ln_supported(R, W // 2, C):
            # in-VMEM 2x2 gather: the kernel consumes the FREE
            # [R, 2, W/2, 2C] row-major view — no HBM transpose, no
            # lane-merging reshape (the merge2x2_cat route cost two
            # full copies each direction, ~18 ms/step of glue on the
            # flagship trace even in its fastest 6-D-transpose form)
            xv = x.astype(dtype).reshape(R, 2, W // 2, 2 * C)
            y = fused_merge_ln_linear(
                xv, gamma.astype(dtype), beta.astype(dtype),
                kernel.astype(dtype),
                not self.freeze_pretrained, interp)
            return y.reshape(*lead, (H // 2) * (W // 2), 2 * C)

        # fallback (W/2 not sublane-tileable, e.g. the 28->14 stage-2
        # merge): 2x2 gather as free reshapes around ONE 6-D transpose
        # (see merge2x2_cat) feeding the general LN kernel
        xcat = merge2x2_cat(x.astype(dtype), H, W).reshape(-1, 4 * C)
        seed = jnp.zeros((2,), jnp.int32)
        A0 = jnp.zeros((4 * C, 1), dtype)
        B0 = jnp.zeros((1, 2 * C), dtype)
        y = fused_ln_lora_linear(
            xcat, gamma.astype(dtype), beta.astype(dtype),
            kernel.astype(dtype), jnp.zeros((2 * C,), dtype), A0, B0,
            seed, 0.0, 0.0, False, False, False,
            train_w=not self.freeze_pretrained, interpret=interp)
        return y.reshape(*lead, (H // 2) * (W // 2), 2 * C)

    def _folded(self, x, H, W, C, lead, gamma, beta, kernel):
        dtype = self.dtype or x.dtype
        M = 1
        for d in x.shape[:-1]:
            M *= d
        if self._fold_kernel_ok(M, C, dtype):
            return self._folded_pallas(x, H, W, C, lead, gamma, beta,
                                       kernel, dtype)
        # 6-D view: [.., H/2, ho, W/2, wo, C]; concat block j = 2*wo + ho
        # (reference swin_transformer_mtlora.py:451-455 channel order)
        xr = x.reshape(*lead, H // 2, 2, W // 2, 2, C).astype(dtype)

        # remat: without this, autodiff saves the fp32 CAST of xr as the
        # residual for the sum-of-squares backward — a full-size fp32
        # copy (771 MB at stage 0) that defeats the folding; recomputing
        # the cast in backward is free (fuses into the reductions)
        @jax.checkpoint
        def _stats(xr):
            f = xr.astype(jnp.float32)
            n = 4 * C
            mu = f.sum(axis=(-4, -2, -1)) / n        # [.., H/2, W/2]
            # optimization_barrier: break CSE between the two reductions'
            # casts — a SHARED fp32 cast node gets materialized to HBM
            # (full-size fp32 write + two reads); with separate casts
            # each reduction fuses its own bf16 read
            f2 = jax.lax.optimization_barrier(xr).astype(jnp.float32)
            var = (f2 * f2).sum(axis=(-4, -2, -1)) / n - mu * mu
            return mu, var

        mu, var = _stats(xr)
        inv = jax.lax.rsqrt(var + 1e-5)
        wg = (gamma[:, None] * kernel).reshape(2, 2, C, 2 * C)  # [wo,ho,c,o]
        a = jnp.einsum("...piqjc,jico->...pqo", xr, wg.astype(dtype),
                       preferred_element_type=jnp.float32)
        v = gamma @ kernel                           # [2C]
        w = beta @ kernel                            # [2C]
        out = (a - mu[..., None] * v) * inv[..., None] + w
        return out.reshape(*lead, (H // 2) * (W // 2),
                           2 * C).astype(dtype)


class BasicLayer(nn.Module):
    """One Swin stage (reference BasicLayer:484-551)."""
    dim: int
    input_resolution: Tuple[int, int]
    depth: int
    num_heads: int
    spec: LoRASpec
    mtlora: MTLoRASpec
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: Sequence[float] = (0.0,)
    has_downsample: bool = False
    use_remat: bool = False
    use_pallas: bool = False
    use_pallas_gemm: bool = False
    use_pallas_adapter: bool = False
    use_pallas_ln: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        tasks = None
        Block = SwinBlock
        if self.use_remat:
            # argnums: (self, x, deterministic) -> deterministic is static
            Block = nn.remat(SwinBlock, static_argnums=(2,))
        # stage-final streams stay factored when the downstream merge
        # can consume them (fused task-merge kernel; PatchMerging falls
        # back to expansion if its in-call gates fail)
        down_no_lora = not (self.mtlora.enabled
                            and self.mtlora.downsampler_enabled
                            and self.spec.r_shared > 0)
        defer_ok = (self.has_downsample and down_no_lora
                    and self.use_pallas_ln
                    and (self.input_resolution[1] // 2) % 8 == 0)
        for i in range(self.depth):
            blk = Block(
                dim=self.dim, input_resolution=self.input_resolution,
                num_heads=self.num_heads, spec=self.spec, mtlora=self.mtlora,
                produce_tasks=(i == self.depth - 1
                               or self.mtlora.intermediate_specialization),
                window_size=self.window_size,
                shift_size=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop=self.drop,
                attn_drop=self.attn_drop, drop_path=self.drop_path[i],
                use_pallas=self.use_pallas,
                use_pallas_gemm=self.use_pallas_gemm,
                use_pallas_adapter=self.use_pallas_adapter,
                use_pallas_ln=self.use_pallas_ln,
                defer_expand=defer_ok and i == self.depth - 1,
                dtype=self.dtype, name=f"blocks_{i}")
            x, t = blk(x, deterministic)
            if t is not None:
                tasks = t  # only the last produced streams survive (ref :543-545)

        if self.has_downsample:
            down = PatchMerging(
                input_resolution=self.input_resolution, dim=self.dim,
                spec=(self.spec if (self.mtlora.enabled
                                    and self.mtlora.downsampler_enabled)
                      else _NO_LORA),
                freeze_pretrained=(self.mtlora.enabled
                                   and self.mtlora.freeze_pretrained
                                   and self.mtlora.freeze_reduction),
                use_pallas=self.use_pallas_gemm,
                use_pallas_ln=self.use_pallas_ln,
                dtype=self.dtype, name="downsample")
            # shared + task streams share the module's parameters; the
            # module runs them without stacking copies (default path)
            x, tasks = down(x, tasks, deterministic=deterministic)
        return x, tasks


class PatchEmbed(nn.Module):
    """Image -> patch tokens (reference PatchEmbed:565-605). NHWC conv."""
    patch_size: int = 4
    embed_dim: int = 96
    patch_norm: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        x = nn.Conv(self.embed_dim,
                    kernel_size=(self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    dtype=self.dtype, name="proj")(x)
        x = x.reshape(B, -1, self.embed_dim)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class SwinTransformerMTLoRA(nn.Module):
    """Swin backbone producing per-stage (shared, per-task) features
    (reference SwinTransformerMTLoRA:616-761)."""
    img_size: int = 224
    patch_size: int = 4
    num_classes: int = 0
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
    use_remat: bool = False
    use_pallas: bool = False
    use_pallas_gemm: bool = False
    use_pallas_adapter: bool = False
    use_pallas_ln: bool = False
    dtype: Optional[jnp.dtype] = None

    @property
    def num_layers(self) -> int:
        return len(self.depths)

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (self.num_layers - 1))

    @property
    def patches_resolution(self) -> Tuple[int, int]:
        return (self.img_size // self.patch_size,
                self.img_size // self.patch_size)

    def _stage_spec(self, i: int) -> LoRASpec:
        if self.mtlora.enabled and self.mtlora.stage_specs:
            return self.mtlora.stage_specs[i]
        return _NO_LORA

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 return_stages: bool = True, flatten_ft: bool = False):
        """x: [B, H, W, 3] NHWC image batch.

        return_stages=True -> list of (x, tasks) per stage, tasks stacked
        [T, B, L_s, C_s] (broadcast of shared features when a stage has no
        adapters; reference :744-745).
        """
        B = x.shape[0]
        x = PatchEmbed(patch_size=self.patch_size, embed_dim=self.embed_dim,
                       patch_norm=self.patch_norm, dtype=self.dtype,
                       name="patch_embed")(x)
        if self.ape:
            pos = self.param(
                "absolute_pos_embed",
                nn.initializers.truncated_normal(0.02, lower=-2, upper=2),
                (1, x.shape[1], self.embed_dim), jnp.float32)
            x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths)).tolist()
        pr = self.patches_resolution
        T = self.mtlora.num_tasks
        outs = []
        for i in range(self.num_layers):
            start = sum(self.depths[:i])
            layer = BasicLayer(
                dim=int(self.embed_dim * 2 ** i),
                input_resolution=(pr[0] // (2 ** i), pr[1] // (2 ** i)),
                depth=self.depths[i], num_heads=self.num_heads[i],
                spec=self._stage_spec(i), mtlora=self.mtlora,
                window_size=self.window_size, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                drop=self.drop_rate, attn_drop=self.attn_drop_rate,
                drop_path=dpr[start:start + self.depths[i]],
                has_downsample=(i < self.num_layers - 1),
                use_remat=self.use_remat, use_pallas=self.use_pallas,
                use_pallas_gemm=self.use_pallas_gemm,
                use_pallas_adapter=self.use_pallas_adapter,
                use_pallas_ln=self.use_pallas_ln,
                dtype=self.dtype, name=f"layers_{i}")
            x, tasks = layer(x, deterministic=deterministic)
            if tasks is None and T > 0:
                tasks = jnp.broadcast_to(x[None], (T,) + x.shape)
            outs.append((x, tasks))

        if return_stages:
            return outs
        if flatten_ft:
            x = jnp.mean(x, axis=1)  # avgpool over tokens
        if self.num_classes > 0:
            x = nn.Dense(self.num_classes, name="head")(x)
        return x
