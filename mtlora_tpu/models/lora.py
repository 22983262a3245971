"""Task-shared + task-specific low-rank adapters (MTLoRA core).

TPU-native rebuild of reference ``models/lora.py``. The key redesign: the
reference computes T per-task adapter branches as sequential Python-dict
matmuls (``models/lora.py:262-282``); here per-task adapters are stored as
stacked arrays ``A_tasks [T, in, r]`` / ``B_tasks [T, r, out]`` and all T
low-rank updates run as ONE batched einsum on the MXU, with task features
threaded as a stacked ``[T, B, ..., C]`` array instead of a dict.

Per-task ranks may differ (reference ``r = {'shared': .., task: ..}``);
they are padded to ``max(r_t)`` with a static rank mask so padded slots
contribute exactly zero forward AND backward (mask multiplies A, so B's
gradient through dead slots vanishes too).

Shared modes (reference models/lora.py:177-182, 259-282):
  - ``matrix``:   y = Wx + s_s * B_s A_s x;  y_t = Wx + s_t * B_t A_t x_t
  - ``matrixv2``: y_t additionally includes the shared update
  - ``addition``: y = Wx + LN(sum_t y_t); no shared A/B pair
  - ``lora_only``: tasks stripped -> behaves as ``matrix`` with no tasks
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FactoredTasks(NamedTuple):
    """Per-task adapter output in factored (rank-space) form.

    Produced by ``MTLoRALinear(..., factored_tasks=True)`` instead of the
    materialized ``[T, ..., out]`` task streams, and consumed by the next
    ``MTLoRALinear(..., task_factored=...)`` through the fused Pallas
    adapter kernel (ops/pallas_adapter_mlp.py) so the full-width per-task
    hidden tensor never touches HBM.
    """
    pretrained: jnp.ndarray        # [..., out] frozen output (pre-act)
    midT: jnp.ndarray              # [T, r, M] task A-projections
    B: jnp.ndarray                 # [T, r, out] task B matrices
    scales: Tuple[float, ...]      # static per-task scales


@dataclasses.dataclass(frozen=True)
class LoRASpec:
    """Per-layer (per-Swin-stage) adapter hyperparameters.

    Resolved from ``MODEL.MTLORA.R_PER_TASK_LIST[stage]`` /
    ``SCALE_PER_TASK_LIST[stage]`` (reference config.py:545-557).
    """
    r_shared: int = 0
    r_tasks: Tuple[int, ...] = ()
    shared_scale: float = 1.0
    task_scales: Tuple[float, ...] = ()
    dropout: float = 0.0
    trainable_scale_shared: bool = False
    trainable_scale_per_task: bool = False
    shared_mode: str = "matrix"
    # set by merge_lora_weights: the shared A/B update has been folded into
    # the pretrained kernel, so layers where merging is valid skip the
    # shared-branch GEMMs at inference (merged fast path)
    shared_merged: bool = False


@dataclasses.dataclass(frozen=True)
class MTLoRASpec:
    """Whole-backbone adapter plan (from ``MODEL.MTLORA.*``)."""
    enabled: bool = False
    tasks: Tuple[str, ...] = ()
    stage_specs: Tuple[LoRASpec, ...] = ()
    qkv_enabled: bool = True
    proj_enabled: bool = True
    fc1_enabled: bool = True
    fc2_enabled: bool = True
    downsampler_enabled: bool = False
    intermediate_specialization: bool = False
    split_qkv: bool = False
    # FREEZE_PRETRAINED: stop_gradient on the frozen qkv/proj/fc kernels
    # so XLA never builds their dW = x^T dy GEMMs (the optimizer mask
    # would zero those grads anyway — reference main.py:254-262)
    freeze_pretrained: bool = True
    freeze_reduction: bool = False

    @property
    def num_tasks(self) -> int:
        return len(self.tasks)

    @staticmethod
    def from_config(config) -> "MTLoRASpec":
        """Build from a frozen ConfigNode (after normalize_mtlora)."""
        m = config.MODEL.MTLORA
        if not m.ENABLED:
            return MTLoRASpec(enabled=False)
        tasks = tuple(config.TASKS)
        specs = []
        for stage in range(len(config.MODEL.SWIN.DEPTHS)):
            r_map = m.R_PER_TASK_LIST[stage]
            s_map = m.SCALE_PER_TASK_LIST[stage]
            specs.append(LoRASpec(
                r_shared=int(r_map["shared"]),
                r_tasks=tuple(int(r_map[t]) for t in tasks),
                shared_scale=float(m.SHARED_SCALE[stage]),
                task_scales=tuple(float(s_map[t]) for t in tasks),
                dropout=float(m.DROPOUT[stage]),
                trainable_scale_shared=bool(m.TRAINABLE_SCALE_SHARED),
                trainable_scale_per_task=bool(m.TRAINABLE_SCALE_PER_TASK),
                shared_mode=str(m.SHARED_MODE),
            ))
        freeze_red = (True if m.DOWNSAMPLER_ENABLED
                      else bool(config.TRAIN.FREEZE_DOWNSAMPLE_REDUCTION))
        return MTLoRASpec(
            enabled=True,
            tasks=tasks,
            stage_specs=tuple(specs),
            qkv_enabled=bool(m.QKV_ENABLED),
            proj_enabled=bool(m.PROJ_ENABLED),
            fc1_enabled=bool(m.FC1_ENABLED),
            fc2_enabled=bool(m.FC2_ENABLED),
            downsampler_enabled=bool(m.DOWNSAMPLER_ENABLED),
            intermediate_specialization=bool(m.INTERMEDIATE_SPECIALIZATION),
            split_qkv=bool(m.SPLIT_QKV),
            freeze_pretrained=bool(m.FREEZE_PRETRAINED),
            freeze_reduction=freeze_red,
        )


def _manual_ln_f(x, gamma, beta, eps: float = 1e-5):
    """nn.LayerNorm numerics (fp32 statistics) as a plain function."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = (x32 * x32).mean(-1, keepdims=True) - mu * mu
    out = ((x32 - mu) * jax.lax.rsqrt(var + eps)
           * gamma.astype(jnp.float32) + beta.astype(jnp.float32))
    return out.astype(x.dtype)


def _fast_drop(rng, rate: float, x):
    """Inverted dropout via the hardware RNG (jax.lax.rng_bit_generator)
    instead of threefry — the per-element threefry mask generation was
    the dominant cost of the full-width adapter-dropout passes on the
    flagship trace (select_n+rng ~1 ms/pass at stage 0 vs ~0.4 ms for
    the where itself). Same keep distribution (P[keep] = 1-rate), a
    DIFFERENT stream than jax.random.bernoulli — acceptable under the
    documented dropout-stream contract (see ops/pallas_ln_lora.py note);
    deterministic given the rng key."""
    k = rng
    if jnp.issubdtype(getattr(k, "dtype", None), jax.dtypes.prng_key):
        k = jax.random.key_data(k)
    k = k.reshape(-1).astype(jnp.uint32)
    k4 = jnp.tile(k, 4)[:4]
    _, bits = jax.lax.rng_bit_generator(k4, x.shape, dtype=jnp.uint32)
    thr = jnp.uint32(int(rate * (2 ** 32)))
    return jnp.where(bits >= thr, x / (1.0 - rate), 0.0)


def _kaiming_uniform_rows(key, shape, dtype):
    """torch kaiming_uniform_(a=sqrt(5)) on an [r, fan_in]-style tensor:
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)). Here shape is [fan_in, r] (JAX
    x@W layout), so fan_in is shape[-2]."""
    fan_in = shape[-2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MTLoRALinear(nn.Module):
    """Linear layer with frozen pretrained weight + shared/per-task LoRA.

    Call: ``(x, x_tasks) -> (y_shared, y_tasks)`` where ``x`` is
    ``[..., in]``, ``x_tasks`` is ``[T, ..., in]`` or None (broadcast the
    shared input, reference models/lora.py:263), ``y_tasks`` is
    ``[T, ..., out]`` or None.

    Parameter layout (JAX convention, x @ kernel):
      linear/kernel [in, out], linear/bias [out]
      lora_shared_A [in, r_s], lora_shared_B [r_s, out]
      lora_tasks_A [T, in, r_max], lora_tasks_B [T, r_max, out]
    """
    in_features: int
    out_features: int
    spec: LoRASpec = LoRASpec()
    has_tasks: bool = False         # whether per-task branches exist
    use_bias: bool = True
    freeze_pretrained: bool = False  # stop_gradient on kernel/bias
    use_pallas: bool = False         # fused LoRA-GEMM kernel (TPU)
    dtype: Optional[jnp.dtype] = None   # compute dtype (None = param dtype)

    @property
    def _mode(self) -> str:
        mode = self.spec.shared_mode
        if mode == "add":
            mode = "addition"
        if mode == "lora_only" or not self._tasks_active:
            # no-task layers fall back to plain shared-matrix LoRA
            # (reference models/lora.py:179-186)
            return "matrix"
        return mode

    @property
    def _tasks_active(self) -> bool:
        return (self.has_tasks and len(self.spec.r_tasks) > 0
                and self.spec.shared_mode != "lora_only")

    def _ln_fused(self, x, x_tasks, deterministic, factored_tasks,
                  ln_params, ln_act=False, out_drop=False):
        """Fused LayerNorm + frozen GEMM + shared-LoRA path
        (ops/pallas_ln_lora.py). ``x`` is the PRE-norm input; the caller
        guarantees: matrix mode, static shared scale, frozen pretrained,
        unmerged, and (tasks -> factored with pre-NORMED x_tasks).
        ``out_drop``: additionally return dropout(y) from a second
        in-kernel PRNG stream (the next layer's pre-dropped adapter
        input); returns ``(y, tasks, y_dropped)`` in that case."""
        from mtlora_tpu.ops.pallas_ln_lora import fused_ln_lora_linear

        spec = self.spec
        param_dtype = jnp.float32
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(0.02, lower=-2, upper=2),
            (self.in_features, self.out_features), param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_features,), param_dtype)
                if self.use_bias else None)
        kernel = jax.lax.stop_gradient(kernel)
        bias = jax.lax.stop_gradient(bias) if bias is not None else None
        A_s = self.param("lora_shared_A", _kaiming_uniform_rows,
                         (self.in_features, spec.r_shared), param_dtype)
        B_s = self.param("lora_shared_B", nn.initializers.zeros,
                         (spec.r_shared, self.out_features), param_dtype)

        dtype = self.dtype or x.dtype
        gamma, beta, seed = ln_params
        drop = (float(spec.dropout)
                if (spec.dropout > 0.0 and not deterministic) else 0.0)
        lead = x.shape[:-1]
        x2 = x.astype(dtype).reshape(-1, self.in_features)
        bias_c = (bias if bias is not None
                  else jnp.zeros((self.out_features,),
                                 param_dtype)).astype(dtype)
        tasks_active = self._tasks_active
        out_p = bool(factored_tasks and tasks_active)
        out_d = bool(out_drop and drop > 0.0)
        # interpret on CPU hosts (tests); NB the Mosaic PRNG has no CPU
        # interpreter, so dropout>0 requires a real TPU
        interp = jax.default_backend() == "cpu"
        res = fused_ln_lora_linear(
            x2, gamma.astype(dtype), beta.astype(dtype),
            kernel.astype(dtype), bias_c, A_s.astype(dtype),
            B_s.astype(dtype), seed, float(spec.shared_scale), drop,
            out_p, ln_act, out_d, interpret=interp)
        if not (out_p or out_d):
            y2, p2, d2 = res, None, None
        else:
            parts = list(res)
            y2 = parts.pop(0)
            p2 = parts.pop(0) if out_p else None
            d2 = parts.pop(0) if out_d else None
        y = y2.reshape(lead + (self.out_features,))
        yd = (d2.reshape(lead + (self.out_features,))
              if d2 is not None else None)
        if not tasks_active:
            return (y, None, yd) if out_drop else (y, None)

        assert p2 is not None, (
            "_ln_fused with active tasks requires factored_tasks=True "
            "(no materialized-task form exists; caller must gate)")
        T = len(spec.r_tasks)
        r_max = max(spec.r_tasks)
        A_t = self.param("lora_tasks_A", _kaiming_uniform_rows,
                         (T, self.in_features, r_max), param_dtype)
        B_t = self.param("lora_tasks_B", nn.initializers.zeros,
                         (T, r_max, self.out_features), param_dtype)
        if any(r != r_max for r in spec.r_tasks):
            rank_mask = (np.arange(r_max)[None, :]
                         < np.asarray(spec.r_tasks)[:, None])
            A_t = A_t * jnp.asarray(rank_mask, param_dtype)[:, None, :]
        if isinstance(x_tasks, TaskStream):
            # implicit task streams: LN stats + the rank projection fold
            # from the shared tensors and rank-space cross terms — the
            # [T, M, C] task tensor is never read (or written) here
            mid1T = fold_task_ln_project(x_tasks, gamma, beta, A_t)
        elif x_tasks is None:
            # no upstream task streams (e.g. FC1_ENABLED without
            # PROJ_ENABLED): project the shared LN output, mirroring the
            # unfused fallback below (reference models/lora.py:263).
            # The reference drops x before both branches; the in-kernel
            # mask is not visible here, so an independent mask stands in
            # (train-mode only; same distribution, different stream).
            xn = _manual_ln_f(x, gamma, beta).astype(dtype)
            if drop > 0.0:
                xn = _fast_drop(self.make_rng("dropout"), drop, xn)
            xn = xn.reshape(-1, self.in_features)
            mid1T = jnp.einsum("mi,tir->trm", xn, A_t.astype(dtype))
        else:
            # x_tasks arrive RAW (pre-norm): fold the LayerNorm into the
            # rank-r projection so the normalized [T, M, C] tensor never
            # materializes —
            #   LN(xt) @ A = ((xt*gamma) @ A - mu*(gamma@A)) * inv + b@A
            # with fp32 per-token stats read straight off the bf16 input
            xt2 = x_tasks.astype(dtype).reshape(T, -1, self.in_features)
            xt32 = xt2.astype(jnp.float32)
            mu = xt32.mean(-1)                           # [T, M]
            x2b = jax.lax.optimization_barrier(xt2).astype(jnp.float32)
            var = (x2b * x2b).mean(-1) - mu * mu
            inv = jax.lax.rsqrt(var + 1e-5)              # [T, M]
            g32 = gamma.astype(jnp.float32)
            A32 = A_t.astype(jnp.float32)
            gA = (A32 * g32[None, :, None]).astype(dtype)  # [T, C, r]
            proj = jnp.einsum("tmi,tir->trm", xt2, gA,
                              preferred_element_type=jnp.float32)
            gAs = jnp.einsum("c,tcr->tr", g32, A32)      # gamma @ A
            bA = jnp.einsum("c,tcr->tr", beta.astype(jnp.float32), A32)
            mid1T = ((proj - mu[:, None, :] * gAs[..., None])
                     * inv[:, None, :] + bA[..., None]).astype(dtype)
        ft = FactoredTasks(
            pretrained=p2.reshape(lead + (self.out_features,)),
            midT=mid1T, B=B_t.astype(dtype), scales=spec.task_scales)
        return (y, ft, yd) if out_drop else (y, ft)

    def _params_only(self):
        """Materialize this layer's pretrained + shared-LoRA params
        (same names/initializers as the compute paths) WITHOUT running
        any compute — the whole-MLP fusion (ops/pallas_ln_mlp.py) pulls
        fc1's and fc2's params into ONE kernel call. Flax derives init
        RNG from the param path, so creation order is irrelevant.
        Returns (kernel, bias, A_s, B_s); kernel/bias are stop_gradient
        per ``freeze_pretrained``."""
        spec = self.spec
        param_dtype = jnp.float32
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(0.02, lower=-2, upper=2),
            (self.in_features, self.out_features), param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_features,), param_dtype)
                if self.use_bias else jnp.zeros((self.out_features,),
                                                param_dtype))
        if self.freeze_pretrained:
            kernel = jax.lax.stop_gradient(kernel)
            bias = jax.lax.stop_gradient(bias)
        A_s = self.param("lora_shared_A", _kaiming_uniform_rows,
                         (self.in_features, spec.r_shared), param_dtype)
        B_s = self.param("lora_shared_B", nn.initializers.zeros,
                         (spec.r_shared, self.out_features), param_dtype)
        return kernel, bias, A_s, B_s

    @nn.compact
    def __call__(self, x, x_tasks=None, *, deterministic: bool = True,
                 factored_tasks: bool = False, task_factored=None,
                 ln_params=None, ln_act: bool = False,
                 out_drop: bool = False, x_dropped=None,
                 params_only: bool = False):
        if params_only:
            return self._params_only()
        """``factored_tasks=True`` returns the per-task output as a
        :class:`FactoredTasks` (rank-space) instead of materialized
        ``[T, ..., out]`` streams; ``task_factored=<FactoredTasks>``
        consumes an upstream layer's factored output through the fused
        Pallas adapter kernel (exact gelu between the two layers is
        applied inside the kernel). Both require 'matrix' shared mode
        with static per-task scales; the caller (Mlp) gates this.
        ``ln_params=(gamma, beta, seed)`` means ``x`` (and ``x_tasks``)
        are PRE-norm and the LayerNorm fuses into this layer's GEMMs
        (ops/pallas_ln_lora.py); the caller gates eligibility."""
        if ln_params is not None:
            return self._ln_fused(x, x_tasks, deterministic,
                                  factored_tasks, ln_params, ln_act,
                                  out_drop)
        spec = self.spec
        param_dtype = jnp.float32
        kernel = self.param(
            "kernel", nn.initializers.truncated_normal(0.02, lower=-2, upper=2),
            (self.in_features, self.out_features), param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_features,), param_dtype)
                if self.use_bias else None)
        if self.freeze_pretrained:
            # frozen weights: cut the grad edge so backward never builds
            # dW = x^T dy / db (the optimizer masks them to zero anyway)
            kernel = jax.lax.stop_gradient(kernel)
            bias = jax.lax.stop_gradient(bias) if bias is not None else None

        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)
        # Flatten leading (batch/token) dims for every GEMM in this
        # module: with [B, L, C] operands the adapter backward dA =
        # x^T dmid has TWO contracting dims and XLA:TPU lowers it as a
        # size-B windowed convolution (rhs_reversal, pad B-1) — measured
        # ~3x the FLOPs and a third of the bandwidth of the equivalent
        # flat GEMM. Leading-dim reshapes are free (bitcasts).
        lead = xc.shape[:-1]
        x2 = xc.reshape(-1, self.in_features)
        pretrained = (x2 @ kernel.astype(dtype)).reshape(
            lead + (self.out_features,))
        if bias is not None:
            pretrained = pretrained + bias.astype(dtype)

        if spec.r_shared == 0:
            # adapters disabled entirely (reference models/lora.py:256-257)
            return pretrained, None

        mode = self._mode
        tasks_active = self._tasks_active
        T = len(spec.r_tasks) if tasks_active else 0

        # dropout on the SHARED input only (reference models/lora.py:258:
        # x is dropped before both branches, but x_tasks entries are not).
        x_drop = xc
        dropping = spec.dropout > 0.0 and not deterministic
        if dropping:
            if x_dropped is not None:
                # pre-dropped input produced by the upstream LN kernel's
                # second output (ops/pallas_ln_lora.py out_drop) — the
                # standalone bernoulli+where pass is skipped
                x_drop = x_dropped.astype(dtype)
            else:
                x_drop = _fast_drop(self.make_rng("dropout"),
                                    spec.dropout, xc)

        # ---- shared branch ------------------------------------------------
        # merged fast path: the shared update is already folded into the
        # kernel (merge_lora_weights), valid only where the task streams
        # also carry the shared update (matrixv2) or there are none —
        # exactly the layers merge_lora_weights touches.
        merged = spec.shared_merged and (
            not tasks_active or mode == "matrixv2")
        shared_update = None
        if mode in ("matrix", "matrixv2") and not merged:
            A_s = self.param("lora_shared_A", _kaiming_uniform_rows,
                             (self.in_features, spec.r_shared), param_dtype)
            B_s = self.param("lora_shared_B", nn.initializers.zeros,
                             (spec.r_shared, self.out_features), param_dtype)
            if spec.trainable_scale_shared:
                s_s = self.param("lora_shared_scale",
                                 nn.initializers.constant(spec.shared_scale),
                                 (1,), param_dtype).astype(dtype)
            else:
                s_s = spec.shared_scale
            # Fused LoRA-GEMM fast path: no task branch needed downstream
            # (they would require `pretrained` separately), frozen W (the
            # kernel's vjp emits no dW), static scale.
            if (self.use_pallas and self.freeze_pretrained
                    and not tasks_active
                    and not spec.trainable_scale_shared):
                from mtlora_tpu.ops.pallas_lora_matmul import lora_matmul

                y = lora_matmul(xc, x_drop, kernel.astype(dtype),
                                A_s.astype(dtype), B_s.astype(dtype),
                                float(spec.shared_scale),
                                not dropping)
                if bias is not None:
                    y = y + bias.astype(dtype)
                return y, None
            xd2 = x_drop.reshape(-1, self.in_features)
            shared_update = (((xd2 @ A_s.astype(dtype))
                              @ B_s.astype(dtype)) * s_s).reshape(
                lead + (self.out_features,))

        # ---- per-task branch ---------------------------------------------
        y_tasks = None
        if tasks_active:
            r_max = max(spec.r_tasks)
            A_t = self.param(
                "lora_tasks_A", _kaiming_uniform_rows,
                (T, self.in_features, r_max), param_dtype)
            B_t = self.param("lora_tasks_B", nn.initializers.zeros,
                             (T, r_max, self.out_features), param_dtype)
            if spec.trainable_scale_per_task:
                s_t = self.param(
                    "lora_task_scale",
                    lambda k, s, d: jnp.asarray(spec.task_scales, d), (T,),
                    param_dtype).astype(dtype)
            else:
                s_t = jnp.asarray(spec.task_scales, dtype)
            # static rank mask keeps padded slots exactly dead (fwd+bwd)
            if any(r != r_max for r in spec.r_tasks):
                rank_mask = (np.arange(r_max)[None, :]
                             < np.asarray(spec.r_tasks)[:, None])
                A_t = A_t * jnp.asarray(rank_mask, param_dtype)[:, None, :]
            if factored_tasks:
                # emit rank-space task output; the [T, ..., out] stream
                # materializes only at its final consumer — the fused
                # adapter kernel or the SwinBlock expansion (requires
                # static scales + 'matrix' mode)
                assert mode == "matrix" and not spec.trainable_scale_per_task
                if task_factored is not None:
                    # consume the upstream factored stream through the
                    # adapter kernel AND stay factored on the way out
                    from mtlora_tpu.ops.pallas_adapter_mlp import (
                        fused_adapter_mid)

                    f = task_factored
                    p_prev = f.pretrained.astype(dtype).reshape(
                        -1, self.in_features)
                    a2T = jnp.swapaxes(A_t.astype(dtype), 1, 2)
                    interp = jax.default_backend() == "cpu"
                    mid1T = fused_adapter_mid(f.midT, p_prev, f.B, a2T,
                                              f.scales, interp)
                elif x_tasks is None:
                    mid1T = jnp.einsum(
                        "mi,tir->trm",
                        x_drop.reshape(-1, self.in_features),
                        A_t.astype(dtype))
                else:
                    xt2 = x_tasks.astype(dtype).reshape(
                        T, -1, self.in_features)
                    mid1T = jnp.einsum("tmi,tir->trm", xt2,
                                       A_t.astype(dtype))
                return (pretrained + shared_update
                        if shared_update is not None else pretrained), \
                    FactoredTasks(pretrained=pretrained, midT=mid1T,
                                  B=B_t.astype(dtype),
                                  scales=spec.task_scales)
            # fold the per-task scale into B so the scale multiply rides
            # the einsum instead of a standalone [T, M, out] pass (s_t is
            # [T]-sized; with trainable scales the grad flows through the
            # tiny premultiply)
            B_eff = B_t.astype(dtype) * s_t.reshape(T, 1, 1)
            if task_factored is not None:
                # fused path: gelu(p_prev + s1*mid1@B1) @ A2 inside the
                # Pallas kernel — the [T, ..., hidden] tensor never
                # touches HBM (ops/pallas_adapter_mlp.py)
                from mtlora_tpu.ops.pallas_adapter_mlp import (
                    fused_adapter_mid)

                f = task_factored
                p_prev = f.pretrained.astype(dtype).reshape(
                    -1, self.in_features)
                a2T = jnp.swapaxes(A_t.astype(dtype), 1, 2)
                interp = jax.default_backend() == "cpu"
                mid2T = fused_adapter_mid(f.midT, p_prev, f.B, a2T,
                                          f.scales, interp)
                task_update = jnp.einsum("trm,tro->tmo", mid2T, B_eff)
                task_update = task_update.reshape((T,) + pretrained.shape)
            else:
                # ONE batched-over-tasks low-rank update, tokens
                # flattened (see the dA-as-convolution note above);
                # shared-input layers (x_tasks None, e.g. attn proj)
                # contract the single stream against all T adapters in
                # one GEMM instead of broadcasting T input copies
                if x_tasks is None:
                    mid = jnp.einsum(
                        "mi,tir->tmr",
                        x_drop.reshape(-1, self.in_features),
                        A_t.astype(dtype))
                else:
                    xt2 = x_tasks.astype(dtype).reshape(
                        T, -1, self.in_features)
                    mid = jnp.einsum("tmi,tir->tmr", xt2,
                                     A_t.astype(dtype))
                task_update = jnp.einsum("tmr,tro->tmo", mid,
                                         B_eff).reshape(
                    (T,) + lead + (self.out_features,))
            if mode == "matrixv2" and shared_update is not None:
                # per-task output also carries the shared update
                # (reference models/lora.py:270-273); when merged, the
                # kernel already contains it
                y_tasks = pretrained[None] + shared_update[None] + task_update
            else:
                y_tasks = pretrained[None] + task_update
            if mode == "addition":
                # shared stream = LN(sum over per-task outputs)
                # (reference models/lora.py:275-282)
                shared_update = nn.LayerNorm(
                    dtype=dtype, name="lora_norm")(jnp.sum(y_tasks, axis=0))

        if shared_update is None:
            return pretrained, y_tasks
        return pretrained + shared_update, y_tasks


class TaskStream(NamedTuple):
    """IMPLICIT per-task streams around a shared residual:

        y_t = base + coef_t ⊙ (pre + s_t * mid_t^T B_t)

    (``base`` = attention shortcut, ``pre`` = proj's pretrained output,
    ``coef`` = per-(task, sample) stochastic-depth coefficient
    {0, 1/keep} or None for eval). The [T, B, L, C] task tensor never
    materializes: per-token LayerNorm statistics and the fc1 rank-r
    projection are computed from the SHARED [B, L, C] tensors plus
    rank-space cross terms (fold_task_ln_project), and the stream is
    expanded exactly once at the block output (expand_task_streams)."""
    base: jnp.ndarray               # [B, L, C]
    pre: jnp.ndarray                # [B, L, C]
    midT: jnp.ndarray               # [T, r, M]   (M = B*L)
    B: jnp.ndarray                  # [T, r, C]
    scales: Tuple[float, ...]
    coef: Optional[jnp.ndarray]     # [T, B, 1] or None (== all ones)


class DeferredTasks(NamedTuple):
    """Stage-final task streams handed to PatchMerging UNEXPANDED so the
    fused factored-task merge kernel (ops/pallas_task_merge.py) can
    consume them; the [T, B, L, C] tensor never materializes.  Falls
    back to expand_task_streams when the kernel's shape gate fails."""
    stream: TaskStream
    f2: FactoredTasks
    coef2: Optional[jnp.ndarray]    # [T, B, 1] or None


def fold_task_ln_project(stream: TaskStream, gamma, beta, A_t,
                         eps: float = 1e-5):
    """LN(y_t) @ A_t in rank space without materializing y_t.

    With y_t = b + c*(p + u_t), u_t = s_t * B_t^T mid_t:
      mu_t    = mu_b + c*(mu_p + s_t * rowmean(B_t)·mid_t)
      E[y²]_t = E[b²] + 2c(E[bp] + E[b·u]) + c²(E[p²] + 2E[p·u] + E[u²])
      LN(y)@A = inv*((b·γ)@A + c((p·γ)@A + s_t·mid^T(B_t γ)@A)
                - mu*(γ@A)) + β@A
    Cross moments with the rank factors reduce to [T, M, r]-sized
    contractions; only b and p (shared [M, C]) are read at full width.
    Returns mid1T [T, r1, M] (same contract as the materialized path).
    """
    C = stream.base.shape[-1]
    T, r, M = stream.midT.shape
    dt = stream.midT.dtype
    b2 = stream.base.reshape(-1, C).astype(dt)
    p2 = stream.pre.reshape(-1, C).astype(dt)
    mid = stream.midT
    Bm = stream.B
    s = jnp.asarray(stream.scales, jnp.float32).reshape(T, 1)   # [T,1]
    if stream.coef is None:
        c = jnp.ones((T, 1), jnp.float32)
    else:
        nB = stream.coef.shape[1]
        c = stream.coef.reshape(T, nB, 1) * jnp.ones(
            (T, nB, M // nB), jnp.float32)
        c = c.reshape(T, M)                                     # [T,M]
    g32 = gamma.astype(jnp.float32)
    A32 = A_t.astype(jnp.float32)

    # shared-tensor moments (full-width reads of b and p only)
    b32 = b2.astype(jnp.float32)
    p32 = p2.astype(jnp.float32)
    mu_b = b32.mean(-1)
    mu_p = p32.mean(-1)
    e_bb = (b32 * b32).mean(-1)
    e_pp = (p32 * p32).mean(-1)
    e_bp = (b32 * p32).mean(-1)

    # rank-space cross moments
    # bB[t,m,r] = sum_c b[m,c] B[t,r,c]
    bB = jnp.einsum("mc,trc->tmr", b2, Bm,
                    preferred_element_type=jnp.float32)
    pB = jnp.einsum("mc,trc->tmr", p2, Bm,
                    preferred_element_type=jnp.float32)
    midf = mid.astype(jnp.float32)
    mid_m = jnp.swapaxes(midf, 1, 2)                            # [T,M,r]
    e_bu = s / C * jnp.sum(bB * mid_m, -1)                      # [T,M]
    e_pu = s / C * jnp.sum(pB * mid_m, -1)
    G = jnp.einsum("tsc,trc->tsr", Bm, Bm,
                   preferred_element_type=jnp.float32)          # [T,r,r]
    tmp = jnp.einsum("tsr,trm->tsm", G, midf)
    e_uu = (s * s) / C * jnp.sum(midf * tmp, 1)                 # [T,M]
    mu_u = s / C * jnp.einsum("tr,trm->tm", Bm.sum(-1).astype(
        jnp.float32), midf)

    mu = mu_b[None] + c * (mu_p[None] + mu_u)                   # [T,M]
    e_yy = (e_bb[None] + 2 * c * (e_bp[None] + e_bu)
            + c * c * (e_pp[None] + 2 * e_pu + e_uu))
    var = jnp.maximum(e_yy - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)                              # [T,M]

    # projections (gamma folded into A)
    gA = (A32 * g32[None, :, None]).astype(dt)                  # [T,C,r1]
    bgA = jnp.einsum("mc,tcq->tqm", b2, gA,
                     preferred_element_type=jnp.float32)        # [T,r1,M]
    pgA = jnp.einsum("mc,tcq->tqm", p2, gA,
                     preferred_element_type=jnp.float32)
    BgA = jnp.einsum("trc,tcq->trq", Bm.astype(dt), gA,
                     preferred_element_type=jnp.float32)        # [T,r,r1]
    ugA = s[..., None].swapaxes(1, 2) * jnp.einsum(
        "trm,trq->tqm", midf, BgA)                              # [T,r1,M]
    gAs = jnp.einsum("c,tcq->tq", g32, A32)                     # [T,r1]
    bA = jnp.einsum("c,tcq->tq", beta.astype(jnp.float32), A32)
    proj = (bgA + c[:, None, :] * (pgA + ugA)
            - mu[:, None, :] * gAs[..., None])
    return (inv[:, None, :] * proj + bA[..., None]).astype(dt)


def expand_task_streams(stream: TaskStream, f2: Optional[FactoredTasks],
                        coef2=None):
    """Materialize the block-output task streams in ONE fused write:

        y_t = base + c1_t ⊙ (pre + s_t mid^T B) [+ c2_t ⊙ (p2 + up2)]

    (second term: the MLP's factored task output with its own
    stochastic-depth coefficient). Returns [T, B, L, C]."""
    Bb, L, C = stream.base.shape
    T = stream.midT.shape[0]
    dt = stream.base.dtype
    s = jnp.asarray(stream.scales, dt).reshape(T, 1, 1)
    up1 = jnp.einsum("trm,tro->tmo", stream.midT, stream.B * s)
    d1 = stream.pre.reshape(1, -1, C) + up1
    if stream.coef is not None:
        d1 = d1.reshape(T, Bb, L, C) * stream.coef.astype(dt)[..., None]
        d1 = d1.reshape(T, -1, C)
    y = stream.base.reshape(1, -1, C) + d1
    if f2 is not None:
        C2 = f2.B.shape[-1]
        s2 = jnp.asarray(f2.scales, dt).reshape(T, 1, 1)
        up2 = jnp.einsum("trm,tro->tmo", f2.midT, f2.B * s2)
        d2 = f2.pretrained.reshape(1, -1, C2) + up2
        if coef2 is not None:
            d2 = d2.reshape(T, Bb, L, C2) * coef2.astype(dt)[..., None]
            d2 = d2.reshape(T, -1, C2)
        y = y + d2
    return y.reshape(T, Bb, L, C)


def droppath_coef(rng, rate: float, T: int, B: int, deterministic: bool):
    """Per-(task, sample) stochastic-depth coefficient in {0, 1/keep};
    None when inactive (reference DropPath draws one mask per stream)."""
    if rate <= 0.0 or deterministic:
        return None
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, (T, B, 1))
    return jnp.where(mask, jnp.float32(1.0 / keep), jnp.float32(0.0))


def expand_factored_tasks(f: FactoredTasks, lead, drop_path: float = 0.0,
                          deterministic: bool = True, rng=None,
                          base=None):
    """Materialize a factored task stream in ONE fused pass:

        y_t = base_t + DropPath(pretrained + s_t * mid_t^T B_t)

    The rank expansion, the pretrained broadcast add, the stochastic-
    depth mask, and the residual add fuse into a single [T, ..., out]
    write — versus the module path's separate task-einsum output,
    y_tasks add, and DropPath where() passes (each a full-width
    read+write). ``base`` is the residual ([*lead, out], broadcast over
    T, e.g. the attention shortcut) or None (reference quirk: no
    shortcut when only the MLP produced task streams,
    swin_transformer_mtlora.py:401-403)."""
    T = f.B.shape[0]
    C = f.B.shape[-1]
    s = jnp.asarray(f.scales, f.B.dtype).reshape(T, 1, 1)
    up = jnp.einsum("trm,tro->tmo", f.midT, f.B * s)
    y = f.pretrained.reshape(1, -1, C) + up           # [T, M, C]
    y = y.reshape((T,) + tuple(lead) + (C,))
    if drop_path > 0.0 and not deterministic:
        keep = 1.0 - drop_path
        mask_shape = (T,) + tuple(lead[:-1]) + (1, 1)
        mask = jax.random.bernoulli(rng, keep, mask_shape)
        # reciprocal-multiply: a broadcast f32 divide over [T, M, C] runs
        # ~60% the bandwidth of a multiply on the VPU (measured 7.7 ms
        # div fusion at stage 0)
        y = jnp.where(mask, y * (1.0 / keep), 0.0)
    if base is None:
        return y
    return (base[None] if base.ndim == y.ndim - 1 else base) + y


class LoRALinear(nn.Module):
    """Single-adapter LoRA linear (reference models/lora.py:87-156).

    Scaling follows the classic alpha/r rule. Used outside the MTL path.
    """
    in_features: int
    out_features: int
    r: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        param_dtype = jnp.float32
        kernel = self.param(
            "kernel", nn.initializers.truncated_normal(0.02, lower=-2, upper=2),
            (self.in_features, self.out_features), param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_features,), param_dtype)
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)
        y = xc @ kernel.astype(dtype)
        if bias is not None:
            y = y + bias.astype(dtype)
        if self.r == 0:
            return y
        A = self.param("lora_A", _kaiming_uniform_rows,
                       (self.in_features, self.r), param_dtype)
        B = self.param("lora_B", nn.initializers.zeros,
                       (self.r, self.out_features), param_dtype)
        x_drop = xc
        if self.lora_dropout > 0.0 and not deterministic:
            x_drop = _fast_drop(self.make_rng("dropout"),
                                self.lora_dropout, xc)
        scaling = self.lora_alpha / self.r
        return y + (x_drop @ A.astype(dtype)) @ B.astype(dtype) * scaling


class MTLoRAQKV(nn.Module):
    """Split q/k/v MTLoRA projection (reference MTLoRAQKV,
    models/lora.py:287-325): three independent MTLoRALinear branches whose
    outputs concatenate on the feature axis. Selected by
    ``MODEL.MTLORA.SPLIT_QKV``; checkpoint keys ``attn.qkv.{q,k,v}.*``
    (utils.py:653-660 chunks fused qkv weights into thirds).

    Unlike the reference — which recomputes each branch three times
    (models/lora.py:323-325, flagged in SURVEY.md section 7.4) — each
    branch runs once.
    """
    in_features: int
    out_features: int
    spec: LoRASpec = LoRASpec()
    has_tasks: bool = False
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, x_tasks=None, *, deterministic: bool = True):
        outs, task_outs = [], []
        for name in ("q", "k", "v"):
            y, t = MTLoRALinear(
                self.in_features, self.out_features, spec=self.spec,
                has_tasks=self.has_tasks, use_bias=self.use_bias,
                dtype=self.dtype, name=name)(
                x, x_tasks, deterministic=deterministic)
            outs.append(y)
            task_outs.append(t)
        y = jnp.concatenate(outs, axis=-1)
        if task_outs[0] is None:
            return y, None
        return y, jnp.concatenate(task_outs, axis=-1)


class LoRAQKVLinear(nn.Module):
    """Fused qkv linear with selectively-enabled LoRA per q/k/v group
    (reference LoRAQKVLinear, models/lora.py:328-577, including grouped
    application and zero-padding of disabled groups; the conv1d grouping
    trick becomes a blocked matmul). Supports MQA/GQA-style kv sizing via
    ``n_query_groups``.
    """
    in_features: int
    out_features: int
    n_head: int
    n_query_groups: int
    r: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    enable_lora: Tuple[bool, bool, bool] = (False, False, False)
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        param_dtype = jnp.float32
        kernel = self.param(
            "kernel", nn.initializers.truncated_normal(0.02, lower=-2, upper=2),
            (self.in_features, self.out_features), param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_features,), param_dtype)
                if self.use_bias else None)
        dtype = self.dtype or x.dtype
        xc = x.astype(dtype)
        y = xc @ kernel.astype(dtype)
        if bias is not None:
            y = y + bias.astype(dtype)
        enable = tuple(bool(e) for e in self.enable_lora)
        if self.r == 0 or not any(enable):
            return y

        kv_embd = self.in_features // (self.n_head // self.n_query_groups)
        group_sizes = (self.in_features * enable[0],
                       kv_embd * enable[1], kv_embd * enable[2])
        active = [s for s in group_sizes if s]
        n_active = sum(enable)
        # A stacked per active group: [n_active*r, in]; B: [sum(active), r]
        A = self.param("lora_A", _kaiming_uniform_rows,
                       (self.in_features, n_active * self.r), param_dtype)
        B = self.param("lora_B", nn.initializers.zeros,
                       (self.r, sum(active)), param_dtype)
        x_drop = xc
        if self.lora_dropout > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.lora_dropout,
                                        xc.shape)
            x_drop = jnp.where(keep, xc / (1.0 - self.lora_dropout), 0.0)
        after_A = x_drop @ A.astype(dtype)  # [..., n_active*r]
        # grouped B application: group g consumes its own r slice of A's
        # output (the reference's grouped conv1d, models/lora.py:482-519)
        pieces = []
        b_off = 0
        for g in range(n_active):
            Bg = B[:, b_off:b_off + active[g]].astype(dtype)
            Ag_out = after_A[..., g * self.r:(g + 1) * self.r]
            pieces.append(Ag_out @ Bg)
            b_off += active[g]
        delta = jnp.concatenate(pieces, axis=-1)
        # zero_pad (models/lora.py:437-480): route active-group updates to
        # their q/k/v output positions, zeros elsewhere
        scaling = self.lora_alpha / self.r
        if all(enable):
            return y + delta * scaling
        q_end = self.in_features
        k_end = q_end + kv_embd
        segs = []
        off = 0
        bounds = ((0, q_end), (q_end, k_end), (k_end, self.out_features))
        for e, (lo, hi) in zip(enable, bounds):
            width = hi - lo
            if e:
                segs.append(delta[..., off:off + width])
                off += width
            else:
                segs.append(jnp.zeros(delta.shape[:-1] + (width,), dtype))
        return y + jnp.concatenate(segs, axis=-1) * scaling


def _stage_of(path: Tuple[str, ...]) -> Optional[int]:
    """Swin stage index from a flattened param path (…/layers_{i}/…)."""
    for p in path:
        if p.startswith("layers_") and p[7:].isdigit():
            return int(p[7:])
    return None


def merge_lora_weights(params, mtlora: Optional[MTLoRASpec] = None):
    """Fold shared-LoRA updates into the frozen kernels for fast inference:
    ``kernel += (A_s @ B_s) * s_s`` (reference merge_lora_weights,
    models/lora.py:637-641, which the reference applies only to plain
    LoRALinear — MTLoRALinear.merge is NotImplemented there,
    models/lora.py:249-251; here the MTL layers merge too where valid).

    Scale resolution is trainable-scale aware: a ``lora_shared_scale``
    param wins; otherwise the static ``stage_specs[stage].shared_scale``.

    Merging is skipped on layers with per-task branches in ``matrix``/
    ``addition`` mode — there the per-task outputs do NOT carry the shared
    update, so folding it into the kernel would corrupt them. In
    ``matrixv2`` every stream carries the shared update and all layers
    merge. Merged layers get ``lora_shared_B`` zeroed, so applying the
    UNMERGED model with merged params is output-identical (tested in
    tests/test_lora_extra.py); build the model with the returned spec for
    the fast path that skips the adapter GEMMs entirely.

    Returns ``(new_params, merged_spec)``; ``merged_spec`` is None when no
    spec was given.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = dict(flat)
    for path, A in flat.items():
        if path[-1] != "lora_shared_A":
            continue
        base = path[:-1]
        B = flat.get(base + ("lora_shared_B",))
        kernel = flat.get(base + ("kernel",))
        if B is None or kernel is None:
            continue
        stage = _stage_of(base)
        spec = None
        if (mtlora is not None and mtlora.stage_specs and stage is not None
                and stage < len(mtlora.stage_specs)):
            spec = mtlora.stage_specs[stage]
        mode = spec.shared_mode if spec is not None else "matrix"
        has_tasks = (base + ("lora_tasks_B",)) in flat
        if has_tasks and mode != "matrixv2":
            continue  # per-task streams don't carry the shared update
        scale_p = flat.get(base + ("lora_shared_scale",))
        if scale_p is not None:
            s = scale_p.reshape(())
        elif spec is not None:
            s = spec.shared_scale
        else:
            s = 1.0
        out[base + ("kernel",)] = kernel + (A @ B) * s
        out[base + ("lora_shared_B",)] = jnp.zeros_like(B)
    merged_spec = None
    if mtlora is not None:
        merged_spec = dataclasses.replace(mtlora, stage_specs=tuple(
            dataclasses.replace(s, shared_merged=True)
            for s in mtlora.stage_specs))
    return flax.traverse_util.unflatten_dict(out), merged_spec


def is_lora_param(path: Tuple[str, ...]) -> bool:
    """True if a flattened param path belongs to a LoRA adapter."""
    return any(p.startswith("lora_") for p in path)
