"""MTLoRA-TPU: a TPU-native multi-task LoRA dense-prediction framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
scale-lab/MTLoRA (CVPR 2024): a frozen Swin Transformer backbone adapted to
multiple dense-prediction tasks (semantic segmentation, surface normals,
saliency, human parts, edges, depth) via task-shared and task-specific
low-rank (LoRA) adapters, trained and evaluated end-to-end under ``jit``
with data-parallel sharding over a TPU mesh.

Layer map (mirrors reference layering, SURVEY.md section 1):
  - ``mtlora_tpu.config``   -- YAML config tree (schema-compatible with the
                               reference's ``config.py`` yacs tree)
  - ``mtlora_tpu.models``   -- LoRA adapters, Swin backbone, decode heads,
                               multi-task assembly
  - ``mtlora_tpu.ops``      -- Pallas TPU kernels + jnp reference impls
  - ``mtlora_tpu.parallel`` -- mesh/sharding utilities
  - ``mtlora_tpu.data``     -- PASCAL-Context / NYUD pipelines
  - ``mtlora_tpu.train``    -- losses, metrics, optimizer, train/eval steps
  - ``mtlora_tpu.ckpt``     -- orbax checkpointing + torch converter
"""

__version__ = "0.1.0"
