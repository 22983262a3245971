"""Model zoo: LoRA adapters, Swin backbones, decode heads, MTL assembly."""

from mtlora_tpu.models.lora import (  # noqa: F401
    LoRASpec,
    MTLoRASpec,
    MTLoRALinear,
    LoRALinear,
)
