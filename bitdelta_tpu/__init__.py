"""bitdelta_tpu — a TPU-native 1-bit weight-delta compression framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
FasterDecoding/BitDelta: compress a fine-tuned LLM as
``W_fine = W_base + scale * sign(delta)`` (1 bit per delta element plus
one fp32 scale per matrix), refine the scales by logit distillation, and
serve many fine-tunes from one base model with fused W16+W1 kernels.

Layering (cf. SURVEY.md section 1):
  ops/       bit packing + binary GEMMs (XLA lowering and Pallas kernels)
  core/      delta quantization, model compression, artifacts
  models/    JAX Llama/Mistral family + HF safetensors import
  train/     scale distillation (jitted) + calibration data
  eval/      strided-window perplexity
  parallel/  mesh + sharding rules (TP/DP over named meshes)
  serving/   multi-tenant engine + HTTP server
"""

__version__ = "0.1.0"

from .core.delta import (  # noqa: F401
    BinaryDelta,
    apply_delta,
    delta_linear,
    dequantize_delta,
    quantize_delta,
)
from .ops.packing import pack_signs, unpack_signs, unpack_to_pm1  # noqa: F401
from .ops.binary_matmul import (  # noqa: F401
    binary_bmm,
    binary_matmul,
    tenant_binary_matmul,
)
from .core.compress import (  # noqa: F401
    CompressedModel,
    compress_model,
    fuse_compressed,
    student_params,
)
from .core.artifact import load_delta, save_delta  # noqa: F401


def __getattr__(name):
    # Heavier subsystems load lazily so `import bitdelta_tpu` stays light.
    if name in ("Engine", "EngineFullError", "Request"):
        from .serving import engine
        return getattr(engine, name)
    if name == "stack_tenants":
        from .serving.stacking import stack_tenants
        return stack_tenants
    if name == "distill_scales":
        from .train.distill import distill_scales
        return distill_scales
    if name == "eval_ppl":
        from .eval.ppl import eval_ppl
        return eval_ppl
    if name in ("quantize_kv", "dequantize_kv"):
        from .ops import kv_quant
        return getattr(kv_quant, name)
    if name in ("Int4Weight", "Int8Weight", "quantize_base",
                "roundtrip_base"):
        from .research import quantized_base
        return getattr(quantized_base, name)
    if name in ("ColumnScaleDelta", "LoRADelta", "TernaryDelta",
                "fuse_variant_model"):
        from .research import variants
        return getattr(variants, name)
    if name in ("load_gptq_params", "int4_from_gptq", "int8_from_bnb",
                "dequantize_gptq"):
        from .models import quant_import
        return getattr(quant_import, name)
    raise AttributeError(name)
