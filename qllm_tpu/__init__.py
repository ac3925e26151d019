"""qllm_tpu — a TPU-native weight-only quantization framework for LLMs.

A from-scratch JAX/XLA/Pallas rebuild of the capability surface of
wejoncy/QLLM (see /root/reference): GPTQ / AWQ / HQQ / VPTQ quantization
algorithms, 2–8 bit packed-weight formats with layout interconversion
(GPTQ / AWQ-GEMM / Marlin / ORT / HQQ import-export), fused
dequant+matmul Pallas kernels, quantized KV-cache decode, perplexity
eval, chat loop, and checkpoint compatibility with the
AutoGPTQ/AutoAWQ/QLLM config dialects.

Design notes (TPU-first, not a port):
  * One canonical packed layout tuned for the MXU/VPU lane structure;
    foreign layouts (AWQ interleave, Marlin tiles, ORT MatMulNBits) are
    conversion sources/targets only  (reference keeps five live layouts:
    qllm/modeling/q_layers/*).
  * Quantized tensors are pytrees; models are pure functions; parallelism
    is jax.sharding.Mesh + NamedSharding + shard_map, not device hooks.
  * The compute hot path (dequant+matmul GEMM & GEMV, decode attention
    with INT8 KV cache) is Pallas; everything else is XLA.
"""

__version__ = "0.1.0"

from .quant.qtensor import QuantizedTensor, quantize_tensor, dequantize_tensor
from .quant.config import (
    GPTQConfig,
    AWQConfig,
    HQQConfig,
    VPTQConfig,
    MetaConfig,
    build_config,
)

__all__ = [
    "QuantizedTensor",
    "quantize_tensor",
    "dequantize_tensor",
    "GPTQConfig",
    "AWQConfig",
    "HQQConfig",
    "VPTQConfig",
    "MetaConfig",
    "build_config",
    "__version__",
]
