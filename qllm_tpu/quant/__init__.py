"""Quantization algorithms and the canonical packed-tensor format.

Mirrors the capability of reference qllm/quantization/ (dispatch at
quantization/__init__.py:7-17) with a functional JAX design.
"""

from .qtensor import (
    QuantizedTensor,
    pack_rows,
    unpack_rows,
    quantize_tensor,
    dequantize_tensor,
)
from .config import build_config, MetaConfig


def get_quantizer(config):
    """method-name -> quantizer instance (reference quantization/__init__.py:7-17)."""
    method = config.quant_method
    if method == "gptq":
        from .gptq import GPTQQuantizer

        return GPTQQuantizer(config)
    if method == "awq":
        from .awq import AWQQuantizer

        return AWQQuantizer(config)
    if method == "hqq":
        from .hqq import HQQQuantizer

        return HQQQuantizer(config)
    if method == "vptq":
        from .vptq import VPTQQuantizer

        return VPTQQuantizer(config)
    raise ValueError(f"unknown quant_method: {method}")


__all__ = [
    "QuantizedTensor",
    "pack_rows",
    "unpack_rows",
    "quantize_tensor",
    "dequantize_tensor",
    "build_config",
    "MetaConfig",
    "get_quantizer",
]
