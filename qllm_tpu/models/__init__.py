"""Functional JAX causal-LM model family.

The rebuild's analog of HF-model-plus-QuantLinear-surgery
(reference qllm/modeling/base.py + utils/modelutils.py:161-181): here a
model is a pure function over a params pytree whose linear leaves are
either dense arrays or QuantizedTensor — no module replacement needed.
"""

from .llama import ModelConfig, init_params, forward, TINY_LLAMA_TEST_CONFIG
from .generate import greedy_generate, prefill, decode_step, sample_generate
from .sampling import SamplingParams
from .speculative import draft_speculative_generate, speculative_generate

__all__ = [
    "ModelConfig",
    "init_params",
    "forward",
    "greedy_generate",
    "sample_generate",
    "SamplingParams",
    "speculative_generate",
    "draft_speculative_generate",
    "prefill",
    "decode_step",
    "TINY_LLAMA_TEST_CONFIG",
]
