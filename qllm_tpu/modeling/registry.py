"""HF config.json -> ModelConfig mapping for supported architectures.

The analog of the reference's per-architecture tables
(sequential_layes_awq_config.py lists ~27 archs); the llama shape
family (llama/llama2/llama3/tinyllama/mistral/qwen2/vicuna/yi) shares
one functional implementation here.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

from ..models.llama import ModelConfig

__all__ = ["model_config_from_hf", "SUPPORTED_ARCHS"]

SUPPORTED_ARCHS = {
    "LlamaForCausalLM": "llama",
    "MistralForCausalLM": "mistral",
    "Qwen2ForCausalLM": "qwen2",
    "MixtralForCausalLM": "mixtral",
}


def model_config_from_hf(d: Dict[str, Any]) -> ModelConfig:
    archs = d.get("architectures") or ["LlamaForCausalLM"]
    arch = archs[0]
    if arch not in SUPPORTED_ARCHS:
        raise NotImplementedError(
            f"architecture {arch} not supported yet "
            f"(supported: {sorted(SUPPORTED_ARCHS)})"
        )
    kind = SUPPORTED_ARCHS[arch]
    return ModelConfig(
        vocab_size=d["vocab_size"],
        hidden_size=d["hidden_size"],
        intermediate_size=d["intermediate_size"],
        num_hidden_layers=d["num_hidden_layers"],
        num_attention_heads=d["num_attention_heads"],
        num_key_value_heads=d.get(
            "num_key_value_heads", d["num_attention_heads"]
        ),
        head_dim=d.get("head_dim"),
        rms_norm_eps=d.get("rms_norm_eps", 1e-5),
        rope_theta=d.get("rope_theta", 10000.0),
        max_position_embeddings=d.get("max_position_embeddings", 4096),
        tie_word_embeddings=d.get("tie_word_embeddings", False),
        attention_bias=(kind == "qwen2") or d.get("attention_bias", False),
        arch=kind,
        num_local_experts=d.get("num_local_experts", 0)
        if kind == "mixtral"
        else 0,
        num_experts_per_tok=d.get("num_experts_per_tok", 2),
    )


def hf_config_dict(cfg: ModelConfig) -> Dict[str, Any]:
    arch = {
        "llama": "LlamaForCausalLM",
        "mistral": "MistralForCausalLM",
        "qwen2": "Qwen2ForCausalLM",
        "mixtral": "MixtralForCausalLM",
    }.get(cfg.arch, "LlamaForCausalLM")
    moe = (
        {
            "num_local_experts": cfg.num_local_experts,
            "num_experts_per_tok": cfg.num_experts_per_tok,
        }
        if cfg.num_local_experts
        else {}
    )
    return {
        **moe,
        "architectures": [arch],
        "model_type": cfg.arch,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": cfg.num_attention_heads,
        "num_key_value_heads": cfg.num_key_value_heads,
        "head_dim": cfg.hd,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "attention_bias": cfg.attention_bias,
        "torch_dtype": "float16",
    }


def load_hf_config(path: str) -> ModelConfig:
    with open(os.path.join(path, "config.json")) as f:
        return model_config_from_hf(json.load(f))
