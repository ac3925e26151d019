"""HF config.json -> ModelConfig mapping (delegates to modeling.archs).

The analog of the reference's per-architecture tables
(sequential_layes_gptq_config.py:4-150, sequential_layes_awq_config.py:
1-1238); the full dialect registry lives in archs.py — this module keeps
the original loader-facing API surface.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

from ..models.llama import ModelConfig
from .archs import (
    SUPPORTED_HF_ARCHS,
    model_config_from_hf_dict,
    normalized_config_dict,
)

__all__ = ["model_config_from_hf", "SUPPORTED_ARCHS", "load_hf_config"]

# kept as a name -> kind view for callers that introspect support
SUPPORTED_ARCHS = {name: name for name in SUPPORTED_HF_ARCHS}


def model_config_from_hf(d: Dict[str, Any]) -> ModelConfig:
    return model_config_from_hf_dict(d)


def hf_config_dict(cfg: ModelConfig) -> Dict[str, Any]:
    """config.json contents for save_pretrained.

    Uses the normalized dialect (every ModelConfig field verbatim +
    the HF architectures tag) so ANY supported arch round-trips; plain
    HF llama-family configs also load unchanged via archs.py.
    """
    return normalized_config_dict(cfg)


def load_hf_config(path: str) -> ModelConfig:
    with open(os.path.join(path, "config.json")) as f:
        return model_config_from_hf(json.load(f))
