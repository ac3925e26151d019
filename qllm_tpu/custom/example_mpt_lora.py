"""Worked out-of-tree custom-model example: MPT + LoRA (merged).

The reference ships a real custom integration — ADS-MPT with loralib
adapters, loaded by its own code and fed through the standard quantize
pipeline (/root/reference/qllm/custom/run.py:23-160, custom/m_mpt.py).
This is the qllm_tpu equivalent: an architecture the registry does NOT
know how to load directly (an MPT checkpoint carrying out-of-tree
``lora.safetensors`` adapters on the fused Wqkv), handled entirely by
overriding ``CustomModel.get_torch_model`` / ``get_datasets``:

1. load the base HF-MPT weights + the LoRA A/B factors,
2. merge W <- W + (alpha/r) * B@A (the deploy-time fold loralib's
   ``merge_weights`` does),
3. map the merged state onto the qllm_tpu params pytree via the same
   spec machinery the registry uses,
4. return custom calibration tokens (the "ads prompts" stand-in).

From there the standard pipeline quantizes, saves (plain MPT dialect —
the adapters are folded, so any consumer can reload it), and serves.
Exercised end-to-end by tests/test_custom.py.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.llama import ModelConfig
from ..utils.logger import get_logger
from .run import CustomModel

logger = get_logger()

__all__ = ["MptLoraCustomModel", "make_tiny_mpt_lora_checkpoint"]

LORA_FILE = "lora.safetensors"


class MptLoraCustomModel(CustomModel):
    """``args.model`` points at a dir holding a standard HF-MPT
    checkpoint PLUS ``lora.safetensors`` with keys
    ``transformer.blocks.<i>.attn.Wqkv.lora_A`` ([r, D]) /
    ``...lora_B`` ([3D, r]) and a scalar ``lora_alpha``."""

    def get_torch_model(
        self, args
    ) -> Tuple[Dict[str, Any], ModelConfig]:
        from safetensors import safe_open

        from ..modeling.archs import spec_for_config
        from ..modeling.auto import (
            AutoQuantizedModelForCausalLM as AutoQ,
            _load_config_dict,
            _st_load,
        )

        path = args.load or args.model
        lora_path = os.path.join(path, LORA_FILE)
        if not os.path.exists(lora_path):
            raise FileNotFoundError(
                f"{lora_path} not found — this custom model expects "
                "out-of-tree LoRA adapters next to the base checkpoint"
            )
        tensors = _st_load(path)
        with safe_open(lora_path, framework="np") as f:
            lora = {k: f.get_tensor(k) for k in f.keys()}
        alpha = float(lora.pop("lora_alpha")[0])

        # deploy-time LoRA fold: W <- W + (alpha/r) * B @ A, done on the
        # torch-layout [out, in] weights BEFORE the pytree mapping (the
        # same math loralib's merge_weights applies on eval())
        n_merged = 0
        for k in list(lora.keys()):
            if not k.endswith(".lora_A"):
                continue
            base_key = k[: -len(".lora_A")] + ".weight"
            a = lora[k]  # [r, in]
            b = lora[k[: -len(".lora_A")] + ".lora_B"]  # [out, r]
            if base_key not in tensors:
                raise KeyError(f"LoRA targets missing base key {base_key}")
            r = a.shape[0]
            w = tensors[base_key].astype(np.float32)
            tensors[base_key] = (w + (alpha / r) * (b @ a)).astype(
                tensors[base_key].dtype
            )
            n_merged += 1
        logger.info(f"merged {n_merged} LoRA adapters (alpha={alpha})")

        hf_cfg = _load_config_dict(path)
        spec = spec_for_config(hf_cfg)
        cfg = spec.config_fn(hf_cfg)
        params = AutoQ._float_params(tensors, cfg, spec, jnp.float32)
        self._try_load_tokenizer(args)
        return params, cfg

    def get_datasets(self, args):
        # the custom calibration corpus (the reference example carries
        # its own ads-prompt dataset); deterministic synthetic ids here
        rng = np.random.default_rng(args.seed)
        n = max(2, min(args.nsamples, 16))
        t = min(args.seqlen, 64)
        return jnp.asarray(rng.integers(1, 100, size=(n, t)), jnp.int32)


def make_tiny_mpt_lora_checkpoint(path: str, r: int = 4, alpha: float = 8.0):
    """Build the example's input artifact: a tiny random HF-MPT
    checkpoint with LoRA A/B factors on every block's fused Wqkv.
    Returns the merged torch model (the parity oracle)."""
    import torch
    import transformers
    from safetensors.numpy import save_file

    cfg = transformers.MptConfig(
        vocab_size=128,
        d_model=64,
        n_heads=4,
        n_layers=2,
        expansion_ratio=4,
        max_seq_len=128,
    )
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    model = transformers.MptForCausalLM(cfg).eval().to(torch.float32)
    model.save_pretrained(path, safe_serialization=True)

    rng = np.random.default_rng(1)
    lora: Dict[str, np.ndarray] = {"lora_alpha": np.array([alpha], np.float32)}
    for i in range(cfg.n_layers):
        base = f"transformer.blocks.{i}.attn.Wqkv"
        d = cfg.d_model
        lora[f"{base}.lora_A"] = (
            rng.normal(size=(r, d)).astype(np.float32) * 0.05
        )
        lora[f"{base}.lora_B"] = (
            rng.normal(size=(3 * d, r)).astype(np.float32) * 0.05
        )
    save_file(lora, os.path.join(path, LORA_FILE))

    # merged torch oracle
    with torch.no_grad():
        for i in range(cfg.n_layers):
            base = f"transformer.blocks.{i}.attn.Wqkv"
            w = model.get_submodule(base).weight
            a = torch.from_numpy(lora[f"{base}.lora_A"])
            b = torch.from_numpy(lora[f"{base}.lora_B"])
            w += (alpha / r) * (b @ a)
    return model
