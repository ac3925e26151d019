"""Layer-by-layer quantization skeleton.

Reference QuantFrameBase (quant_frame_base.py) needs a Catcher module
to hijack block-0 inputs (:74-109) and moves blocks on/off the GPU.
Here the model is already a pure function over a params pytree, so the
skeleton is plain data flow:

  * ``quantize_params_uniform`` — map a per-weight quantizer over every
    quantizable leaf (data-free methods).
  * ``block_inputs`` / ``run_block`` — compute the hidden-state inputs
    of transformer block i for calibration-based methods (GPTQ/AWQ),
    propagating *quantized* activations block-to-block exactly like the
    reference outer loop (quant_gptq.py:90-157).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.llama import (
    ALL_LINEAR_NAMES,
    ModelConfig,
    _layer_forward,
    _rope_cos_sin,
    build_mask,
    embed_tokens_forward,
)

__all__ = [
    "quantize_params_uniform",
    "embed_inputs",
    "run_block",
    "resolve_layer_bits",
    "load_layer_cache",
    "save_layer_cache",
]


def save_layer_cache(cache_dir: Optional[str], i: int, nlp) -> None:
    """Idempotent per-layer quantization cache for crash resume
    (reference: VPTQ per-layer .pt cache + done.txt markers,
    quant_vptq.py:148-152, 198-205)."""
    if not cache_dir:
        return
    import os
    import pickle

    os.makedirs(cache_dir, exist_ok=True)
    import numpy as np

    host = jax.tree_util.tree_map(lambda x: np.asarray(x), nlp)
    tmp = f"{cache_dir}/layer_{i}.pkl.tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host, f)
    os.replace(tmp, f"{cache_dir}/layer_{i}.pkl")  # atomic marker


def load_layer_cache(cache_dir: Optional[str], i: int):
    if not cache_dir:
        return None
    import os
    import pickle

    p = f"{cache_dir}/layer_{i}.pkl"
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        host = pickle.load(f)
    return jax.tree_util.tree_map(jnp.asarray, host)


def resolve_layer_bits(
    layer_name: str,
    default_bits: int,
    default_gs: int,
    layer_overrides: Optional[Dict[str, Any]] = None,
) -> Tuple[int, int]:
    """Per-layer (bits, group_size) with mix_qlayer_conf-style overrides
    (reference hook: quant_frame_base.py:111-116; keys may be full layer
    names or substrings)."""
    if layer_overrides:
        for key, conf in layer_overrides.items():
            if key == layer_name or key in layer_name:
                return (
                    int(conf.get("wbits", conf.get("bits", default_bits))),
                    int(conf.get("groupsize", conf.get("group_size", default_gs))),
                )
    return default_bits, default_gs


def quantize_params_uniform(
    params: Dict[str, Any],
    quantize_fn: Callable[[jax.Array, int, int], Any],
    bits: int,
    group_size: int,
    layer_overrides: Optional[Dict[str, Any]] = None,
    progress: bool = True,
) -> Dict[str, Any]:
    """Replace every quantizable dense leaf with quantize_fn(w, bits, gs)."""
    new_layers: List[Dict[str, Any]] = []
    for i, lp in enumerate(params["layers"]):
        nlp = dict(lp)
        for name in ALL_LINEAR_NAMES:
            if name not in lp:
                continue
            full = f"model.layers.{i}.{name}"
            b, gs = resolve_layer_bits(full, bits, group_size, layer_overrides)
            if b >= 16:
                continue
            nlp[name] = quantize_fn(lp[name], b, gs)
        if "shared_experts" in lp:  # deepseek always-on shared experts
            nse = dict(lp["shared_experts"])
            for name in ("gate_proj", "up_proj", "down_proj"):
                full = f"model.layers.{i}.shared_experts.{name}"
                b, gs = resolve_layer_bits(
                    full, bits, group_size, layer_overrides
                )
                if b >= 16:
                    continue
                nse[name] = quantize_fn(nse[name], b, gs)
            nlp["shared_experts"] = nse
        if "experts" in lp:  # MoE: quantize every expert projection
            nexp = []
            for e, ep in enumerate(lp["experts"]):
                nep = dict(ep)
                for name in ("gate_proj", "up_proj", "down_proj"):
                    full = f"model.layers.{i}.experts.{e}.{name}"
                    b, gs = resolve_layer_bits(
                        full, bits, group_size, layer_overrides
                    )
                    if b >= 16:
                        continue
                    nep[name] = quantize_fn(ep[name], b, gs)
                nexp.append(nep)
            nlp["experts"] = nexp
        new_layers.append(nlp)
        if progress:
            print(f"[quant] layer {i + 1}/{len(params['layers'])}", flush=True)
    out = dict(params)
    out["layers"] = new_layers
    return out


def embed_inputs(
    params: Dict[str, Any], cfg: ModelConfig, token_ids: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Token ids [B, T] -> (hidden [B, T, D], cos, sin, causal mask).

    The functional replacement of the reference Catcher hijack
    (quant_frame_base.py:74-109): these are exactly the inputs block 0
    receives.
    """
    B, T = token_ids.shape
    positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    h = embed_tokens_forward(params, cfg, token_ids, positions)
    if cfg.pos_embedding == "rope":
        cos, sin = _rope_cos_sin(
            positions, cfg.rot_dim, cfg.rope_theta, cfg.rope_style, cfg=cfg
        )
    else:
        cos = sin = None
    mask = build_mask(cfg, B, T, T, None)
    return h, cos, sin, mask


def run_block(
    layer_params: Dict[str, Any],
    cfg: ModelConfig,
    h: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Forward one transformer block (no cache) — used both to collect
    per-linear calibration inputs and to propagate quantized activations
    to the next block (reference quant_gptq.py:146-154)."""
    out, _ = _layer_forward(
        layer_params, cfg, h, cos, sin, mask, cache=None, layer_idx=0, pos=None
    )
    return out
