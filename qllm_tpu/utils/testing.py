"""Synthetic quantized models for tests and throughput benchmarks.

Generates packed weights directly (random bits + sane scales) so a
7B-shaped model can be materialized on-chip without ever allocating the
dense fp32 weights (which would not fit in HBM).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.llama import LINEAR_NAMES, ModelConfig
from ..quant.qtensor import QuantizedTensor

__all__ = ["random_quantized_tensor", "random_quantized_params"]


def random_quantized_tensor(
    key: jax.Array,
    in_features: int,
    out_features: int,
    bits: int = 4,
    group_size: int = 128,
    scale: float = 0.01,
) -> QuantizedTensor:
    K, N = in_features, out_features
    if bits in (2, 4, 8):
        rows = K // (32 // bits)
    else:
        rows = bits * K // 32
    k1, k2 = jax.random.split(key)
    qweight = jax.random.bits(k1, (rows, N), jnp.uint32)
    G = 1 if group_size == -1 else K // group_size
    scales = (
        jax.random.uniform(k2, (G, N), jnp.float32, 0.5, 1.5) * scale
    ).astype(jnp.float16)
    zeros = jnp.full((G, N), (1 << bits) / 2.0, jnp.float16)
    return QuantizedTensor(
        qweight=qweight,
        scales=scales,
        zeros=zeros,
        perm=None,
        bits=bits,
        group_size=group_size,
        in_features=K,
        out_features=N,
        sym=False,
    )


def random_quantized_params(
    cfg: ModelConfig,
    key: jax.Array,
    bits: int = 4,
    group_size: int = 128,
    dtype=jnp.bfloat16,
    quantize_lm_head: bool = False,
) -> Dict[str, Any]:
    """Random W-quantized model params with dense embed/norm (and, when
    ``quantize_lm_head``, a packed lm_head — the serving option the
    reference lacks; it reads the dense head every decode step)."""
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    shapes = {
        "q_proj": (D, H * hd),
        "k_proj": (D, Hkv * hd),
        "v_proj": (D, Hkv * hd),
        "o_proj": (H * hd, D),
        "gate_proj": (D, I),
        "up_proj": (D, I),
        "down_proj": (I, D),
    }
    E = cfg.num_local_experts
    moe_names = [n for n in LINEAR_NAMES if n not in ("gate_proj", "up_proj", "down_proj")] if E else LINEAR_NAMES
    n_per_layer = len(moe_names) + (3 * E if E else 0)
    keys = jax.random.split(key, cfg.num_hidden_layers * n_per_layer + 3)
    ki = 0
    layers = []
    for _ in range(cfg.num_hidden_layers):
        lp = {
            "input_layernorm": jnp.ones((D,), dtype),
            "post_attention_layernorm": jnp.ones((D,), dtype),
        }
        for name in moe_names:
            Kf, Nf = shapes[name]
            lp[name] = random_quantized_tensor(
                keys[ki], Kf, Nf, bits, group_size
            )
            ki += 1
        if E:
            # MoE layer: dense router + E quantized expert MLPs (the
            # shapes HF MixtralSparseMoeBlock carries)
            lp["router"] = (
                jax.random.normal(keys[-3], (D, E), jnp.float32) * 0.02
            )
            experts = []
            for _e in range(E):
                ep = {}
                for name in ("gate_proj", "up_proj", "down_proj"):
                    Kf, Nf = shapes[name]
                    ep[name] = random_quantized_tensor(
                        keys[ki], Kf, Nf, bits, group_size
                    )
                    ki += 1
                experts.append(ep)
            lp["experts"] = experts
        layers.append(lp)
    params = {
        "embed_tokens": (
            jax.random.normal(keys[-2], (V, D), dtype) * 0.02
        ).astype(dtype),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "lm_head": (
            random_quantized_tensor(keys[-1], D, V, bits, group_size)
            if quantize_lm_head
            else (jax.random.normal(keys[-1], (D, V), dtype) * 0.02).astype(
                dtype
            )
        ),
    }
    return params
