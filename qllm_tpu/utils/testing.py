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


def random_stacked_expert_tensor(
    key: jax.Array,
    n_experts: int,
    in_features: int,
    out_features: int,
    bits: int = 4,
    group_size: int = 128,
    scale: float = 0.01,
) -> QuantizedTensor:
    """A raw [E]-leading stacked expert QuantizedTensor in ONE RNG call
    per leaf — what tree-stacking E random_quantized_tensor results
    yields, minus the E-fold dispatch cost (generating a 128-expert
    qwen3-moe slab expert-by-expert is ~80 s of tunnel round trips;
    this is 3 device calls per layer entry)."""
    K, N, E = in_features, out_features, n_experts
    if bits in (2, 4, 8):
        rows = K // (32 // bits)
    else:
        rows = bits * K // 32
    k1, k2 = jax.random.split(key)
    qweight = jax.random.bits(k1, (E, rows, N), jnp.uint32)
    G = 1 if group_size == -1 else K // group_size
    scales = (
        jax.random.uniform(k2, (E, G, N), jnp.float32, 0.5, 1.5) * scale
    ).astype(jnp.float16)
    zeros = jnp.full((E, G, N), (1 << bits) / 2.0, jnp.float16)
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


def random_mla_moe_params(
    cfg: ModelConfig,
    key: jax.Array,
    bits: int = 4,
    group_size: int = 32,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """Random W-quantized deepseek-v2-shaped params: MLA attention
    (q-lora + kv latent projections), ``first_k_dense_replace`` dense
    layers, then MoE layers with routed experts + always-on shared
    experts. The shape family the reference quantizes via
    get_deepseek_v2_layers (sequential_layes_awq_config.py)."""
    D, V = cfg.hidden_size, cfg.vocab_size
    H = cfg.num_attention_heads
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    qk_hd = dn + dr
    E, moe_i = cfg.num_local_experts, cfg.moe_intermediate_size
    keys = iter(jax.random.split(key, 4 + cfg.num_hidden_layers * (9 + 3 * E)))

    def qt(K, N):
        return random_quantized_tensor(next(keys), K, N, bits, group_size)

    layers = []
    for li in range(cfg.num_hidden_layers):
        lp = {
            "input_layernorm": jnp.ones((D,), dtype),
            "post_attention_layernorm": jnp.ones((D,), dtype),
            "kv_a_proj_with_mqa": qt(D, cfg.kv_lora_rank + dr),
            "kv_a_layernorm": jnp.ones((cfg.kv_lora_rank,), dtype),
            "kv_b_proj": qt(cfg.kv_lora_rank, H * (dn + dv)),
            "o_proj": qt(H * dv, D),
        }
        if cfg.q_lora_rank:
            lp["q_a_proj"] = qt(D, cfg.q_lora_rank)
            lp["q_a_layernorm"] = jnp.ones((cfg.q_lora_rank,), dtype)
            lp["q_b_proj"] = qt(cfg.q_lora_rank, H * qk_hd)
        else:
            lp["q_proj"] = qt(D, H * qk_hd)
        if li < cfg.first_k_dense_replace or not E:
            for name, (Kf, Nf) in {
                "gate_proj": (D, cfg.intermediate_size),
                "up_proj": (D, cfg.intermediate_size),
                "down_proj": (cfg.intermediate_size, D),
            }.items():
                lp[name] = qt(Kf, Nf)
        else:
            lp["router"] = (
                jax.random.normal(next(keys), (D, E), jnp.float32) * 0.02
            )
            lp["experts"] = [
                {
                    "gate_proj": qt(D, moe_i),
                    "up_proj": qt(D, moe_i),
                    "down_proj": qt(moe_i, D),
                }
                for _ in range(E)
            ]
            if cfg.n_shared_experts:
                si = moe_i * cfg.n_shared_experts
                lp["shared_experts"] = {
                    "gate_proj": qt(D, si),
                    "up_proj": qt(D, si),
                    "down_proj": qt(si, D),
                }
        layers.append(lp)
    return {
        "embed_tokens": (
            jax.random.normal(next(keys), (V, D), dtype) * 0.02
        ).astype(dtype),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
        "lm_head": (
            jax.random.normal(next(keys), (D, V), dtype) * 0.02
        ).astype(dtype),
    }


def random_quantized_params(
    cfg: ModelConfig,
    key: jax.Array,
    bits: int = 4,
    group_size: int = 128,
    dtype=jnp.bfloat16,
    quantize_lm_head: bool = False,
    experts_prestacked: bool = False,
) -> Dict[str, Any]:
    """Random W-quantized model params with dense embed/norm (and, when
    ``quantize_lm_head``, a packed lm_head — the serving option the
    reference lacks; it reads the dense head every decode step).

    ``experts_prestacked``: emit each MoE layer's experts as raw
    [E]-leading stacked tensors (gateup pre-fused) under
    ``experts_stacked`` instead of a per-expert list — 2 RNG calls per
    layer instead of 3*E (models.moe.stack_experts preps them in
    place). Bench/profile-scale use; quantize/save paths want the
    per-expert list."""
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
    n_exp_keys = (2 if experts_prestacked else 3 * E) if E else 0
    n_per_layer = len(moe_names) + n_exp_keys
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
        if E and experts_prestacked:
            lp["router"] = (
                jax.random.normal(keys[-3], (D, E), jnp.float32) * 0.02
            )
            lp["experts_stacked"] = {
                "gateup_proj": random_stacked_expert_tensor(
                    keys[ki], E, D, 2 * I, bits, group_size
                ),
                "down_proj": random_stacked_expert_tensor(
                    keys[ki + 1], E, I, D, bits, group_size
                ),
            }
            ki += 2
        elif E:
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
