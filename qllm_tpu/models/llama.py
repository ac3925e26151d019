"""Llama-family decoder as a pure function over a params pytree.

Covers the Llama/Mistral/TinyLlama/Qwen2 shape family (GQA, RoPE,
SwiGLU, RMSNorm, optional attention biases). Numerics follow the HF
implementation (rotate-half RoPE, fp32 softmax) so that imported
checkpoints reproduce reference perplexity (SURVEY.md §6: PPL within
0.05 of reference GPTQ at equal bits/groupsize).

Every linear leaf may be a dense ``[in, out]`` array or a
``QuantizedTensor`` — ``apply_linear`` dispatches. This replaces the
reference's nn.Module surgery (`make_mixbits_quant_linear`,
utils/modelutils.py:161-181) with plain pytree substitution.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.kv_cache import QuantizedKVCache
from ..ops.ref_matmul import qmatmul
from ..quant.qtensor import QuantizedTensor

__all__ = [
    "ModelConfig",
    "init_params",
    "forward",
    "apply_linear",
    "rms_norm",
    "TINY_LLAMA_TEST_CONFIG",
]


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # qwen2-style qkv bias
    mlp_bias: bool = False
    arch: str = "llama"
    # MoE (mixtral-family); 0 experts = dense MLP
    num_local_experts: int = 0
    num_experts_per_tok: int = 2

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def n_rep(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads


# a deliberately tiny config for tests (CPU-fast, all dims MXU-friendly)
TINY_LLAMA_TEST_CONFIG = ModelConfig(
    vocab_size=512,
    hidden_size=128,
    intermediate_size=256,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=256,
    rms_norm_eps=1e-5,
)

LINEAR_NAMES = (
    "q_proj",
    "k_proj",
    "v_proj",
    "o_proj",
    "gate_proj",
    "up_proj",
    "down_proj",
)


def init_params(
    cfg: ModelConfig, key: jax.Array, dtype=jnp.float32
) -> Dict[str, Any]:
    """Random-init params (testing / benchmarking; real weights come from
    modeling.hf_import)."""
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)

    def dense(k, fan_in, fan_out):
        return (
            jax.random.normal(k, (fan_in, fan_out), dtype) * (fan_in**-0.5)
        ).astype(dtype)

    def layer(k):
        ks = jax.random.split(k, 7 + 3 * max(1, cfg.num_local_experts))
        p = {
            "input_layernorm": jnp.ones((D,), dtype),
            "post_attention_layernorm": jnp.ones((D,), dtype),
            "q_proj": dense(ks[0], D, H * hd),
            "k_proj": dense(ks[1], D, Hkv * hd),
            "v_proj": dense(ks[2], D, Hkv * hd),
            "o_proj": dense(ks[3], H * hd, D),
        }
        if cfg.num_local_experts > 0:
            p["router"] = dense(ks[4], D, cfg.num_local_experts)
            p["experts"] = [
                {
                    "gate_proj": dense(ks[7 + 3 * e], D, I),
                    "up_proj": dense(ks[8 + 3 * e], D, I),
                    "down_proj": dense(ks[9 + 3 * e], I, D),
                }
                for e in range(cfg.num_local_experts)
            ]
        else:
            p["gate_proj"] = dense(ks[4], D, I)
            p["up_proj"] = dense(ks[5], D, I)
            p["down_proj"] = dense(ks[6], I, D)
        if cfg.attention_bias:
            p["q_proj_bias"] = jnp.zeros((H * hd,), dtype)
            p["k_proj_bias"] = jnp.zeros((Hkv * hd,), dtype)
            p["v_proj_bias"] = jnp.zeros((Hkv * hd,), dtype)
        return p

    params: Dict[str, Any] = {
        "embed_tokens": jax.random.normal(keys[0], (V, D), dtype) * 0.02,
        "layers": [layer(keys[i + 1]) for i in range(cfg.num_hidden_layers)],
        "norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = dense(keys[-1], D, V)
    return params


def apply_linear(
    w, x: jax.Array, bias: Optional[jax.Array] = None
) -> jax.Array:
    """x [..., K] @ w -> [..., N]; w is dense [K, N], QuantizedTensor,
    or VPTQTensor."""
    if isinstance(w, QuantizedTensor):
        return qmatmul(x, w, bias)
    from ..quant.vptq import VPTQTensor, vptq_matmul

    if isinstance(w, VPTQTensor):
        return vptq_matmul(x, w, bias)
    y = jnp.dot(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def _pallas_attn_enabled() -> bool:
    import os

    if os.environ.get("QLLM_TPU_DISABLE_PALLAS"):
        return False
    if os.environ.get("QLLM_TPU_FORCE_PALLAS_ATTN"):
        return True  # tests: run interpret-mode kernel on CPU
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dt) * weight


def _rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """positions [B, T] -> cos/sin [B, T, head_dim] (HF rotate-half layout)."""
    inv_freq = 1.0 / (
        theta
        ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [B,T,hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def apply_rope(q, k, cos, sin):
    """q [B,T,H,hd], k [B,T,Hkv,hd]; cos/sin [B,T,hd]."""
    c, s = cos[:, :, None, :], sin[:, :, None, :]
    qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
    return (
        (qf * c + _rotate_half(qf) * s).astype(q.dtype),
        (kf * c + _rotate_half(kf) * s).astype(k.dtype),
    )


def _attention(
    q: jax.Array,  # [B, T, H, hd]
    k: jax.Array,  # [B, S, Hkv, hd]
    v: jax.Array,  # [B, S, Hkv, hd]
    mask: jax.Array,  # [B, 1, T, S] additive (0 / -inf)
    n_rep: int,
) -> jax.Array:
    if n_rep > 1:
        k = jnp.repeat(k, n_rep, axis=2)
        v = jnp.repeat(v, n_rep, axis=2)
    hd = q.shape[-1]
    logits = jnp.einsum(
        "bthd,bshd->bhts",
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * (hd**-0.5)
    probs = jax.nn.softmax(logits + mask, axis=-1)
    out = jnp.einsum(
        "bhts,bshd->bthd",
        probs.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _layer_forward(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    h: jax.Array,  # [B, T, D]
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
    cache: Optional[QuantizedKVCache],
    layer_idx: int,
    pos: Optional[jax.Array],
) -> Tuple[jax.Array, Optional[QuantizedKVCache]]:
    B, T, D = h.shape
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd

    x = rms_norm(h, lp["input_layernorm"], cfg.rms_norm_eps)
    q = apply_linear(lp["q_proj"], x, lp.get("q_proj_bias"))
    k = apply_linear(lp["k_proj"], x, lp.get("k_proj_bias"))
    v = apply_linear(lp["v_proj"], x, lp.get("v_proj_bias"))
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, Hkv, hd)
    v = v.reshape(B, T, Hkv, hd)
    q, k = apply_rope(q, k, cos, sin)

    if cache is not None:
        cache = cache.update(layer_idx, k, v, pos)
        if T == 1 and cache.quantized and _pallas_attn_enabled():
            # fused int8-KV decode attention kernel
            from ..ops.pallas_attention import decode_attention_pallas

            kq, vq, ks, vs = cache.layer_kv_raw(layer_idx)
            lengths = jnp.broadcast_to(jnp.asarray(pos) + 1, (B,)).astype(
                jnp.int32
            )
            attn = decode_attention_pallas(
                q[:, 0], kq, vq, ks, vs, lengths
            )[:, None].astype(h.dtype)
            h = h + apply_linear(lp["o_proj"], attn.reshape(B, T, H * hd))
            x = rms_norm(h, lp["post_attention_layernorm"], cfg.rms_norm_eps)
            gate = apply_linear(lp["gate_proj"], x)
            up = apply_linear(lp["up_proj"], x)
            h = h + apply_linear(lp["down_proj"], jax.nn.silu(gate) * up)
            return h, cache
        k_all, v_all = cache.layer_kv(layer_idx, dtype=h.dtype)
    else:
        k_all, v_all = k, v

    attn = _attention(q, k_all, v_all, mask, cfg.n_rep)
    h = h + apply_linear(lp["o_proj"], attn.reshape(B, T, H * hd))

    x = rms_norm(h, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    h = h + _mlp_forward(lp, cfg, x)
    return h, cache


def _mlp_forward(lp: Dict[str, Any], cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """Dense SwiGLU MLP, or Mixtral-style top-k sparse MoE when the
    layer carries 'experts' (reference supports Mixtral via its GPTQ/AWQ
    tables, sequential_layes_gptq_config.py:70-101).

    MoE note: experts run densely over all tokens and are combined with
    the router's top-k weights — correct and XLA-friendly; token
    gathering/megablocking is a later optimization."""
    if "experts" not in lp:
        gate = apply_linear(lp["gate_proj"], x)
        up = apply_linear(lp["up_proj"], x)
        return apply_linear(lp["down_proj"], jax.nn.silu(gate) * up)

    router_logits = jnp.dot(
        x.astype(jnp.float32), lp["router"].astype(jnp.float32)
    )  # [B, T, E]
    E = len(lp["experts"])
    k = min(cfg.num_experts_per_tok, E)
    top_w, top_ids = jax.lax.top_k(router_logits, k)
    top_w = jax.nn.softmax(top_w, axis=-1)  # HF: softmax over the top-k
    # per-expert combine weight [B, T, E]
    weights = jnp.sum(
        jax.nn.one_hot(top_ids, E, dtype=jnp.float32)
        * top_w[..., None],
        axis=-2,
    )  # [B, T, E]
    out = jnp.zeros_like(x, shape=x.shape).astype(jnp.float32)
    for e, ep in enumerate(lp["experts"]):
        gate = apply_linear(ep["gate_proj"], x)
        up = apply_linear(ep["up_proj"], x)
        ye = apply_linear(ep["down_proj"], jax.nn.silu(gate) * up)
        out = out + ye.astype(jnp.float32) * weights[..., e : e + 1]
    return out.astype(x.dtype)


def layer_intermediates(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    h: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
) -> Dict[str, jax.Array]:
    """The input activation of every linear in one block — what the
    reference collects with forward hooks (quant_gptq.py:73-87,
    quant_awq.py:46-83). Keys map linear name -> its input [B, T, K].
    Must stay in lock-step with ``_layer_forward``."""
    B, T, D = h.shape
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    x1 = rms_norm(h, lp["input_layernorm"], cfg.rms_norm_eps)
    q = apply_linear(lp["q_proj"], x1, lp.get("q_proj_bias"))
    k = apply_linear(lp["k_proj"], x1, lp.get("k_proj_bias"))
    v = apply_linear(lp["v_proj"], x1, lp.get("v_proj_bias"))
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, Hkv, hd)
    v = v.reshape(B, T, Hkv, hd)
    q, k = apply_rope(q, k, cos, sin)
    attn = _attention(q, k, v, mask, cfg.n_rep).reshape(B, T, H * hd)
    h2 = h + apply_linear(lp["o_proj"], attn)
    x2 = rms_norm(h2, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    out = {
        "q_proj": x1,
        "k_proj": x1,
        "v_proj": x1,
        "o_proj": attn,
    }
    if "experts" in lp:
        # MoE: per-expert inputs weighted by the router (sqrt weight so
        # the Hessian XᵀX carries the routing probability) — the
        # calibration analog of the reference's hook-captured routed
        # inputs for Mixtral (sequential_layes_gptq_config.py:70-101)
        out["experts_input"] = x2  # unweighted (AWQ scale search)
        router_logits = jnp.dot(
            x2.astype(jnp.float32), lp["router"].astype(jnp.float32)
        )
        E = len(lp["experts"])
        k = min(cfg.num_experts_per_tok, E)
        top_w, top_ids = jax.lax.top_k(router_logits, k)
        top_w = jax.nn.softmax(top_w, axis=-1)
        weights = jnp.sum(
            jax.nn.one_hot(top_ids, E, dtype=jnp.float32) * top_w[..., None],
            axis=-2,
        )  # [B, T, E]
        for e, ep in enumerate(lp["experts"]):
            wsq = jnp.sqrt(weights[..., e : e + 1]).astype(x2.dtype)
            xe = x2 * wsq
            gate = apply_linear(ep["gate_proj"], x2)
            up = apply_linear(ep["up_proj"], x2)
            out[f"experts.{e}.gate_proj"] = xe
            out[f"experts.{e}.up_proj"] = xe
            out[f"experts.{e}.down_proj"] = (
                jax.nn.silu(gate) * up
            ) * wsq
    else:
        gate = apply_linear(lp["gate_proj"], x2)
        up = apply_linear(lp["up_proj"], x2)
        out["gate_proj"] = x2
        out["up_proj"] = x2
        out["down_proj"] = jax.nn.silu(gate) * up
    return out


def forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,  # [B, T] int32
    cache: Optional[QuantizedKVCache] = None,
    pos: Optional[jax.Array] = None,  # scalar: write offset into cache
) -> Tuple[jax.Array, Optional[QuantizedKVCache]]:
    """Full forward -> (logits [B, T, V] float32, updated cache).

    Without a cache: plain causal attention over the T tokens (prefill /
    perplexity scoring). With a cache: tokens are written at offset
    ``pos`` and attention runs over cache positions [0, pos+T).
    """
    if not isinstance(params["layers"], list):
        # stacked-layer params (models.stacked): lax.scan execution
        if cache is None:
            raise ValueError(
                "stacked-layer forward requires a KV cache; use the "
                "per-layer (list) params for cacheless scoring"
            )
        from .stacked import forward_stacked

        return forward_stacked(params, cfg, token_ids, cache, pos)

    B, T = token_ids.shape
    # mode="clip": out-of-range ids clamp instead of jnp.take's default
    # NaN fill (defensive; calibration/generation ids should be in range)
    h = jnp.take(params["embed_tokens"], token_ids, axis=0, mode="clip")

    if cache is None:
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        mask = jnp.where(
            jnp.arange(T)[None, None, :, None] >= jnp.arange(T)[None, None, None, :],
            0.0,
            -jnp.inf,
        ).astype(jnp.float32)
        mask = jnp.broadcast_to(mask.reshape(1, 1, T, T), (B, 1, T, T))
    else:
        if pos is None:
            pos = jnp.int32(0)
        pos = jnp.asarray(pos)
        S = cache.max_seq
        if pos.ndim == 0:
            positions = pos + jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
            # position s visible to query t  iff  s <= pos + t
            q_pos = pos + jnp.arange(T)[:, None]  # [T, 1]
            s_idx = jnp.arange(S)[None, :]  # [1, S]
            mask = jnp.where(s_idx <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)
            mask = jnp.broadcast_to(mask.reshape(1, 1, T, S), (B, 1, T, S))
        else:
            # per-slot offsets (continuous batching): pos int32 [B]
            positions = pos[:, None] + jnp.arange(T)[None, :]
            q_pos = pos[:, None, None, None] + jnp.arange(T)[None, None, :, None]
            s_idx = jnp.arange(S)[None, None, None, :]
            mask = jnp.where(s_idx <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)
            mask = jnp.broadcast_to(mask, (B, 1, T, S))

    cos, sin = _rope_cos_sin(positions, cfg.hd, cfg.rope_theta)
    for i, lp in enumerate(params["layers"]):
        h, cache = _layer_forward(lp, cfg, h, cos, sin, mask, cache, i, pos)

    h = rms_norm(h, params["norm"], cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        logits = jnp.dot(
            h.astype(jnp.bfloat16),
            params["embed_tokens"].T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        logits = apply_linear(params["lm_head"], h).astype(jnp.float32)
    return logits.astype(jnp.float32), cache


def iter_quantizable(params: Dict[str, Any]):
    """Yield (path, layer_idx, name, w) for every quantizable linear.

    The analog of reference find_layers (utils/modelutils.py:17-23).
    """
    for i, lp in enumerate(params["layers"]):
        for name in LINEAR_NAMES:
            if name in lp:
                yield (f"model.layers.{i}.{_hf_name(name)}", i, name, lp[name])


def _hf_name(name: str) -> str:
    if name in ("q_proj", "k_proj", "v_proj", "o_proj"):
        return f"self_attn.{name}"
    return f"mlp.{name}"
