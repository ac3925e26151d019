"""Architecture registry: HF checkpoint dialects -> the parametric decoder.

The reference supports ~19 GPTQ architectures and ~24 AWQ topologies via
per-arch python tables (sequential_layes_gptq_config.py:4-150,
sequential_layes_awq_config.py:1-1238) plus per-arch nn.Module surgery.
Here every architecture maps onto ONE parametric block
(models.llama._block_attn_mlp) through an ``ArchSpec``:

  * a tensor-name dialect (where each canonical linear/norm lives in the
    HF state dict, e.g. opt's ``self_attn.out_proj`` / ``fc1``),
  * a ``ModelConfig`` translation of the HF config.json, and
  * for fused-qkv checkpoints (bloom/neox/falcon ``query_key_value``,
    baichuan ``W_pack``, gpt2/qwen ``c_attn``, mpt ``Wqkv``, phi3
    ``qkv_proj``/``gate_up_proj``, codegen/moss ``qkv_proj``) an exact
    column-index permutation that splits the fused projection into
    canonical q/k/v.  Because our canonical packed layout keeps scales,
    zeros and the integer grid all indexed by output column
    (quant/qtensor.py), the same index arrays split and re-fuse
    *quantized* tensors losslessly — what the reference handles with
    per-arch QuantLinear surgery falls out of the layout.

Split/fuse correctness is tested against transformers' own models in
tests/test_archs.py (logits parity on tiny random checkpoints).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from ..models.llama import ModelConfig

__all__ = [
    "ArchSpec",
    "get_spec",
    "spec_for_config",
    "spec_from_model_config",
    "qkv_split_indices",
    "gate_up_split_indices",
    "SUPPORTED_HF_ARCHS",
]


@dataclasses.dataclass(frozen=True)
class ArchSpec:
    """Checkpoint dialect + config translation for one architecture."""

    kind: str  # canonical short name ("opt", "bloom", ...)
    hf_arch: str  # primary architectures[0] string
    layers_prefix: str  # "model.layers" | "transformer.h" | ...
    embed: str  # full key (without ".weight" -> weight-only tensors keep it)
    final_norm: str
    linears: Dict[str, str]  # canonical linear -> per-layer HF module path
    norms: Dict[str, str]  # canonical norm -> per-layer HF module path
    config_fn: Callable[[dict], ModelConfig]
    lm_head: Optional[str] = "lm_head"  # None -> never stored (always tied)
    pos_embed: Optional[str] = None  # learned-position table key
    embed_ln: Optional[str] = None  # bloom word_embeddings_layernorm
    fused_qkv: Optional[str] = None  # per-layer path of the fused qkv linear
    fused_gate_up: Optional[str] = None  # phi3 gate_up_proj
    conv1d: bool = False  # gpt2/qwen1 Conv1D stores [in, out] (no transpose)
    # MoE checkpoint dialect: mixtral (block_sparse_moe.experts.N.w1/w2/w3),
    # deepseek (mlp.experts.N.gate_proj/... + mlp.shared_experts.*), or
    # qwen2_moe (deepseek naming but a SINGULAR mlp.shared_expert.* plus
    # the sigmoid mlp.shared_expert_gate)
    moe_dialect: str = "mixtral"
    # tensor-key prefixes carried through load->quantize->save verbatim
    # (llava vision tower + projector: the reference quantizes only the
    # language tower, sequential_layes_awq_config.py llava entries)
    passthrough: Tuple[str, ...] = ()
    # archs whose sub-variant changes naming/layout resolve themselves
    # against the raw config dict (falcon) — returns a concrete spec
    specialize: Optional[Callable[["ArchSpec", dict], "ArchSpec"]] = None


# ---------------------------------------------------------------------------
# fused-qkv column permutations
# ---------------------------------------------------------------------------


def qkv_split_indices(
    cfg: ModelConfig,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Column indices (iq, ik, iv) of q/k/v inside the fused projection's
    output dimension, per ``cfg.fused_qkv_layout``:

    concat     [q (H*hd) | k (Hkv*hd) | v (Hkv*hd)]
               (baichuan W_pack, phi3 qkv_proj, gpt2/qwen c_attn, mpt
                Wqkv, bigcode MQA c_attn, falcon-7b multi_query)
    headwise   [H, (q,k,v), hd] per-head interleave (bloom, gpt-neox,
                falcon-rw; HF views the fused output as [..., H, 3, hd])
    falcon_new [Hkv, (n_rep q's, k, v), hd] grouped-query interleave
                (falcon new_decoder_architecture, modeling_falcon
                 _split_heads)
    codegen    mp_num=4 block layout, (q, v, k) within each block
                (modeling_codegen CodeGenAttention mp_num split)
    """
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    layout = cfg.fused_qkv_layout
    if layout == "concat":
        nq, nkv = H * hd, Hkv * hd
        iq = np.arange(nq)
        ik = nq + np.arange(nkv)
        iv = nq + nkv + np.arange(nkv)
    elif layout == "headwise":
        if Hkv != H:
            raise ValueError("headwise fused qkv requires MHA (Hkv == H)")
        base = np.arange(H)[:, None] * (3 * hd) + np.arange(hd)[None, :]
        iq = base.reshape(-1)
        ik = (base + hd).reshape(-1)
        iv = (base + 2 * hd).reshape(-1)
    elif layout == "falcon_new":
        n_rep = H // Hkv
        row = (n_rep + 2) * hd
        g = np.arange(Hkv)[:, None, None] * row
        qoff = np.arange(n_rep)[None, :, None] * hd + np.arange(hd)[None, None, :]
        iq = (g + qoff).reshape(-1)
        ik = (g[:, 0] + n_rep * hd + np.arange(hd)[None, :]).reshape(-1)
        iv = (g[:, 0] + (n_rep + 1) * hd + np.arange(hd)[None, :]).reshape(-1)
    elif layout == "codegen":
        mp = 4
        local = H * hd // mp
        b = np.arange(mp)[:, None] * (3 * local)
        off = np.arange(local)[None, :]
        iq = (b + off).reshape(-1)
        iv = (b + local + off).reshape(-1)
        ik = (b + 2 * local + off).reshape(-1)
    else:
        raise ValueError(f"unknown fused_qkv_layout {layout!r}")
    return iq.astype(np.int64), ik.astype(np.int64), iv.astype(np.int64)


def gate_up_split_indices(cfg: ModelConfig) -> Tuple[np.ndarray, np.ndarray]:
    """phi3 mlp.gate_up_proj: [gate | up] halves along the output dim."""
    I = cfg.intermediate_size
    return np.arange(I), I + np.arange(I)


# ---------------------------------------------------------------------------
# per-arch ModelConfig translation
# ---------------------------------------------------------------------------


def _norm_cfg(d: dict) -> dict:
    """Fields shared by llama-shaped configs."""
    return dict(
        vocab_size=d["vocab_size"],
        hidden_size=d["hidden_size"],
        num_hidden_layers=d["num_hidden_layers"],
        num_attention_heads=d["num_attention_heads"],
        max_position_embeddings=d.get("max_position_embeddings", 2048),
        tie_word_embeddings=d.get("tie_word_embeddings", False),
    )


def _llama_like(d: dict, **over) -> ModelConfig:
    kw = dict(
        **_norm_cfg(d),
        intermediate_size=d["intermediate_size"],
        num_key_value_heads=d.get(
            "num_key_value_heads", d["num_attention_heads"]
        ),
        head_dim=d.get("head_dim"),
        rms_norm_eps=d.get("rms_norm_eps", 1e-5),
        rope_theta=d.get("rope_theta", 10000.0),
        attention_bias=d.get("attention_bias", False),
        hidden_act=d.get("hidden_act", "silu"),
    )
    rope_kw, _ = _parse_rope_scaling(d.get("rope_scaling"))
    kw.update(rope_kw)
    kw.update(over)
    return ModelConfig(**kw)


def _cfg_llama(d):
    return _llama_like(d, arch="llama")


def _cfg_mistral(d):
    # HF mistral: sliding_window null (v0.2+) disables SWA
    return _llama_like(
        d, arch="mistral", sliding_window=d.get("sliding_window") or 0
    )


def _cfg_qwen2(d):
    # HF qwen2: SWA only when use_sliding_window, and only for layers
    # >= max_window_layers (Qwen2Attention.__init__)
    use_swa = bool(d.get("use_sliding_window"))
    return _llama_like(
        d,
        arch="qwen2",
        attention_bias=True,
        sliding_window=(d.get("sliding_window") or 0) if use_swa else 0,
        # HF Qwen2Config defaults max_window_layers=28 (NOT 0) when the
        # key is absent: layers >= max_window_layers are windowed
        swa_min_layer=d.get("max_window_layers", 28) if use_swa else 0,
    )


def _cfg_qwen3(d, **over):
    # HF qwen3: llama-shaped + RMSNorm q/k-norm over head_dim (one
    # weight shared across heads, Qwen3Attention q_norm/k_norm) and an
    # explicit head_dim; SWA gating fields match qwen2
    use_swa = bool(d.get("use_sliding_window"))
    kw = dict(
        arch="qwen3",
        qk_norm="rms",
        sliding_window=(d.get("sliding_window") or 0) if use_swa else 0,
        # HF Qwen3Config defaults max_window_layers=28 when absent
        swa_min_layer=d.get("max_window_layers", 28) if use_swa else 0,
    )
    kw.update(over)
    return _llama_like(d, **kw)


def _cfg_qwen3_moe(d):
    # Qwen3MoeSparseMoeBlock routes like deepseek's gate: softmax over
    # ALL experts -> top-k -> renormalize when norm_topk_prob (the
    # "deepseek" router with routed_scaling_factor=1); layers listed in
    # mlp_only_layers stay dense (detected per layer from the
    # checkpoint: dense layers carry mlp.gate_proj, sparse ones
    # mlp.gate + mlp.experts.N.*)
    return _cfg_qwen3(
        d,
        arch="qwen3_moe",
        num_local_experts=d.get("num_experts") or 0,
        num_experts_per_tok=d.get("num_experts_per_tok") or 8,
        moe_router="deepseek",
        norm_topk_prob=d.get("norm_topk_prob", False),
        moe_intermediate_size=d.get("moe_intermediate_size") or 0,
    )


def _cfg_qwen2_moe(d):
    # qwen2 attention (qkv bias) + qwen3-moe-style router + an always-on
    # shared expert whose output is sigmoid-gated by shared_expert_gate
    # (Qwen2MoeSparseMoeBlock.forward)
    use_swa = bool(d.get("use_sliding_window"))
    return _llama_like(
        d,
        arch="qwen2_moe",
        attention_bias=True,
        sliding_window=(d.get("sliding_window") or 0) if use_swa else 0,
        swa_min_layer=d.get("max_window_layers", 0) if use_swa else 0,
        num_local_experts=d.get("num_experts") or 0,
        num_experts_per_tok=d.get("num_experts_per_tok") or 4,
        moe_router="deepseek",
        norm_topk_prob=d.get("norm_topk_prob", False),
        moe_intermediate_size=d.get("moe_intermediate_size") or 0,
    )


def _cfg_mixtral(d):
    return _llama_like(
        d,
        arch="mixtral",
        num_local_experts=d.get("num_local_experts", 8),
        num_experts_per_tok=d.get("num_experts_per_tok", 2),
    )


def _cfg_yi(d):
    return _llama_like(d, arch="yi")


def _cfg_internlm(d):
    return _llama_like(d, arch="internlm", attention_bias=d.get("bias", True))


def _cfg_opt(d):
    if not d.get("do_layer_norm_before", True):
        raise NotImplementedError("opt with do_layer_norm_before=False (350m)")
    if d.get("word_embed_proj_dim", d["hidden_size"]) != d["hidden_size"]:
        raise NotImplementedError("opt word_embed_proj_dim != hidden_size")
    return ModelConfig(
        **_norm_cfg(d),
        intermediate_size=d["ffn_dim"],
        num_key_value_heads=d["num_attention_heads"],
        rms_norm_eps=1e-5,
        arch="opt",
        norm_type="layernorm",
        pos_embedding="learned",
        learned_pos_offset=2,
        mlp_type="plain",
        hidden_act=d.get("activation_function", "relu"),
    )


def _cfg_gptj(d):
    D = d["n_embd"]
    return ModelConfig(
        vocab_size=d["vocab_size"],
        hidden_size=D,
        intermediate_size=d.get("n_inner") or 4 * D,
        num_hidden_layers=d["n_layer"],
        num_attention_heads=d["n_head"],
        num_key_value_heads=d["n_head"],
        max_position_embeddings=d.get("n_positions", 2048),
        tie_word_embeddings=d.get("tie_word_embeddings", False),
        rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
        arch="gptj",
        norm_type="layernorm",
        rope_style="gptj",
        rotary_dim=d.get("rotary_dim") or 0,
        mlp_type="plain",
        hidden_act=d.get("activation_function", "gelu_new"),
        parallel_residual=True,
        shared_input_norm=True,
    )


def _cfg_codegen(d):
    cfg = _cfg_gptj(d)
    return dataclasses.replace(cfg, arch="codegen", fused_qkv_layout="codegen")


def _cfg_gptneox(d):
    hd = d["hidden_size"] // d["num_attention_heads"]
    return ModelConfig(
        **_norm_cfg(d),
        intermediate_size=d["intermediate_size"],
        num_key_value_heads=d["num_attention_heads"],
        rms_norm_eps=d.get("layer_norm_eps", 1e-5),
        rope_theta=d.get("rope_theta", d.get("rotary_emb_base", 10000.0)),
        arch="gpt_neox",
        norm_type="layernorm",
        rotary_dim=int(hd * d.get("rotary_pct", 0.25)),
        mlp_type="plain",
        hidden_act=d.get("hidden_act", "gelu"),
        parallel_residual=d.get("use_parallel_residual", True),
        fused_qkv_layout="headwise",
    )


def _cfg_falcon(d):
    H = d.get("num_attention_heads", d.get("n_head"))
    L = d.get("num_hidden_layers", d.get("n_layer"))
    new = d.get("new_decoder_architecture", False)
    multi_query = d.get("multi_query", True)
    alibi = d.get("alibi", False)
    if new:
        Hkv = d.get("num_kv_heads", d.get("n_head_kv", H))
        layout, variant = "falcon_new", "new"
        parallel, shared = True, False
    elif multi_query:
        Hkv, layout, variant = 1, "concat", "7b"
        parallel = d.get("parallel_attn", True)
        shared = parallel
    else:
        Hkv, layout, variant = H, "headwise", "rw"
        parallel = d.get("parallel_attn", False)
        shared = parallel
    return ModelConfig(
        vocab_size=d["vocab_size"],
        hidden_size=d["hidden_size"],
        intermediate_size=d.get("ffn_hidden_size") or 4 * d["hidden_size"],
        num_hidden_layers=L,
        num_attention_heads=H,
        num_key_value_heads=Hkv,
        max_position_embeddings=d.get("max_position_embeddings", 2048),
        tie_word_embeddings=d.get("tie_word_embeddings", True),
        rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
        rope_theta=d.get("rope_theta", 10000.0),
        arch="falcon",
        norm_type="layernorm",
        pos_embedding="alibi" if alibi else "rope",
        mlp_type="plain",
        hidden_act="gelu",
        parallel_residual=parallel,
        shared_input_norm=shared,
        attention_bias=d.get("bias", False),
        fused_qkv_layout=layout,
        variant=variant,
    )


def _specialize_falcon(spec: "ArchSpec", d: dict) -> "ArchSpec":
    if d.get("new_decoder_architecture", False):
        # 40b-style: two parallel norms named ln_attn / ln_mlp
        return dataclasses.replace(
            spec,
            norms={
                "input_layernorm": "ln_attn",
                "post_attention_layernorm": "ln_mlp",
            },
        )
    return spec


def _cfg_bloom(d):
    D = d["hidden_size"]
    H = d.get("n_head", d.get("num_attention_heads"))
    return ModelConfig(
        vocab_size=d["vocab_size"],
        hidden_size=D,
        intermediate_size=4 * D,
        num_hidden_layers=d.get("n_layer", d.get("num_hidden_layers")),
        num_attention_heads=H,
        num_key_value_heads=H,
        max_position_embeddings=d.get("max_position_embeddings", 2048),
        tie_word_embeddings=True,
        rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
        arch="bloom",
        norm_type="layernorm",
        pos_embedding="alibi",
        mlp_type="plain",
        hidden_act="gelu_new",  # BloomGelu == tanh-approximate gelu
        embed_layernorm=True,
        fused_qkv_layout="headwise",
    )


def _cfg_mpt(d):
    D = d["d_model"]
    attn = d.get("attn_config", {}) or {}
    if not attn.get("alibi", True):
        raise NotImplementedError("mpt without alibi (learned positions)")
    return ModelConfig(
        vocab_size=d["vocab_size"],
        hidden_size=D,
        intermediate_size=int(d.get("expansion_ratio", 4) * D),
        num_hidden_layers=d["n_layers"],
        num_attention_heads=d["n_heads"],
        num_key_value_heads=attn.get("kv_n_heads", d["n_heads"]),
        max_position_embeddings=d.get("max_seq_len", 2048),
        tie_word_embeddings=True,
        rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
        arch="mpt",
        norm_type="layernorm",
        pos_embedding="alibi",
        alibi_style="mpt",
        mlp_type="plain",
        hidden_act="gelu",
        fused_qkv_layout="concat",
    )


def _cfg_phi3(d):
    if (d.get("rope_scaling") or None) is not None:
        raise NotImplementedError("phi3 longrope scaling")
    return _llama_like(d, arch="phi3", fused_qkv_layout="concat")


def _cfg_gemma(d):
    return _llama_like(
        d,
        arch="gemma",
        norm_type="rmsnorm_plus1",
        hidden_act=d.get("hidden_activation")
        or d.get("hidden_act")
        or "gelu_pytorch_tanh",
        embedding_multiplier=math.sqrt(d["hidden_size"]),
        tie_word_embeddings=True,
    )


def _cfg_gemma2(d):
    """Gemma-2 (HF modeling_gemma2): gemma norms/multiplier plus
    post-sublayer norms, attn/final logit soft-capping and the
    query_pre_attn_scalar attention scale. Even layer ids serve the
    sliding window, odd ids full causal (HF Gemma2Attention:
    sliding_window if not bool(layer_idx % 2))."""
    return _llama_like(
        d,
        arch="gemma2",
        sliding_window=d.get("sliding_window") or 0,
        swa_pattern="even",
        norm_type="rmsnorm_plus1",
        hidden_act=d.get("hidden_activation")
        or d.get("hidden_act")
        or "gelu_pytorch_tanh",
        embedding_multiplier=math.sqrt(d["hidden_size"]),
        tie_word_embeddings=True,
        post_norms=True,
        attn_logit_softcap=d.get("attn_logit_softcapping") or 0.0,
        final_logit_softcap=d.get("final_logit_softcapping") or 0.0,
        attn_scale=d.get("query_pre_attn_scalar", 256) ** -0.5,
    )


def _cfg_cohere(d):
    """Cohere Command-R (HF modeling_cohere): parallel attn+mlp sharing
    ONE mean-subtracting no-bias layernorm, interleaved rotary, scaled
    tied logits, optional per-head q/k norm (Command R+)."""
    return _llama_like(
        d,
        arch="cohere",
        norm_type="layernorm",
        rms_norm_eps=d.get("layer_norm_eps", 1e-5),
        rope_style="gptj",
        parallel_residual=True,
        shared_input_norm=True,
        tie_word_embeddings=True,
        logit_scale=d.get("logit_scale", 1.0),
        qk_norm="cohere" if d.get("use_qk_norm") else "",
    )


def _cfg_internlm2(d):
    """InternLM2: llama semantics, renamed weights + grouped fused wqkv
    ([Hkv, n_rep q's, k, v] per group == the falcon_new column layout,
    HF remote modeling_internlm2 rearrange 'b q (h gs d)')."""
    return _llama_like(
        d,
        arch="internlm2",
        attention_bias=d.get("bias", False),
        fused_qkv_layout="falcon_new",
    )


def _cfg_minicpm(d):
    """MiniCPM: llama shape with mup-style scaling — embeddings scaled
    by scale_emb, every residual branch by scale_depth/sqrt(L), logits
    by dim_model_base/hidden_size (remote modeling_minicpm.py)."""
    L = d["num_hidden_layers"]
    return _llama_like(
        d,
        arch="minicpm",
        embedding_multiplier=float(d.get("scale_emb", 1.0)),
        residual_multiplier=float(d.get("scale_depth", math.sqrt(L)))
        / math.sqrt(L),
        logit_scale=float(d.get("dim_model_base", d["hidden_size"]))
        / d["hidden_size"],
    )


def _cfg_gpt2(d):
    D = d["n_embd"]
    if d.get("scale_attn_by_inverse_layer_idx"):
        raise NotImplementedError("gpt2 scale_attn_by_inverse_layer_idx")
    return ModelConfig(
        vocab_size=d["vocab_size"],
        hidden_size=D,
        intermediate_size=d.get("n_inner") or 4 * D,
        num_hidden_layers=d["n_layer"],
        num_attention_heads=d["n_head"],
        num_key_value_heads=d["n_head"],
        max_position_embeddings=d.get("n_positions", 1024),
        tie_word_embeddings=True,
        rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
        arch="gpt2",
        norm_type="layernorm",
        pos_embedding="learned",
        mlp_type="plain",
        hidden_act=d.get("activation_function", "gelu_new"),
        fused_qkv_layout="concat",
    )


def _cfg_bigcode(d):
    D = d["n_embd"]
    return ModelConfig(
        vocab_size=d["vocab_size"],
        hidden_size=D,
        intermediate_size=d.get("n_inner") or 4 * D,
        num_hidden_layers=d["n_layer"],
        num_attention_heads=d["n_head"],
        num_key_value_heads=1 if d.get("multi_query", True) else d["n_head"],
        max_position_embeddings=d.get("n_positions", 2048),
        tie_word_embeddings=True,
        rms_norm_eps=d.get("layer_norm_epsilon", 1e-5),
        arch="gpt_bigcode",
        norm_type="layernorm",
        pos_embedding="learned",
        mlp_type="plain",
        hidden_act=d.get("activation_function", "gelu_pytorch_tanh"),
        fused_qkv_layout="concat",
    )


def _cfg_starcoder2(d):
    return ModelConfig(
        **_norm_cfg(d),
        intermediate_size=d["intermediate_size"],
        num_key_value_heads=d.get(
            "num_key_value_heads", d["num_attention_heads"]
        ),
        rms_norm_eps=d.get("norm_epsilon", 1e-5),
        rope_theta=d.get("rope_theta", 10000.0),
        arch="starcoder2",
        norm_type="layernorm",
        mlp_type="plain",
        hidden_act=d.get("hidden_act", "gelu_pytorch_tanh"),
        attention_bias=d.get("use_bias", True),
    )


def _cfg_stablelm(d):
    hd = d["hidden_size"] // d["num_attention_heads"]
    return ModelConfig(
        **_norm_cfg(d),
        intermediate_size=d["intermediate_size"],
        num_key_value_heads=d.get(
            "num_key_value_heads", d["num_attention_heads"]
        ),
        rms_norm_eps=d.get("layer_norm_eps", 1e-5),
        rope_theta=d.get("rope_theta", 10000.0),
        arch="stablelm",
        norm_type="layernorm",
        rotary_dim=int(hd * d.get("partial_rotary_factor", 0.25)),
        hidden_act=d.get("hidden_act", "silu"),
        attention_bias=d.get("use_qkv_bias", False),
    )


def _cfg_stablelm_epoch(d):
    """Legacy stabilityai/stablelm-*-epoch trust-remote-code dialect
    (reference table: sequential_layes_gptq_config.py
    StableLMEpochForCausalLM): same llama-shaped weights, but the
    config spells partial rotary as ``rope_pct`` and the eps as
    ``norm_eps``."""
    d = dict(d)
    d.setdefault("partial_rotary_factor", d.get("rope_pct", 0.25))
    d.setdefault("layer_norm_eps", d.get("norm_eps", 1e-5))
    # the epoch models use RMSNorm-style no-bias LayerNorm with silu MLP
    d.setdefault("use_qkv_bias", False)
    return _cfg_stablelm(d)


def _cfg_phi(d):
    hd = d["hidden_size"] // d["num_attention_heads"]
    return ModelConfig(
        **_norm_cfg(d),
        intermediate_size=d["intermediate_size"],
        num_key_value_heads=d.get(
            "num_key_value_heads", d["num_attention_heads"]
        ),
        rms_norm_eps=d.get("layer_norm_eps", 1e-5),
        rope_theta=d.get("rope_theta", 10000.0),
        arch="phi",
        norm_type="layernorm",
        rotary_dim=int(hd * d.get("partial_rotary_factor", 0.5)),
        mlp_type="plain",
        hidden_act=d.get("hidden_act", "gelu_new"),
        parallel_residual=True,
        shared_input_norm=True,
        attention_bias=True,
    )


def _cfg_baichuan(d):
    alibi = (
        d.get("position_embedding", "").upper() == "ALIBI"
        or d["hidden_size"] >= 5120  # 13B ships ALiBi, 7B RoPE
    )
    return _llama_like(
        d,
        arch="baichuan",
        pos_embedding="alibi" if alibi else "rope",
        fused_qkv_layout="concat",
    )


# text-tower config translators for multimodal wrappers (llava/next):
# the language model is one of the llama-dialect families
_LLAVA_TEXT_CFGS = {
    "llama": _cfg_llama,
    "mistral": _cfg_mistral,
    "qwen2": _cfg_qwen2,
}


def _cfg_llava(d):
    """LlavaConfig/LlavaNextConfig -> ModelConfig of the language tower.
    The reference routes llava through its llama AWQ/GPTQ tables
    (sequential_layes_awq_config.py llava/llava_next entries); vision
    tower + projector tensors pass through unquantized."""
    td = dict(d.get("text_config") or {})
    fn = _LLAVA_TEXT_CFGS.get(td.get("model_type", "llama"), _cfg_llama)
    cfg = fn(td)
    return dataclasses.replace(cfg, arch="llava")


def _parse_rope_scaling(scaling, softmax_dim=0):
    """HF rope_scaling dict -> (ModelConfig field kwargs, attn_scale).

    yarn (DeepseekV2YarnRotaryEmbedding contract): frequency tables are
    handled in models.llama.rope_inv_freq_mscale; the attention softmax
    scale gains get_mscale(factor, mscale_all_dim)^2, folded into
    attn_scale here (0 = keep the default hd**-0.5)."""
    if not scaling:
        return {}, 0.0
    st = scaling.get("rope_type", scaling.get("type")) or "default"
    if st == "default":
        return {}, 0.0
    if st not in ("linear", "yarn"):
        raise NotImplementedError(f"rope_scaling type {st!r}")
    kw = dict(
        rope_scaling_type=st,
        rope_scaling_factor=float(scaling.get("factor", 1.0)),
    )
    attn_scale = 0.0
    if st == "yarn":
        kw.update(
            rope_orig_max_position=int(
                scaling.get("original_max_position_embeddings", 0)
            ),
            rope_beta_fast=float(scaling.get("beta_fast", 32.0)),
            rope_beta_slow=float(scaling.get("beta_slow", 1.0)),
            rope_mscale=float(scaling.get("mscale", 1.0)),
            rope_mscale_all_dim=float(scaling.get("mscale_all_dim", 0.0)),
        )
        if softmax_dim and kw["rope_mscale_all_dim"]:
            from ..models.llama import _yarn_get_mscale

            m = _yarn_get_mscale(
                kw["rope_scaling_factor"], kw["rope_mscale_all_dim"]
            )
            attn_scale = (softmax_dim**-0.5) * m * m
    return kw, attn_scale


def _cfg_deepseek_v2(d):
    """DeepSeek-V2 (MLA + deepseek MoE). Reference covers this family in
    its AWQ topology table (sequential_layes_awq_config.py
    get_deepseek_v2_layers); here it maps onto the MLA block in
    models.llama (_mla_attention) and the deepseek router
    (_router_weights)."""
    qk_hd = d["qk_nope_head_dim"] + d["qk_rope_head_dim"]
    rope_kw, attn_scale = _parse_rope_scaling(
        d.get("rope_scaling"), softmax_dim=qk_hd
    )
    return ModelConfig(
        **rope_kw,
        attn_scale=attn_scale,
        norm_topk_prob=d.get("norm_topk_prob", False),
        **_norm_cfg(d),
        intermediate_size=d["intermediate_size"],
        # MLA expands to per-head k/v before the cache (HF eager
        # semantics) — the cache holds all H heads
        num_key_value_heads=d["num_attention_heads"],
        head_dim=qk_hd,
        rms_norm_eps=d.get("rms_norm_eps", 1e-6),
        rope_theta=d.get("rope_theta", 10000.0),
        attention_bias=d.get("attention_bias", False),
        hidden_act=d.get("hidden_act", "silu"),
        arch="deepseek_v2",
        attn_type="mla",
        rope_style="gptj",  # interleaved-pair (complex) rotation
        rotary_dim=d["qk_rope_head_dim"],
        q_lora_rank=d.get("q_lora_rank") or 0,
        kv_lora_rank=d["kv_lora_rank"],
        qk_nope_head_dim=d["qk_nope_head_dim"],
        qk_rope_head_dim=d["qk_rope_head_dim"],
        v_head_dim=d["v_head_dim"],
        num_local_experts=d.get("n_routed_experts") or 0,
        num_experts_per_tok=d.get("num_experts_per_tok") or 2,
        moe_router="deepseek",
        topk_method=d.get("topk_method", "greedy"),
        n_group=d.get("n_group") or 0,
        topk_group=d.get("topk_group") or 0,
        routed_scaling_factor=d.get("routed_scaling_factor", 1.0),
        n_shared_experts=d.get("n_shared_experts") or 0,
        first_k_dense_replace=d.get("first_k_dense_replace", 0),
        moe_intermediate_size=d.get("moe_intermediate_size") or 0,
    )


def _cfg_qwen(d):
    return ModelConfig(
        **_norm_cfg(d),
        # qwen1 config's intermediate_size counts BOTH mlp branches
        intermediate_size=d["intermediate_size"] // 2,
        num_key_value_heads=d["num_attention_heads"],
        rms_norm_eps=d.get("layer_norm_epsilon", 1e-6),
        rope_theta=d.get("rope_theta", d.get("rotary_emb_base", 10000.0)),
        arch="qwen",
        attention_bias=True,
        fused_qkv_layout="concat",
    )


# ---------------------------------------------------------------------------
# the registry
# ---------------------------------------------------------------------------

_LLAMA_LINEARS = {
    "q_proj": "self_attn.q_proj",
    "k_proj": "self_attn.k_proj",
    "v_proj": "self_attn.v_proj",
    "o_proj": "self_attn.o_proj",
    "gate_proj": "mlp.gate_proj",
    "up_proj": "mlp.up_proj",
    "down_proj": "mlp.down_proj",
}
_LLAMA_NORMS = {
    "input_layernorm": "input_layernorm",
    "post_attention_layernorm": "post_attention_layernorm",
}


def _llama_spec(kind, hf_arch, config_fn, **over) -> ArchSpec:
    kw = dict(
        kind=kind,
        hf_arch=hf_arch,
        layers_prefix="model.layers",
        embed="model.embed_tokens.weight",
        final_norm="model.norm",
        lm_head="lm_head",
        linears=dict(_LLAMA_LINEARS),
        norms=dict(_LLAMA_NORMS),
        config_fn=config_fn,
    )
    kw.update(over)
    return ArchSpec(**kw)


_SPECS = [
    _llama_spec("llama", "LlamaForCausalLM", _cfg_llama),
    _llama_spec("mistral", "MistralForCausalLM", _cfg_mistral),
    _llama_spec("qwen2", "Qwen2ForCausalLM", _cfg_qwen2),
    _llama_spec(
        "qwen3",
        "Qwen3ForCausalLM",
        _cfg_qwen3,
        norms={
            **_LLAMA_NORMS,
            "q_norm": "self_attn.q_norm",
            "k_norm": "self_attn.k_norm",
        },
    ),
    _llama_spec(
        "qwen3_moe",
        "Qwen3MoeForCausalLM",
        _cfg_qwen3_moe,
        norms={
            **_LLAMA_NORMS,
            "q_norm": "self_attn.q_norm",
            "k_norm": "self_attn.k_norm",
        },
        # mlp.* linears stay in the map for mlp_only_layers (dense);
        # sparse layers load mlp.gate + mlp.experts.N.{gate,up,down}_proj
        moe_dialect="deepseek",
    ),
    _llama_spec(
        "qwen2_moe",
        "Qwen2MoeForCausalLM",
        _cfg_qwen2_moe,
        moe_dialect="qwen2_moe",
    ),
    _llama_spec(
        "mixtral",
        "MixtralForCausalLM",
        _cfg_mixtral,
        linears={
            k: v for k, v in _LLAMA_LINEARS.items() if "mlp" not in v
        },
    ),
    _llama_spec(
        "yi",
        "YiForCausalLM",
        _cfg_yi,
        norms={"input_layernorm": "ln1", "post_attention_layernorm": "ln2"},
    ),
    _llama_spec("internlm", "InternLMForCausalLM", _cfg_internlm),
    _llama_spec(
        "gemma2",
        "Gemma2ForCausalLM",
        _cfg_gemma2,
        norms={
            "input_layernorm": "input_layernorm",
            # canonical post_attention_layernorm == the PRE-mlp norm;
            # gemma2's key of that name is the post-ATTN output norm
            "post_attention_layernorm": "pre_feedforward_layernorm",
            "post_attn_norm": "post_attention_layernorm",
            "post_mlp_norm": "post_feedforward_layernorm",
        },
    ),
    _llama_spec(
        "cohere",
        "CohereForCausalLM",
        _cfg_cohere,
        norms={
            "input_layernorm": "input_layernorm",
            "q_norm": "self_attn.q_norm",
            "k_norm": "self_attn.k_norm",
        },
    ),
    ArchSpec(
        kind="internlm2",
        hf_arch="InternLM2ForCausalLM",
        layers_prefix="model.layers",
        embed="model.tok_embeddings.weight",
        final_norm="model.norm",
        lm_head="output",
        linears={
            "o_proj": "attention.wo",
            "gate_proj": "feed_forward.w1",
            "up_proj": "feed_forward.w3",
            "down_proj": "feed_forward.w2",
        },
        norms={
            "input_layernorm": "attention_norm",
            "post_attention_layernorm": "ffn_norm",
        },
        fused_qkv="attention.wqkv",
        config_fn=_cfg_internlm2,
    ),
    _llama_spec("minicpm", "MiniCPMForCausalLM", _cfg_minicpm),
    _llama_spec(
        "baichuan",
        "BaiChuanForCausalLM",
        _cfg_baichuan,
        linears={
            k: v
            for k, v in _LLAMA_LINEARS.items()
            if k not in ("q_proj", "k_proj", "v_proj")
        },
        fused_qkv="self_attn.W_pack",
    ),
    ArchSpec(
        kind="opt",
        hf_arch="OPTForCausalLM",
        layers_prefix="model.decoder.layers",
        embed="model.decoder.embed_tokens.weight",
        final_norm="model.decoder.final_layer_norm",
        pos_embed="model.decoder.embed_positions.weight",
        linears={
            "q_proj": "self_attn.q_proj",
            "k_proj": "self_attn.k_proj",
            "v_proj": "self_attn.v_proj",
            "o_proj": "self_attn.out_proj",
            "up_proj": "fc1",
            "down_proj": "fc2",
        },
        norms={
            "input_layernorm": "self_attn_layer_norm",
            "post_attention_layernorm": "final_layer_norm",
        },
        config_fn=_cfg_opt,
    ),
    ArchSpec(
        kind="gptj",
        hf_arch="GPTJForCausalLM",
        layers_prefix="transformer.h",
        embed="transformer.wte.weight",
        final_norm="transformer.ln_f",
        linears={
            "q_proj": "attn.q_proj",
            "k_proj": "attn.k_proj",
            "v_proj": "attn.v_proj",
            "o_proj": "attn.out_proj",
            "up_proj": "mlp.fc_in",
            "down_proj": "mlp.fc_out",
        },
        norms={"input_layernorm": "ln_1"},
        config_fn=_cfg_gptj,
    ),
    ArchSpec(
        kind="codegen",
        hf_arch="CodeGenForCausalLM",
        layers_prefix="transformer.h",
        embed="transformer.wte.weight",
        final_norm="transformer.ln_f",
        linears={
            "o_proj": "attn.out_proj",
            "up_proj": "mlp.fc_in",
            "down_proj": "mlp.fc_out",
        },
        norms={"input_layernorm": "ln_1"},
        fused_qkv="attn.qkv_proj",
        config_fn=_cfg_codegen,
    ),
    ArchSpec(
        kind="gpt_neox",
        hf_arch="GPTNeoXForCausalLM",
        layers_prefix="gpt_neox.layers",
        embed="gpt_neox.embed_in.weight",
        final_norm="gpt_neox.final_layer_norm",
        lm_head="embed_out",
        linears={
            "o_proj": "attention.dense",
            "up_proj": "mlp.dense_h_to_4h",
            "down_proj": "mlp.dense_4h_to_h",
        },
        norms=dict(_LLAMA_NORMS),
        fused_qkv="attention.query_key_value",
        config_fn=_cfg_gptneox,
    ),
    ArchSpec(
        kind="falcon",
        hf_arch="FalconForCausalLM",
        layers_prefix="transformer.h",
        embed="transformer.word_embeddings.weight",
        final_norm="transformer.ln_f",
        linears={
            "o_proj": "self_attention.dense",
            "up_proj": "mlp.dense_h_to_4h",
            "down_proj": "mlp.dense_4h_to_h",
        },
        norms=dict(_LLAMA_NORMS),
        fused_qkv="self_attention.query_key_value",
        config_fn=_cfg_falcon,
        specialize=_specialize_falcon,
    ),
    ArchSpec(
        kind="bloom",
        hf_arch="BloomForCausalLM",
        layers_prefix="transformer.h",
        embed="transformer.word_embeddings.weight",
        final_norm="transformer.ln_f",
        embed_ln="transformer.word_embeddings_layernorm",
        linears={
            "o_proj": "self_attention.dense",
            "up_proj": "mlp.dense_h_to_4h",
            "down_proj": "mlp.dense_4h_to_h",
        },
        norms=dict(_LLAMA_NORMS),
        fused_qkv="self_attention.query_key_value",
        config_fn=_cfg_bloom,
    ),
    ArchSpec(
        kind="mpt",
        hf_arch="MptForCausalLM",
        layers_prefix="transformer.blocks",
        embed="transformer.wte.weight",
        final_norm="transformer.norm_f",
        linears={
            "o_proj": "attn.out_proj",
            "up_proj": "ffn.up_proj",
            "down_proj": "ffn.down_proj",
        },
        norms={
            "input_layernorm": "norm_1",
            "post_attention_layernorm": "norm_2",
        },
        fused_qkv="attn.Wqkv",
        config_fn=_cfg_mpt,
    ),
    _llama_spec(
        "phi3",
        "Phi3ForCausalLM",
        _cfg_phi3,
        linears={"o_proj": "self_attn.o_proj", "down_proj": "mlp.down_proj"},
        fused_qkv="self_attn.qkv_proj",
        fused_gate_up="mlp.gate_up_proj",
    ),
    _llama_spec("gemma", "GemmaForCausalLM", _cfg_gemma),
    ArchSpec(
        kind="gpt2",
        hf_arch="GPT2LMHeadModel",
        layers_prefix="transformer.h",
        embed="transformer.wte.weight",
        final_norm="transformer.ln_f",
        pos_embed="transformer.wpe.weight",
        linears={
            "o_proj": "attn.c_proj",
            "up_proj": "mlp.c_fc",
            "down_proj": "mlp.c_proj",
        },
        norms={"input_layernorm": "ln_1", "post_attention_layernorm": "ln_2"},
        fused_qkv="attn.c_attn",
        conv1d=True,
        config_fn=_cfg_gpt2,
    ),
    ArchSpec(
        kind="gpt_bigcode",
        hf_arch="GPTBigCodeForCausalLM",
        layers_prefix="transformer.h",
        embed="transformer.wte.weight",
        final_norm="transformer.ln_f",
        pos_embed="transformer.wpe.weight",
        linears={
            "o_proj": "attn.c_proj",
            "up_proj": "mlp.c_fc",
            "down_proj": "mlp.c_proj",
        },
        norms={"input_layernorm": "ln_1", "post_attention_layernorm": "ln_2"},
        fused_qkv="attn.c_attn",
        config_fn=_cfg_bigcode,
    ),
    ArchSpec(
        kind="starcoder2",
        hf_arch="Starcoder2ForCausalLM",
        layers_prefix="model.layers",
        embed="model.embed_tokens.weight",
        final_norm="model.norm",
        linears={
            "q_proj": "self_attn.q_proj",
            "k_proj": "self_attn.k_proj",
            "v_proj": "self_attn.v_proj",
            "o_proj": "self_attn.o_proj",
            "up_proj": "mlp.c_fc",
            "down_proj": "mlp.c_proj",
        },
        norms=dict(_LLAMA_NORMS),
        config_fn=_cfg_starcoder2,
    ),
    _llama_spec("stablelm", "StableLmForCausalLM", _cfg_stablelm),
    _llama_spec(
        "stablelm_epoch", "StableLMEpochForCausalLM", _cfg_stablelm_epoch
    ),
    ArchSpec(
        kind="phi",
        hf_arch="PhiForCausalLM",
        layers_prefix="model.layers",
        embed="model.embed_tokens.weight",
        final_norm="model.final_layernorm",
        linears={
            "q_proj": "self_attn.q_proj",
            "k_proj": "self_attn.k_proj",
            "v_proj": "self_attn.v_proj",
            "o_proj": "self_attn.dense",
            "up_proj": "mlp.fc1",
            "down_proj": "mlp.fc2",
        },
        norms={"input_layernorm": "input_layernorm"},
        config_fn=_cfg_phi,
    ),
    ArchSpec(
        kind="llava",
        hf_arch="LlavaForConditionalGeneration",
        layers_prefix="model.language_model.layers",
        embed="model.language_model.embed_tokens.weight",
        final_norm="model.language_model.norm",
        lm_head="lm_head",
        linears=dict(_LLAMA_LINEARS),
        norms=dict(_LLAMA_NORMS),
        config_fn=_cfg_llava,
        passthrough=(
            "model.vision_tower.",
            "model.multi_modal_projector.",
            "model.image_newline",  # llava-next
        ),
    ),
    ArchSpec(
        kind="deepseek_v2",
        hf_arch="DeepseekV2ForCausalLM",
        layers_prefix="model.layers",
        embed="model.embed_tokens.weight",
        final_norm="model.norm",
        lm_head="lm_head",
        linears={
            "q_proj": "self_attn.q_proj",
            "q_a_proj": "self_attn.q_a_proj",
            "q_b_proj": "self_attn.q_b_proj",
            "kv_a_proj_with_mqa": "self_attn.kv_a_proj_with_mqa",
            "kv_b_proj": "self_attn.kv_b_proj",
            "o_proj": "self_attn.o_proj",
            # dense (first_k_dense_replace) layers only; MoE layers load
            # through the deepseek moe_dialect
            "gate_proj": "mlp.gate_proj",
            "up_proj": "mlp.up_proj",
            "down_proj": "mlp.down_proj",
        },
        norms={
            "input_layernorm": "input_layernorm",
            "post_attention_layernorm": "post_attention_layernorm",
            "q_a_layernorm": "self_attn.q_a_layernorm",
            "kv_a_layernorm": "self_attn.kv_a_layernorm",
        },
        moe_dialect="deepseek",
        config_fn=_cfg_deepseek_v2,
    ),
    ArchSpec(
        kind="qwen",
        hf_arch="QWenLMHeadModel",
        layers_prefix="transformer.h",
        embed="transformer.wte.weight",
        final_norm="transformer.ln_f",
        linears={
            "o_proj": "attn.c_proj",
            "gate_proj": "mlp.w2",
            "up_proj": "mlp.w1",
            "down_proj": "mlp.c_proj",
        },
        norms={"input_layernorm": "ln_1", "post_attention_layernorm": "ln_2"},
        fused_qkv="attn.c_attn",
        config_fn=_cfg_qwen,
    ),
]

_ALIASES = {
    # llama weight-dialect clones (reference also routes these through
    # its llama tables: aquila/xverse in sequential_layes_*_config.py)
    "AquilaForCausalLM": "LlamaForCausalLM",
    "XverseForCausalLM": "LlamaForCausalLM",
    "BaichuanForCausalLM": "BaiChuanForCausalLM",  # 13B spelling
    "MossForCausalLM": "CodeGenForCausalLM",  # codegen-derived fused qkv
    "RWForCausalLM": "FalconForCausalLM",  # pre-rename falcon
    "MPTForCausalLM": "MptForCausalLM",
    "GPT2ForCausalLM": "GPT2LMHeadModel",
    # llava-next shares llava's key layout (+ model.image_newline)
    "LlavaNextForConditionalGeneration": "LlavaForConditionalGeneration",
}

_BY_HF: Dict[str, ArchSpec] = {s.hf_arch: s for s in _SPECS}
_BY_KIND: Dict[str, ArchSpec] = {s.kind: s for s in _SPECS}

SUPPORTED_HF_ARCHS = sorted(_BY_HF) + sorted(_ALIASES)


def get_spec(hf_arch: str) -> ArchSpec:
    # some checkpoints in the wild carry stray whitespace in the tag
    hf_arch = hf_arch.strip()
    hf_arch = _ALIASES.get(hf_arch, hf_arch)
    if hf_arch not in _BY_HF:
        raise NotImplementedError(
            f"architecture {hf_arch} not supported "
            f"(supported: {SUPPORTED_HF_ARCHS})"
        )
    return _BY_HF[hf_arch]


def _looks_like_llama_cfg(d: dict) -> bool:
    return all(
        k in d
        for k in (
            "hidden_size",
            "num_hidden_layers",
            "num_attention_heads",
            "intermediate_size",
            "vocab_size",
        )
    )


def spec_for_config(d: dict) -> ArchSpec:
    """Concrete (specialized) spec for a raw HF config dict.

    Unknown architecture strings whose config walks like a llama fall
    back to the llama spec with a loud warning — the reference's
    behavior for unlisted models (sequential_layes_gptq_config.py:
    153-173 auto-detects a grouping by module-name prefixes instead of
    hard-failing). Genuinely unmappable configs still raise."""
    if d.get("qllm_tpu_normalized"):
        # our own normalized dialect: sub-variant info lives in the
        # ModelConfig fields, not in HF-native keys
        return spec_from_model_config(model_config_from_hf_dict(d))
    archs = d.get("architectures") or ["LlamaForCausalLM"]
    if "num_key_value_heads_per_layer" in d:
        # DeciLM-style variable GQA: kv-head count differs per layer,
        # which the uniform stacked KV cache cannot represent
        raise NotImplementedError(
            f"{archs[0]}: per-layer variable GQA "
            "(num_key_value_heads_per_layer) is not supported"
        )
    try:
        spec = get_spec(archs[0])
    except NotImplementedError:
        if not _looks_like_llama_cfg(d):
            raise
        from ..utils.logger import get_logger

        get_logger().warning(
            f"architecture {archs[0]!r} is not in the registry but its "
            "config walks like a llama — loading with the generic llama "
            "mapping (best effort; verify outputs against the source "
            "model)"
        )
        spec = dataclasses.replace(
            _BY_KIND["llama"], hf_arch=archs[0].strip()
        )
    if spec.specialize is not None:
        spec = spec.specialize(spec, d)
    return spec


def sniff_llama_layout(tensors, spec: ArchSpec) -> ArchSpec:
    """Adjust a generic-fallback llama spec to the checkpoint's actual
    key prefixes (the tensor-level half of the reference's prefix
    auto-detection). Finds the layers prefix carrying llama-shaped
    linears and the sibling embed/norm keys."""
    prefixes = set()
    for k in tensors:
        if ".layers.0." in k:
            prefixes.add(k.split(".layers.0.")[0] + ".layers")
        elif k.startswith("layers.0."):
            prefixes.add("layers")
    for p in sorted(prefixes):
        if f"{p}.0.{spec.linears['q_proj']}.weight" in tensors:
            root = p[: -len(".layers")] if p != "layers" else ""
            dot = root + "." if root else ""
            embed = next(
                (
                    k[: -len(".weight")]
                    for k in tensors
                    if k.endswith("embed_tokens.weight")
                ),
                spec.embed[: -len(".weight")]
                if spec.embed.endswith(".weight")
                else spec.embed,
            )
            lm_head = "lm_head" if "lm_head.weight" in tensors else None
            return dataclasses.replace(
                spec,
                layers_prefix=p,
                embed=embed + ".weight",
                final_norm=f"{dot}norm",
                lm_head=lm_head,
            )
    return spec


def spec_from_model_config(cfg: ModelConfig) -> ArchSpec:
    """Concrete spec from an already-parsed ModelConfig (save path)."""
    spec = _BY_KIND[cfg.arch]
    if cfg.arch == "falcon" and cfg.variant == "new":
        spec = dataclasses.replace(
            spec,
            norms={
                "input_layernorm": "ln_attn",
                "post_attention_layernorm": "ln_mlp",
            },
        )
    return spec


def model_config_from_hf_dict(d: dict) -> ModelConfig:
    """HF config.json dict -> ModelConfig (normalized dialect first)."""
    if d.get("qllm_tpu_normalized"):
        fields = {f.name for f in dataclasses.fields(ModelConfig)}
        return ModelConfig(**{k: v for k, v in d.items() if k in fields})
    return spec_for_config(d).config_fn(d)


def normalized_config_dict(cfg: ModelConfig) -> dict:
    """ModelConfig -> a config.json our loader round-trips exactly.

    Carries every ModelConfig field verbatim plus the HF architectures
    tag (so ecosystem tools can at least identify the model family).
    """
    spec = spec_from_model_config(cfg)
    out = {"qllm_tpu_normalized": True, "architectures": [spec.hf_arch],
           "model_type": cfg.arch, "torch_dtype": "float16"}
    for f in dataclasses.fields(ModelConfig):
        out[f.name] = getattr(cfg, f.name)
    return out
