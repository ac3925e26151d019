"""Decoder-family causal LM as a pure function over a params pytree.

One parametric implementation covers the architecture families the
reference quantizes via its per-arch tables
(sequential_layes_gptq_config.py:4-150, sequential_layes_awq_config.py):

  * llama shape family (llama/mistral/qwen2/yi/vicuna/tinyllama):
    GQA + RoPE + SwiGLU + RMSNorm
  * parallel-residual blocks (gptj / gpt-neox / falcon)
  * ALiBi position bias (bloom / mpt / baichuan-13b)
  * non-gated MLP + LayerNorm + learned positions (opt / gpt2)
  * fused-qkv checkpoints (baichuan W_pack, phi3, bloom/neox/falcon
    query_key_value, gpt2 c_attn) — split at import into canonical
    q/k/v (exact: packing is along K, fusion along N; modeling/archs.py)

Numerics follow the HF implementations (rotate-half or interleaved
RoPE, fp32 softmax) so imported checkpoints reproduce reference
perplexity (SURVEY.md §6: PPL within 0.05 at equal bits/groupsize).

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
    # rope scaling (HF rope_scaling dict): "" | "linear" | "yarn".
    # yarn follows DeepseekV2YarnRotaryEmbedding (NTK-by-parts ramp
    # between extrapolated and interpolated frequencies + attention
    # magnitude mscale); flagship DeepSeek-V2/V2-Lite ship with it.
    rope_scaling_type: str = ""
    rope_scaling_factor: float = 1.0
    rope_orig_max_position: int = 0  # original_max_position_embeddings
    rope_beta_fast: float = 32.0
    rope_beta_slow: float = 1.0
    rope_mscale: float = 1.0
    rope_mscale_all_dim: float = 0.0
    max_position_embeddings: int = 4096
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # qwen2-style qkv bias
    mlp_bias: bool = False
    arch: str = "llama"
    # ---- architecture-family switches (all default to llama behavior)
    norm_type: str = "rmsnorm"  # rmsnorm | layernorm | rmsnorm_plus1 (gemma)
    pos_embedding: str = "rope"  # rope | alibi | learned
    rope_style: str = "neox"  # neox (rotate-half) | gptj (interleaved)
    rotary_dim: int = 0  # 0 = full head_dim; else partial rotary (gptj/neox)
    mlp_type: str = "gated"  # gated (SwiGLU-style) | plain (fc1-act-fc2)
    hidden_act: str = "silu"  # silu | gelu | gelu_new | relu
    parallel_residual: bool = False  # h + attn(x) + mlp(x') (gptj/neox/falcon)
    shared_input_norm: bool = False  # parallel block w/ ONE norm (gptj/falcon-7b)
    learned_pos_offset: int = 0  # opt: positions shift by 2
    embed_layernorm: bool = False  # bloom word_embeddings_layernorm
    embedding_multiplier: float = 1.0  # gemma sqrt(hidden)
    logit_scale: float = 1.0  # some archs scale final logits
    alibi_style: str = "bloom"  # bloom | mpt (non-pow2 head-count ordering)
    # checkpoint-dialect metadata (no effect on forward numerics):
    # how the source arch fuses qkv columns (modeling.archs) + sub-variant
    fused_qkv_layout: str = ""  # "" = arch stores split q/k/v
    variant: str = ""  # e.g. falcon: "new" | "7b" | "rw"
    # MoE (mixtral-family); 0 experts = dense MLP
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    # sliding-window attention (mistral/qwen2/gemma2): 0 = full causal.
    # swa_pattern "all" applies the window to every layer >= swa_min_layer
    # (mistral; qwen2 via max_window_layers); "even" to even layer ids
    # only (gemma2 alternates local/global, HF Gemma2Attention:
    # sliding_window if not bool(layer_idx % 2)).
    sliding_window: int = 0
    swa_pattern: str = "all"  # all | even
    swa_min_layer: int = 0
    # gemma2-family: norms on BOTH sides of attn/mlp + logit soft-capping
    post_norms: bool = False  # post_attn_norm/post_mlp_norm on sublayer outputs
    attn_logit_softcap: float = 0.0  # cap*tanh(logits/cap); 0 = off
    final_logit_softcap: float = 0.0
    attn_scale: float = 0.0  # overrides hd**-0.5 (gemma2 query_pre_attn_scalar**-0.5)
    # minicpm: residuals scaled by scale_depth/sqrt(num_layers)
    residual_multiplier: float = 1.0
    # "" | "cohere" (per-head mean-sub layernorm, weight [H, hd]) |
    # "rms" (qwen3: RMSNorm over hd, one weight [hd] shared across heads)
    qk_norm: str = ""
    # deepseek-v2 MLA (multi-head latent attention) — reference supports
    # this family via its AWQ topology table
    # (sequential_layes_awq_config.py get_deepseek_v2_layers)
    attn_type: str = "mha"  # mha | mla
    q_lora_rank: int = 0  # 0 = plain q_proj (deepseek-v2-lite)
    kv_lora_rank: int = 0
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    # deepseek MoE routing (vs mixtral's softmax-over-top-k):
    # softmax over ALL experts -> (optional group-limited) top-k ->
    # weights * routed_scaling_factor, plus always-on shared experts
    moe_router: str = "mixtral"  # mixtral | deepseek
    norm_topk_prob: bool = False  # deepseek: renormalize top-k weights
    topk_method: str = "greedy"  # deepseek: greedy | group_limited_greedy
    n_group: int = 0
    topk_group: int = 0
    routed_scaling_factor: float = 1.0
    n_shared_experts: int = 0
    first_k_dense_replace: int = 0
    moe_intermediate_size: int = 0

    @property
    def hd(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def n_rep(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def rot_dim(self) -> int:
        return self.rotary_dim or self.hd


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

# deepseek-v2 MLA projections (reference quantizes these through its
# AWQ/GPTQ name tables; here they are first-class canonical linears)
MLA_LINEAR_NAMES = (
    "q_a_proj",
    "q_b_proj",
    "kv_a_proj_with_mqa",
    "kv_b_proj",
)

# every canonical linear name any architecture can carry — drivers
# iterate this and skip names absent from the layer dict
ALL_LINEAR_NAMES = LINEAR_NAMES + MLA_LINEAR_NAMES


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

    def norm_w():
        return (
            jnp.zeros((D,), dtype)
            if cfg.norm_type == "rmsnorm_plus1"
            else jnp.ones((D,), dtype)
        )

    def layer(k):
        ks = jax.random.split(k, 7 + 3 * max(1, cfg.num_local_experts))
        p = {
            "input_layernorm": norm_w(),
            "q_proj": dense(ks[0], D, H * hd),
            "k_proj": dense(ks[1], D, Hkv * hd),
            "v_proj": dense(ks[2], D, Hkv * hd),
            "o_proj": dense(ks[3], H * hd, D),
        }
        if not cfg.shared_input_norm:
            p["post_attention_layernorm"] = norm_w()
        if cfg.post_norms:
            p["post_attn_norm"] = norm_w()
            p["post_mlp_norm"] = norm_w()
        if cfg.qk_norm == "cohere":
            p["q_norm"] = jnp.ones((H, hd), dtype)
            p["k_norm"] = jnp.ones((Hkv, hd), dtype)
        if cfg.norm_type == "layernorm":
            p["input_layernorm_bias"] = jnp.zeros((D,), dtype)
            if not cfg.shared_input_norm:
                p["post_attention_layernorm_bias"] = jnp.zeros((D,), dtype)
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
            if cfg.mlp_type == "gated":
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
        "norm": (
            jnp.zeros((D,), dtype)
            if cfg.norm_type == "rmsnorm_plus1"
            else jnp.ones((D,), dtype)
        ),
    }
    if cfg.norm_type == "layernorm":
        params["norm_bias"] = jnp.zeros((D,), dtype)
    if cfg.pos_embedding == "learned":
        params["pos_embed"] = (
            jax.random.normal(
                keys[0],
                (cfg.max_position_embeddings + cfg.learned_pos_offset, D),
                dtype,
            )
            * 0.02
        )
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


def _norm_input(pv, cfg: ModelConfig, h: jax.Array, name: str):
    """rms_norm(h, <name>) — or a stacked-view NormedX marker that the
    next quantized matmul fuses in-kernel (ops.pallas_qmm full-K planar
    path). Paths that cannot consume the marker (MoE router, dense
    weights) materialize it, so semantics never change."""
    mk = getattr(pv, "fused_norm_arg", None)
    if mk is not None:
        nx = mk(h, name, cfg)
        if nx is not None:
            return nx
    return apply_norm(cfg, h, pv.get(name), pv.get(f"{name}_bias"))


def _mat(x):
    """Materialize a pending fused norm (stacked.NormedX) if present."""
    return x.materialize() if hasattr(x, "materialize") else x


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(dt) * weight


def layer_norm(
    x: jax.Array, weight: jax.Array, bias: Optional[jax.Array], eps: float
) -> jax.Array:
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dt)


def qk_head_norm(
    x: jax.Array, weight: jax.Array, eps: float, kind: str = "cohere"
) -> jax.Array:
    """Per-head q/k normalization, two dialects:

    cohere — mean-subtracting layernorm (no bias) over the head dim,
    with a PER-HEAD weight [H, hd] (HF CohereLayerNorm applied to q/k
    reshaped [B, T, H, hd]).
    rms — RMSNorm over the head dim with ONE weight [hd] shared across
    heads (HF Qwen3RMSNorm(head_dim) in Qwen3Attention: q_norm/k_norm
    applied before rope)."""
    xf = x.astype(jnp.float32)
    w = weight.astype(jnp.float32)
    if kind == "rms":
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * w[None, None]).astype(x.dtype)


def apply_norm(cfg: ModelConfig, x, weight, bias=None) -> jax.Array:
    if cfg.norm_type == "layernorm":
        return layer_norm(x, weight, bias, cfg.rms_norm_eps)
    if cfg.norm_type == "rmsnorm_plus1":
        # gemma stores (w - 1); HF computes x * (1 + w) in f32
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + cfg.rms_norm_eps)
        return (y * (1.0 + weight.astype(jnp.float32))).astype(x.dtype)
    return rms_norm(x, weight, cfg.rms_norm_eps)


def act_fn(name: str, x: jax.Array) -> jax.Array:
    if name == "silu":
        return jax.nn.silu(x)
    if name in ("gelu", "gelu_python"):
        return jax.nn.gelu(x, approximate=False)
    if name in ("gelu_new", "gelu_pytorch_tanh", "gelu_fast"):
        return jax.nn.gelu(x, approximate=True)
    if name == "relu":
        return jax.nn.relu(x)
    raise NotImplementedError(f"hidden_act {name}")


def _yarn_get_mscale(scale: float, mscale: float) -> float:
    if scale <= 1.0 or mscale == 0.0:
        return 1.0
    import math

    return 0.1 * mscale * math.log(scale) + 1.0


def rope_inv_freq_mscale(cfg) -> Tuple[Any, float]:
    """(inv_freq [rd/2] numpy f32, cos/sin amplitude mscale) for the
    configured rope scaling. Pure numpy so eval/numpy_ref and the ONNX
    exporter share the exact table the jit'd forward uses.

    yarn follows HF DeepseekV2YarnRotaryEmbedding (NTK-by-parts: linear
    ramp between interpolated and extrapolated inv_freq over the
    correction range derived from beta_fast/beta_slow), amplitude
    scaled by get_mscale(factor, mscale)/get_mscale(factor,
    mscale_all_dim). linear follows LlamaLinearScalingRotaryEmbedding.
    """
    import math

    import numpy as np

    rd = cfg.rot_dim
    base = cfg.rope_theta
    inv_freq = 1.0 / (
        base ** (np.arange(0, rd, 2, dtype=np.float32) / rd)
    )
    st = getattr(cfg, "rope_scaling_type", "")
    if not st:
        return inv_freq, 1.0
    factor = cfg.rope_scaling_factor
    if st == "linear":
        return inv_freq / factor, 1.0
    if st == "yarn":
        orig_max = cfg.rope_orig_max_position or cfg.max_position_embeddings

        def corr_dim(n_rot):
            return (
                rd
                * math.log(orig_max / (n_rot * 2 * math.pi))
                / (2 * math.log(base))
            )

        low = max(math.floor(corr_dim(cfg.rope_beta_fast)), 0)
        high = min(math.ceil(corr_dim(cfg.rope_beta_slow)), rd - 1)
        ramp = np.clip(
            (np.arange(rd // 2, dtype=np.float32) - low)
            / max(high - low, 0.001),
            0.0,
            1.0,
        )
        inv_freq_mask = 1.0 - ramp
        inv_freq = (inv_freq / factor) * (
            1.0 - inv_freq_mask
        ) + inv_freq * inv_freq_mask
        msc = _yarn_get_mscale(factor, cfg.rope_mscale) / _yarn_get_mscale(
            factor, cfg.rope_mscale_all_dim
        )
        return inv_freq.astype(np.float32), float(msc)
    raise NotImplementedError(f"rope_scaling type {st}")


def _rope_cos_sin(
    positions: jax.Array,
    rot_dim: int,
    theta: float,
    style: str = "neox",
    cfg=None,
):
    """positions [B, T] -> cos/sin [B, T, rot_dim].

    neox: HF rotate-half layout (freqs duplicated by concat)
    gptj: interleaved layout (freqs duplicated by repeat_interleave)
    Pass ``cfg`` to honor rope_scaling (yarn/linear).
    """
    if cfg is not None and getattr(cfg, "rope_scaling_type", ""):
        inv_np, msc = rope_inv_freq_mscale(cfg)
        inv_freq = jnp.asarray(inv_np)
    else:
        inv_freq = 1.0 / (
            theta ** (jnp.arange(0, rot_dim, 2, dtype=jnp.float32) / rot_dim)
        )
        msc = 1.0
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [B,T,rd/2]
    if style == "gptj":
        emb = jnp.repeat(freqs, 2, axis=-1)
    else:
        emb = jnp.concatenate([freqs, freqs], axis=-1)
    if msc != 1.0:
        return jnp.cos(emb) * msc, jnp.sin(emb) * msc
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _rotate_every_two(x: jax.Array) -> jax.Array:
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(q, k, cos, sin, style: str = "neox", rot_dim: int = 0):
    """q [B,T,H,hd], k [B,T,Hkv,hd]; cos/sin [B,T,rot_dim]."""
    hd = q.shape[-1]
    rd = rot_dim or hd
    c, s = cos[:, :, None, :], sin[:, :, None, :]
    rot = _rotate_every_two if style == "gptj" else _rotate_half

    def rope1(x):
        xf = x.astype(jnp.float32)
        if rd != hd:  # partial rotary: pass-through tail
            xr, xp = xf[..., :rd], xf[..., rd:]
            xr = xr * c + rot(xr) * s
            return jnp.concatenate([xr, xp], axis=-1).astype(x.dtype)
        return (xf * c + rot(xf) * s).astype(x.dtype)

    return rope1(q), rope1(k)


def alibi_slopes(n_heads: int, style: str = "bloom") -> jax.Array:
    """ALiBi head slopes. For power-of-two head counts both dialects
    give 2^(-8(i+1)/n); they order the extra slopes differently for
    non-power-of-two counts:

    bloom: closest (lower) pow2 slopes + even-indexed slopes of 2x
           (HF modeling_bloom.build_alibi_tensor)
    mpt:   slopes for the CEILING pow2, reordered odd-first
           (HF modeling_mpt.build_mpt_alibi_tensor, alibi_bias_max=8)
    """
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start**i) for i in range(n)]

    if style == "mpt":
        n_ceil = 2 ** math.ceil(math.log2(n_heads))
        sl = [2.0 ** (-8.0 * (i + 1) / n_ceil) for i in range(n_ceil)]
        if n_ceil != n_heads:
            sl = (sl[1::2] + sl[0::2])[:n_heads]
        return jnp.asarray(sl, jnp.float32)
    if math.log2(n_heads).is_integer():
        sl = pow2_slopes(n_heads)
    else:
        closest = 2 ** math.floor(math.log2(n_heads))
        sl = pow2_slopes(closest)
        extra = pow2_slopes(2 * closest)
        sl += extra[0::2][: n_heads - closest]
    return jnp.asarray(sl, jnp.float32)


def layer_uses_swa(cfg: ModelConfig, layer_idx) -> bool:
    """Whether this layer serves sliding-window attention (HF
    semantics: mistral = all layers; qwen2 = layers >= max_window_layers
    when use_sliding_window; gemma2 = even layer ids).

    Under a lax.scan the layer index is a tracer; the answer must then
    be static, so SWA models conservatively take the masked XLA path
    for every layer (the caller selects the per-layer mask with
    ``swa_layer_pred``)."""
    if cfg.sliding_window <= 0:
        return False
    if not isinstance(layer_idx, int):
        return True  # traced index (scan): gate kernels off, use masks
    if layer_idx < cfg.swa_min_layer:
        return False
    return cfg.swa_pattern != "even" or layer_idx % 2 == 0


def swa_layer_pred(cfg: ModelConfig, layer_idx) -> jax.Array:
    """Traced boolean form of layer_uses_swa for scan bodies."""
    p = jnp.asarray(layer_idx) >= cfg.swa_min_layer
    if cfg.swa_pattern == "even":
        p = p & (jnp.asarray(layer_idx) % 2 == 0)
    return p


def build_mask(
    cfg: ModelConfig,
    B: int,
    T: int,
    S: int,
    pos: Optional[jax.Array],
    window: int = 0,
) -> jax.Array:
    """Additive attention bias [B, 1 or H, T, S]: causal -inf mask plus
    (for alibi archs) the per-head position bias. ``window`` > 0 also
    masks keys older than ``window``-1 positions behind the query (HF
    sliding-window semantics: keep s where q_pos - s < window).

    ALiBi bias uses the key-position form slopes[h] * s — equivalent to
    the distance form up to a per-row constant, which softmax ignores.
    """
    if pos is None:
        q_pos = jnp.arange(T)[:, None]
    elif jnp.ndim(pos) == 0:
        q_pos = pos + jnp.arange(T)[:, None]
    else:  # per-slot offsets [B]
        q_pos = pos[:, None, None, None] + jnp.arange(T)[None, None, :, None]
        s_idx = jnp.arange(S)[None, None, None, :]
        keep = s_idx <= q_pos
        if window > 0:
            keep = keep & (s_idx > q_pos - window)
        mask = jnp.where(keep, 0.0, -jnp.inf).astype(jnp.float32)
        mask = jnp.broadcast_to(mask, (B, 1, T, S))
        if cfg.pos_embedding == "alibi":
            sl = alibi_slopes(cfg.num_attention_heads, cfg.alibi_style)
            bias = sl[None, :, None, None] * jnp.arange(S, dtype=jnp.float32)[
                None, None, None, :
            ]
            mask = mask + bias
        return mask
    s_idx = jnp.arange(S)[None, :]
    keep = s_idx <= q_pos
    if window > 0:
        keep = keep & (s_idx > q_pos - window)
    mask = jnp.where(keep, 0.0, -jnp.inf).astype(jnp.float32)
    mask = jnp.broadcast_to(mask.reshape(1, 1, T, S), (B, 1, T, S))
    if cfg.pos_embedding == "alibi":
        sl = alibi_slopes(cfg.num_attention_heads, cfg.alibi_style)
        bias = sl[None, :, None, None] * jnp.arange(S, dtype=jnp.float32)[
            None, None, None, :
        ]
        mask = mask + bias
    return mask


def _flash_prefill_ok(cfg, T: int, hd: int) -> bool:
    """Route prefill through ops.pallas_attention.prefill_attention_flash
    (blockwise causal, no O(T*S) logits materialization) when the shape
    qualifies; the XLA path below remains the universal fallback (alibi
    bias, narrow heads, tiny prompts)."""
    import os as _os

    return (
        T >= int(_os.environ.get("QLLM_TPU_PREFILL_FLASH_MIN_T", "256"))
        and cfg.pos_embedding != "alibi"  # kernel lacks the bias term
        and hd % 128 == 0  # lane-aligned head width
        and _pallas_attn_enabled()
    )


def _prefill_window(cfg: ModelConfig, layer_idx, s_keys: int):
    """Traced per-layer sliding window for the flash prefill kernel:
    SWA layers mask at cfg.sliding_window, global layers pass
    s_keys+1 (a no-op) — one compiled scan body serves gemma2's
    alternating pattern. None when the model has no window."""
    if cfg.sliding_window <= 0:
        return None
    return jnp.where(
        swa_layer_pred(cfg, layer_idx),
        jnp.int32(cfg.sliding_window),
        jnp.int32(s_keys + 1),
    )


def _attention(
    q: jax.Array,  # [B, T, H, hd]
    k: jax.Array,  # [B, S, Hkv, hd]
    v: jax.Array,  # [B, S, Hkv, hd]
    mask: jax.Array,  # [B, 1|H, T, S] additive (0 / -inf / alibi)
    n_rep: int,
    softcap: float = 0.0,
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
    if softcap:
        # gemma2 attn_logit_softcapping (HF eager semantics: capped
        # BEFORE the causal mask is added)
        logits = softcap * jnp.tanh(logits / softcap)
    probs = jax.nn.softmax(logits + mask, axis=-1)
    out = jnp.einsum(
        "bhts,bshd->bthd",
        probs.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


# --------------------------------------------------------------------------
# Shared block body: one implementation serves the per-layer (list) path
# and the stacked/scan serving path (models.stacked) via the accessors.
# --------------------------------------------------------------------------


class LayerView:
    """Accessor for one layer's params in a per-layer dict."""

    def __init__(self, lp: Dict[str, Any]):
        self.lp = lp

    def get(self, name):
        return self.lp.get(name)

    def apply(self, name, x):
        return apply_linear(self.lp[name], x, self.lp.get(f"{name}_bias"))

    def apply_expert(self, name, e, x):
        """x @ experts_stacked[name][e] — ``e`` may be traced (top-k
        decode) or a python int (dense loop). TP views override this to
        serve local expert shards."""
        from .moe import expert_linear

        return expert_linear(self.lp["experts_stacked"][name], e, x)

    def apply_experts_grouped(self, name, ids, x_rows, x_shared=False):
        """Batched per-selection expert matmul: y[i] = x_rows[i] @
        W[ids[i]] (ONE grouped-kernel launch when eligible)."""
        from .moe import grouped_expert_linear

        return grouped_expert_linear(
            self.lp["experts_stacked"][name], ids, x_rows, x_shared
        )

    def fused_expert_mlp(self, ids, x_rows, cfg):
        """Whole expert MLP in one fused kernel launch when eligible
        (ops.pallas_qmm.qmatmul_grouped_experts_fused); None -> caller
        runs the per-projection grouped path. TP views don't override
        (row-sharded down needs its own psum point)."""
        est = self.lp.get("experts_stacked") or {}
        gu, dn = est.get("gateup_proj"), est.get("down_proj")
        from ..ops.pallas_qmm import (
            grouped_fused_ok,
            qmatmul_grouped_experts_fused,
        )
        from ..quant.qtensor import QuantizedTensor

        if not (
            isinstance(gu, QuantizedTensor)
            and isinstance(dn, QuantizedTensor)
            and grouped_fused_ok(gu, dn, x_rows.shape[0], cfg.hidden_act)
        ):
            return None
        return qmatmul_grouped_experts_fused(
            x_rows, gu, dn, ids, act=cfg.hidden_act
        )

    def apply_shared(self, name, x):
        """Shared-expert linear (deepseek/qwen2-moe always-on MLP).
        The stacked serving view overrides this to ride the tuned
        [L]-stacked kernel."""
        return apply_linear(self.lp["shared_experts"][name], x)

    def combine_moe(self, out):
        """Hook for TP views: psum the routed-experts partial sum (the
        experts' down_proj is row-sharded there). Identity single-chip."""
        return out


def _block_attn_mlp(
    pv,
    cfg: ModelConfig,
    h: jax.Array,
    cos,
    sin,
    mask,
    cache: Optional[QuantizedKVCache],
    layer_idx,
    pos,
) -> Tuple[jax.Array, Optional[QuantizedKVCache]]:
    """One transformer block, all architecture families. ``pv`` is a
    LayerView-like accessor (get/apply)."""
    B, T, D = h.shape
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd

    x = _norm_input(pv, cfg, h, "input_layernorm")
    if cfg.attn_type == "mla":
        attn_flat, cache = _mla_attention(
            pv, cfg, x, cos, sin, mask, cache, layer_idx, pos
        )
        return _finish_block(pv, cfg, h, x, attn_flat, cache)
    q = pv.apply("q_proj", x)
    k = pv.apply("k_proj", x)
    v = pv.apply("v_proj", x)
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, Hkv, hd)
    v = v.reshape(B, T, Hkv, hd)
    if cfg.qk_norm:
        q = qk_head_norm(q, pv.get("q_norm"), cfg.rms_norm_eps, cfg.qk_norm)
        k = qk_head_norm(k, pv.get("k_norm"), cfg.rms_norm_eps, cfg.qk_norm)
    if cfg.pos_embedding == "rope":
        q, k = apply_rope(q, k, cos, sin, cfg.rope_style, cfg.rotary_dim)
    if cfg.attn_scale:
        # fold a non-default attention scale into q so EVERY attention
        # path (XLA + Pallas kernels, all of which multiply hd**-0.5)
        # nets out to attn_scale — keeps gemma2 on the fused kernels
        q = q * jnp.asarray(cfg.attn_scale * hd**0.5, q.dtype)

    if cache is not None:
        import os as _os

        can_kernel = (
            T == 1
            and cache.quantized
            and _pallas_attn_enabled()
        )
        al_slopes = None
        if cfg.pos_embedding == "alibi" and can_kernel:
            al_slopes = alibi_slopes(
                cfg.num_attention_heads, cfg.alibi_style
            )
        win = None
        if cfg.sliding_window > 0 and can_kernel:
            # traced per-layer window: SWA layers mask, global layers
            # pass max_seq+1 (a no-op) — one compiled scan body serves
            # gemma2's alternating local/global pattern
            win = jnp.where(
                swa_layer_pred(cfg, layer_idx),
                jnp.int32(cfg.sliding_window),
                jnp.int32(cache.max_seq + 1),
            )
        if can_kernel and cache.ring_k is not None and (
            cfg.attn_logit_softcap != 0.0
            or al_slopes is not None
            or win is not None
        ):
            raise NotImplementedError(
                "ring-fused decode applies neither the logit softcap, "
                "the alibi bias, nor sliding-window masking — create the "
                "cache with ring=False for gemma2/bloom/mpt/mistral-"
                "style models"
            )
        if can_kernel and cache.ring_k is not None:
            # ring-fused path: the attention kernel appends this token's
            # k/v to the bf16 ring itself — NO separate write launch.
            # The DRIVER owns flushing full rings into the int8 cache
            # (models.decode_loop groups steps by 8); calling forward()
            # per-step without flushing SILENTLY DROPS tokens once pos
            # crosses a multiple of 8.
            import dataclasses as _dc

            from ..ops.pallas_attention import decode_attention_ring

            pos_b = jnp.broadcast_to(jnp.asarray(pos), (B,)).astype(jnp.int32)
            attn, rk2, rv2 = decode_attention_ring(
                q[:, 0],
                k[:, 0],
                v[:, 0],
                cache.k,
                cache.v,
                cache.k_scale,
                cache.v_scale,
                cache.ring_k,
                cache.ring_v,
                pos_b,
                layer_idx,
            )
            attn = attn[:, None].astype(h.dtype)
            cache = _dc.replace(cache, ring_k=rk2, ring_v=rv2)
        elif (
            can_kernel
            and cache.max_seq % 8 == 0  # 8-row aligned write windows
            and _os.environ.get("QLLM_TPU_FUSED_KV", "1") != "0"
        ):
            # pallas write kernel: quantize+insert the token via
            # buffer-aliased window writes — no XLA-side cache mutation
            # (cache.update's dynamic_update_slices made the scan
            # double-buffer the whole cache, ~0.5 ms/token on 7B)
            import dataclasses as _dc

            from ..ops.pallas_attention import (
                decode_attention_pallas,
                kv_cache_write_pallas,
            )

            pos_b = jnp.broadcast_to(jnp.asarray(pos), (B,)).astype(jnp.int32)
            k2, v2, ks2, vs2 = kv_cache_write_pallas(
                k[:, 0],
                v[:, 0],
                cache.k,
                cache.v,
                cache.k_scale,
                cache.v_scale,
                layer_idx,
                pos_b,
            )
            cache = _dc.replace(
                cache, k=k2, v=v2, k_scale=ks2, v_scale=vs2
            )
            lengths = pos_b + 1
            attn = decode_attention_pallas(
                q[:, 0],
                cache.k,
                cache.v,
                cache.k_scale,
                cache.v_scale,
                lengths,
                layer=layer_idx,
                softcap=cfg.attn_logit_softcap,
                alibi_slopes=al_slopes,
                window=win,
            )[:, None].astype(h.dtype)
        elif can_kernel:
            cache = cache.update(layer_idx, k, v, pos)
            from ..ops.pallas_attention import decode_attention_pallas

            lengths = jnp.broadcast_to(jnp.asarray(pos) + 1, (B,)).astype(
                jnp.int32
            )
            # pass the WHOLE [L]-cache; the kernel's index maps select
            # the layer (slicing here would copy the layer's K/V per
            # step — a round-1 profiled hot spot)
            attn = decode_attention_pallas(
                q[:, 0],
                cache.k,
                cache.v,
                cache.k_scale,
                cache.v_scale,
                lengths,
                layer=layer_idx,
                softcap=cfg.attn_logit_softcap,
                alibi_slopes=al_slopes,
                window=win,
            )[:, None].astype(h.dtype)
        else:
            if cache.ring_k is not None and T == 1:
                raise NotImplementedError(
                    "ring-fused cache decode needs the Pallas kernel path "
                    "(T==1, quantized cache, non-alibi, pallas enabled) — "
                    "mixing it with the XLA write path would corrupt the "
                    "cache; create the cache with ring=False here"
                )
            cache = cache.update(layer_idx, k, v, pos)
            if _flash_prefill_ok(cfg, T, hd) and cache.quantized:
                # chunked-admission/cached prefill reads the INT8 cache
                # tensors directly (cache-native layout): half the KV
                # bytes in-kernel and none of layer_kv's dequant +
                # double-transpose XLA glue
                from ..ops.pallas_attention import prefill_attention_flash

                kr, vr, ks, vs = cache.layer_kv_raw(layer_idx)
                attn = prefill_attention_flash(
                    q,
                    kr,
                    vr,
                    0 if pos is None else pos,
                    cfg.n_rep,
                    softcap=cfg.attn_logit_softcap,
                    window=_prefill_window(cfg, layer_idx, kr.shape[2]),
                    kv_native=True,
                    kv_scales=(ks, vs),
                    out_dtype=h.dtype,
                ).astype(h.dtype)
                return _finish_block(
                    pv, cfg, h, x, attn.reshape(B, T, H * hd), cache
                )
            k_all, v_all = cache.layer_kv(layer_idx, dtype=h.dtype)
            if _flash_prefill_ok(cfg, T, hd):
                from ..ops.pallas_attention import prefill_attention_flash

                attn = prefill_attention_flash(
                    q,
                    k_all,
                    v_all,
                    0 if pos is None else pos,
                    cfg.n_rep,
                    softcap=cfg.attn_logit_softcap,
                    window=_prefill_window(cfg, layer_idx, k_all.shape[1]),
                    out_dtype=h.dtype,
                ).astype(h.dtype)
            else:
                attn = _attention(
                    q, k_all, v_all, mask, cfg.n_rep, cfg.attn_logit_softcap
                )
    elif _flash_prefill_ok(cfg, T, hd):
        from ..ops.pallas_attention import prefill_attention_flash

        attn = prefill_attention_flash(
            q,
            k,
            v,
            0 if pos is None else pos,
            cfg.n_rep,
            softcap=cfg.attn_logit_softcap,
            window=_prefill_window(cfg, layer_idx, k.shape[1]),
            out_dtype=h.dtype,
        ).astype(h.dtype)
    else:
        attn = _attention(q, k, v, mask, cfg.n_rep, cfg.attn_logit_softcap)

    return _finish_block(pv, cfg, h, x, attn.reshape(B, T, H * hd), cache)


def _finish_block(
    pv, cfg: ModelConfig, h, x, attn_flat, cache
) -> Tuple[jax.Array, Optional[QuantizedKVCache]]:
    """o_proj -> residual -> MLP tail shared by the MHA and MLA paths.
    ``x`` is the input-norm output (reused when shared_input_norm)."""
    attn_out = pv.apply("o_proj", attn_flat)
    if cfg.post_norms:
        attn_out = apply_norm(
            cfg, attn_out, pv.get("post_attn_norm"), pv.get("post_attn_norm_bias")
        )
    rm = cfg.residual_multiplier

    def _res(a):
        return a if rm == 1.0 else a * jnp.asarray(rm, a.dtype)

    if cfg.parallel_residual:
        if cfg.shared_input_norm:
            x2 = x
        else:
            x2 = _norm_input(pv, cfg, h, "post_attention_layernorm")
        mlp_out = _mlp_from_view(pv, cfg, x2)
        h = h + _res(attn_out) + _res(mlp_out)
    else:
        h = h + _res(attn_out)
        x2 = _norm_input(pv, cfg, h, "post_attention_layernorm")
        mlp_out = _mlp_from_view(pv, cfg, x2)
        if cfg.post_norms:
            mlp_out = apply_norm(
                cfg,
                mlp_out,
                pv.get("post_mlp_norm"),
                pv.get("post_mlp_norm_bias"),
            )
        h = h + _res(mlp_out)
    return h, cache


def _mla_projections(pv, cfg: ModelConfig, x: jax.Array, cos, sin):
    """MLA q/k/v from the input-norm output ``x`` (HF eager semantics,
    transformers modeling_deepseek_v2.DeepseekV2Attention.forward):
      q  = q_b(rmsnorm(q_a(x)))  (or plain q_proj when q_lora_rank==0)
      kv = kv_b(rmsnorm(c_kv)), [c_kv | k_pe] = kv_a_proj_with_mqa(x)
      rope on the (q_pe, k_pe) tails only, interleaved-pair ("gptj")
      rotation; the single k_pe head broadcasts across all heads.
    Returns q/k [B,T,H,dn+dr] and v [B,T,H,dn+dr] zero-padded from
    v_head_dim so k and v share the cache/attention plumbing."""
    B, T, _ = x.shape
    H = cfg.num_attention_heads
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    qk_hd = dn + dr
    if cfg.q_lora_rank:
        qa = pv.apply("q_a_proj", x)
        qa = rms_norm(qa, pv.get("q_a_layernorm"), cfg.rms_norm_eps)
        q = pv.apply("q_b_proj", qa)
    else:
        q = pv.apply("q_proj", x)
    q = q.reshape(B, T, H, qk_hd)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    ckv = pv.apply("kv_a_proj_with_mqa", x)
    c_kv, k_pe = ckv[..., : cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank :]
    kv = pv.apply(
        "kv_b_proj", rms_norm(c_kv, pv.get("kv_a_layernorm"), cfg.rms_norm_eps)
    ).reshape(B, T, H, dn + dv)
    k_nope, v = kv[..., :dn], kv[..., dn:]
    q_pe, k_pe = apply_rope(q_pe, k_pe[:, :, None, :], cos, sin, "gptj", 0)
    q = jnp.concatenate([q_nope, q_pe], axis=-1)
    k = jnp.concatenate(
        [k_nope, jnp.broadcast_to(k_pe, (B, T, H, dr))], axis=-1
    )
    v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, qk_hd - dv)))
    return q, k, v


def _mla_attention(
    pv, cfg: ModelConfig, x, cos, sin, mask, cache, layer_idx, pos
) -> Tuple[jax.Array, Optional[QuantizedKVCache]]:
    """Multi-head latent attention (deepseek-v2). Runs the XLA attention
    path (the fused decode kernels require hd%128==0 uniform k/v head
    widths; MLA's 192/128 split is served by XLA — a dedicated
    latent-cache Pallas kernel is a later optimization)."""
    B, T, _ = x.shape
    dv = cfg.v_head_dim
    q, k, v = _mla_projections(pv, cfg, x, cos, sin)
    if cache is not None:
        if cache.ring_k is not None:
            raise NotImplementedError(
                "MLA decode uses the XLA cache path; create the cache "
                "with ring=False"
            )
        cache = cache.update(layer_idx, k, v, pos)
        k_all, v_all = cache.layer_kv(layer_idx, dtype=x.dtype)
    else:
        k_all, v_all = k, v
    attn = _attention(q, k_all, v_all, mask, 1)[..., :dv]
    return attn.reshape(B, T, cfg.num_attention_heads * dv), cache


def _mlp_from_view(pv, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    if pv.get("experts") is not None or pv.get("experts_stacked") is not None:
        x = _mat(x)  # router/shared paths consume the raw activation
        out = _moe_forward(pv, cfg, x)
        se = pv.get("shared_experts")
        if se is not None:
            # deepseek shared experts: always-on gated MLP added to the
            # routed output (modeling_deepseek_v2.DeepseekV2MoE.forward)
            gate = pv.apply_shared("gate_proj", x)
            up = pv.apply_shared("up_proj", x)
            seo = pv.apply_shared(
                "down_proj", act_fn(cfg.hidden_act, gate) * up
            )
            sg = pv.get("shared_expert_gate")
            if sg is not None:
                # qwen2-moe: the shared expert's output is gated by a
                # sigmoid of a [D, 1] linear on the block input
                # (Qwen2MoeSparseMoeBlock.forward shared_expert_gate)
                seo = seo * jax.nn.sigmoid(
                    jnp.dot(x.astype(jnp.float32), sg.astype(jnp.float32))
                ).astype(seo.dtype)
            out = out + seo
        return out
    if cfg.mlp_type == "gated":
        gate = pv.apply("gate_proj", x)
        up = pv.apply("up_proj", x)
        return pv.apply("down_proj", act_fn(cfg.hidden_act, gate) * up)
    up = act_fn(cfg.hidden_act, pv.apply("up_proj", x))  # fc1 + act
    asc = pv.get("down_proj_act_scale")
    if asc is not None:
        # AWQ ScaledActivation divider (quant/awq.py act-kind group)
        up = up / asc.astype(up.dtype)
    return pv.apply("down_proj", up)  # fc2


def _layer_forward(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    h: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
    cache: Optional[QuantizedKVCache],
    layer_idx: int,
    pos: Optional[jax.Array],
) -> Tuple[jax.Array, Optional[QuantizedKVCache]]:
    return _block_attn_mlp(
        LayerView(lp), cfg, h, cos, sin, mask, cache, layer_idx, pos
    )


def _routing_topk(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """lax.top_k semantics (descending values, ties -> lowest index),
    optionally via k unrolled argmax+mask passes (QLLM_TPU_TOPK_ITER=1).

    MEASURED NEGATIVE on-chip and off by default: the unrolled argmax
    reduces do NOT fuse under the layer scan — 8 extra launches/layer
    took qwen3-moe decode from ~1950 to ~1300 tok/s, far worse than
    the single 18.7 us/token sort that lax.top_k lowers to. Kept as an
    A/B lever only."""
    import os as _os

    E = x.shape[-1]
    if k > 8 or E > 512 or _os.environ.get("QLLM_TPU_TOPK_ITER", "0") != "1":
        return jax.lax.top_k(x, k)
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    vals, ids = [], []
    cur = x
    for _ in range(k):
        i = jnp.argmax(cur, axis=-1)  # ties -> lowest index, like top_k
        v = jnp.max(cur, axis=-1)
        vals.append(v)
        ids.append(i)
        cur = jnp.where(idx == i[..., None], -jnp.inf, cur)
    return jnp.stack(vals, axis=-1), jnp.stack(ids, axis=-1)


def _router_topk(
    pv, cfg: ModelConfig, x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Top-k expert routing: ([B, T, k] weights, [B, T, k] expert ids).
    ``pv`` is a LayerView-like accessor (or a raw layer dict).

    mixtral: top-k of the logits, softmax over the selected k
    (HF MixtralSparseMoeBlock). deepseek: softmax over ALL experts,
    optional group-limited selection (top groups by per-group max score,
    others masked to 0), top-k, then * routed_scaling_factor — NO
    renormalization (HF DeepseekV2MoEGate.forward)."""
    if isinstance(pv, dict):
        pv = LayerView(pv)
    router = pv.get("router")
    router_logits = jnp.dot(
        x.astype(jnp.float32), router.astype(jnp.float32)
    )  # [B, T, E]
    E = router.shape[-1]
    k = min(cfg.num_experts_per_tok, E)
    if cfg.moe_router == "deepseek":
        scores = jax.nn.softmax(router_logits, axis=-1)
        if cfg.topk_method == "group_limited_greedy":
            G = cfg.n_group
            gs = scores.reshape(*scores.shape[:-1], G, E // G)
            gmax = jnp.max(gs, axis=-1)  # [B, T, G]
            _, gidx = _routing_topk(gmax, cfg.topk_group)
            gmask = jnp.sum(
                jax.nn.one_hot(gidx, G, dtype=scores.dtype), axis=-2
            )  # [B, T, G]
            scores = (gs * gmask[..., None]).reshape(scores.shape)
        top_w, top_ids = _routing_topk(scores, k)
        # HF DeepseekV2MoEGate renormalizes only when top_k > 1, but
        # Qwen2Moe/Qwen3Moe renormalize unconditionally — with k=1 that
        # sets the weight to 1.0 instead of the softmax probability.
        renorm = cfg.norm_topk_prob and (k > 1 or cfg.arch != "deepseek_v2")
        if renorm:
            # HF DeepseekV2MoEGate: normalized weights are NOT also
            # multiplied by routed_scaling_factor (else-branch only)
            top_w = top_w / (jnp.sum(top_w, axis=-1, keepdims=True) + 1e-20)
        else:
            top_w = top_w * jnp.float32(cfg.routed_scaling_factor)
    else:
        top_w, top_ids = _routing_topk(router_logits, k)
        top_w = jax.nn.softmax(top_w, axis=-1)  # HF: softmax over the top-k
    return top_w, top_ids


def _router_weights(
    pv, cfg: ModelConfig, x: jax.Array
) -> jax.Array:
    """Dense [B, T, E] expert combination weights (0 for unselected)."""
    if isinstance(pv, dict):
        pv = LayerView(pv)
    top_w, top_ids = _router_topk(pv, cfg, x)
    E = pv.get("router").shape[-1]
    return jnp.sum(
        jax.nn.one_hot(top_ids, E, dtype=jnp.float32) * top_w[..., None],
        axis=-2,
    )  # [B, T, E]


def _moe_forward(pv, cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """Top-k sparse MoE, mixtral and deepseek routing (reference supports
    Mixtral/deepseek-v2 via its GPTQ/AWQ tables,
    sequential_layes_gptq_config.py:70-101, get_deepseek_v2_layers).

    ``pv`` is a LayerView-like accessor; TP views override apply_expert
    (local shard matmul) and combine_moe (psum of row-sharded partials).

    Two paths, both exact:
    - decode/small-batch (B*T*k < E) over [E]-stacked experts
      (models.moe.stack_experts): read ONLY the top-k experts' weights,
      selected by a traced index the Pallas kernel consumes via scalar
      prefetch — the HF sparse block's token-gather done the TPU way.
    - prefill / large batch / unstacked params: experts run densely and
      are combined with the router's top-k weights (every expert is hit
      by some token anyway, and the dense loop is XLA-friendly)."""
    if isinstance(pv, dict):  # back-compat: accept a raw layer dict
        pv = LayerView(pv)
    est = pv.get("experts_stacked")
    B, T, D = x.shape
    E = pv.get("router").shape[-1]
    k = min(cfg.num_experts_per_tok, E)
    if est is not None and B * T * k < E:
        return _moe_sparse(pv, cfg, x, k)
    weights = _router_weights(pv, cfg, x)
    out = jnp.zeros_like(x, shape=x.shape).astype(jnp.float32)
    if est is not None:
        fused_gu = "gateup_proj" in est
        for e in range(E):
            if fused_gu:
                gu = pv.apply_expert("gateup_proj", e, x)
                ii = gu.shape[-1] // 2
                gate, up = gu[..., :ii], gu[..., ii:]
            else:
                gate = pv.apply_expert("gate_proj", e, x)
                up = pv.apply_expert("up_proj", e, x)
            ye = pv.apply_expert(
                "down_proj", e, act_fn(cfg.hidden_act, gate) * up
            )
            out = out + ye.astype(jnp.float32) * weights[..., e : e + 1]
        return pv.combine_moe(out).astype(x.dtype)
    for e, ep in enumerate(pv.get("experts")):
        gate = apply_linear(ep["gate_proj"], x)
        up = apply_linear(ep["up_proj"], x)
        ye = apply_linear(
            ep["down_proj"], act_fn(cfg.hidden_act, gate) * up
        )
        out = out + ye.astype(jnp.float32) * weights[..., e : e + 1]
    return out.astype(x.dtype)


def _moe_sparse(pv, cfg: ModelConfig, x: jax.Array, k: int) -> jax.Array:
    """Top-k-only expert evaluation over [E]-stacked weights: the
    kernel reads k experts' bytes per token from HBM instead of E
    (E/k-times less decode weight traffic; 4x on Mixtral E=8 k=2).
    All S*k (token, expert) selections run as THREE grouped-kernel
    launches per MoE block (gate/up/down) — per-selection expert
    indices ride scalar prefetch into the weight index maps
    (ops.pallas_qmm.qmatmul_grouped_experts), so launch count does not
    scale with batch, k, or E. The caller guarantees B*T*k < E.

    Selections are SORTED by expert id before the kernel: the grouped
    kernel iterates selections along the minor grid dim, and Pallas
    skips the weight-block copy when consecutive grid steps map to the
    same block — so duplicate selections of one expert (batched decode:
    B*k selections over E experts) stream that expert's bytes ONCE, not
    once per selection. Weight traffic becomes unique-experts-touched,
    the same dedup HF's batched sparse block gets from its token
    gather, with no dynamic shapes."""
    B, T, D = x.shape
    S = B * T
    top_w, top_ids = _router_topk(pv, cfg, x)  # [B, T, k] each
    xf = x.reshape(S, D)
    wf = top_w.reshape(S, k)
    ids_u = top_ids.reshape(S * k)
    import os as _os

    # B=1: top-k ids are distinct by construction — no dedup. The env
    # gate exists for A/B measurement of the sort's weight-stream dedup
    # (tools/ab_moe_dedup.py, bench batched-MoE detail), not for serving
    if S > 1 and _os.environ.get("QLLM_TPU_MOE_SORT", "1") != "0":
        order = jnp.argsort(ids_u)  # stable: ties keep selection order
        ids = jnp.take(ids_u, order)
        x_rows = jnp.take(xf, order // k, axis=0)  # row s -> k selections
    else:
        order = None
        ids = ids_u
        x_rows = jnp.repeat(xf, k, axis=0)
    ye_s = None
    if order is None:
        # B=1: the whole expert MLP in ONE fused launch (gateup ->
        # act -> down; ops.pallas_qmm.qmatmul_grouped_experts_fused)
        # when the stacks qualify — batched decode keeps the sorted
        # 2-launch path (the fused kernel's per-selection phase walk
        # would forfeit the same-expert weight-stream dedup)
        fused = getattr(pv, "fused_expert_mlp", None)
        if fused is not None:
            ye_s = fused(ids, x_rows, cfg)
    if ye_s is None:
        # B=1 (order None): the k selections all read the SAME
        # activation row — the grouped kernel takes one shared x block
        xs = order is None
        if pv.get("experts_stacked") is not None and "gateup_proj" in pv.get(
            "experts_stacked"
        ):
            gu = pv.apply_experts_grouped(
                "gateup_proj", ids, x_rows, x_shared=xs
            )
            ii = gu.shape[-1] // 2
            gate, up = gu[..., :ii], gu[..., ii:]
        else:
            gate = pv.apply_experts_grouped(
                "gate_proj", ids, x_rows, x_shared=xs
            )
            up = pv.apply_experts_grouped(
                "up_proj", ids, x_rows, x_shared=xs
            )
        ye_s = pv.apply_experts_grouped(
            "down_proj", ids, act_fn(cfg.hidden_act, gate) * up
        )  # [S*k, D] in sorted order
    if order is not None:
        # undo the sort: scatter-built inverse permutation (one scatter
        # instead of a second full argsort in the per-step XLA glue)
        inv = jnp.zeros_like(order).at[order].set(jnp.arange(order.size))
        ye = jnp.take(ye_s, inv, axis=0)
    else:
        ye = ye_s
    out = jnp.sum(
        ye.reshape(S, k, D).astype(jnp.float32)
        * wf[..., None].astype(jnp.float32),
        axis=1,
    )
    return pv.combine_moe(out).reshape(B, T, D).astype(x.dtype)


def _mlp_forward(lp: Dict[str, Any], cfg: ModelConfig, x: jax.Array) -> jax.Array:
    """Back-compat helper: dense or MoE MLP on a per-layer dict."""
    return _mlp_from_view(LayerView(lp), cfg, x)


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
    Must stay in lock-step with ``_block_attn_mlp``."""
    B, T, D = h.shape
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    pv = LayerView(lp)
    x1 = apply_norm(
        cfg, h, pv.get("input_layernorm"), pv.get("input_layernorm_bias")
    )
    if cfg.attn_type == "mla":
        return _mla_intermediates(lp, cfg, h, x1, cos, sin, mask)
    q = pv.apply("q_proj", x1).reshape(B, T, H, hd)
    k = pv.apply("k_proj", x1).reshape(B, T, Hkv, hd)
    v = pv.apply("v_proj", x1).reshape(B, T, Hkv, hd)
    if cfg.qk_norm:
        q = qk_head_norm(q, pv.get("q_norm"), cfg.rms_norm_eps, cfg.qk_norm)
        k = qk_head_norm(k, pv.get("k_norm"), cfg.rms_norm_eps, cfg.qk_norm)
    if cfg.pos_embedding == "rope":
        q, k = apply_rope(q, k, cos, sin, cfg.rope_style, cfg.rotary_dim)
    if cfg.attn_scale:
        q = q * jnp.asarray(cfg.attn_scale * hd**0.5, q.dtype)
    attn = _attention(
        q, k, v, mask, cfg.n_rep, cfg.attn_logit_softcap
    ).reshape(B, T, H * hd)
    out = {
        "q_proj": x1,
        "k_proj": x1,
        "v_proj": x1,
        "o_proj": attn,
    }
    if cfg.parallel_residual:
        x2 = (
            x1
            if cfg.shared_input_norm
            else apply_norm(
                cfg,
                h,
                pv.get("post_attention_layernorm"),
                pv.get("post_attention_layernorm_bias"),
            )
        )
    else:
        attn_out = pv.apply("o_proj", attn)
        if cfg.post_norms:
            attn_out = apply_norm(
                cfg,
                attn_out,
                pv.get("post_attn_norm"),
                pv.get("post_attn_norm_bias"),
            )
        if cfg.residual_multiplier != 1.0:
            attn_out = attn_out * jnp.asarray(
                cfg.residual_multiplier, attn_out.dtype
            )
        h2 = h + attn_out
        x2 = apply_norm(
            cfg,
            h2,
            pv.get("post_attention_layernorm"),
            pv.get("post_attention_layernorm_bias"),
        )
    out.update(_mlp_intermediates(lp, cfg, x2))
    return out


def _mlp_intermediates(
    lp: Dict[str, Any], cfg: ModelConfig, x2: jax.Array
) -> Dict[str, jax.Array]:
    """MLP-part calibration inputs (dense, MoE, shared experts)."""
    pv = LayerView(lp)
    out: Dict[str, jax.Array] = {}
    if "experts" in lp:
        # MoE: per-expert inputs weighted by the router (sqrt weight so
        # the Hessian XᵀX carries the routing probability) — the
        # calibration analog of the reference's hook-captured routed
        # inputs for Mixtral (sequential_layes_gptq_config.py:70-101)
        out["experts_input"] = x2  # unweighted (AWQ scale search)
        weights = _router_weights(lp, cfg, x2)
        for e, ep in enumerate(lp["experts"]):
            wsq = jnp.sqrt(weights[..., e : e + 1]).astype(x2.dtype)
            xe = x2 * wsq
            gate = apply_linear(ep["gate_proj"], x2)
            up = apply_linear(ep["up_proj"], x2)
            out[f"experts.{e}.gate_proj"] = xe
            out[f"experts.{e}.up_proj"] = xe
            out[f"experts.{e}.down_proj"] = (jax.nn.silu(gate) * up) * wsq
        se = lp.get("shared_experts")
        if se is not None:
            gate = apply_linear(se["gate_proj"], x2)
            up = apply_linear(se["up_proj"], x2)
            out["shared_experts.gate_proj"] = x2
            out["shared_experts.up_proj"] = x2
            out["shared_experts.down_proj"] = act_fn(cfg.hidden_act, gate) * up
    elif cfg.mlp_type == "gated":
        gate = pv.apply("gate_proj", x2)
        up = pv.apply("up_proj", x2)
        out["gate_proj"] = x2
        out["up_proj"] = x2
        out["down_proj"] = act_fn(cfg.hidden_act, gate) * up
    else:
        up = pv.apply("up_proj", x2)
        out["up_proj"] = x2
        dn = act_fn(cfg.hidden_act, up)
        asc = pv.get("down_proj_act_scale")
        if asc is not None:
            dn = dn / asc.astype(dn.dtype)
        out["down_proj"] = dn
    return out


def _mla_intermediates(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    h: jax.Array,
    x1: jax.Array,
    cos,
    sin,
    mask,
) -> Dict[str, jax.Array]:
    """layer_intermediates for an MLA (deepseek-v2) block — in lock-step
    with _mla_attention/_finish_block."""
    pv = LayerView(lp)
    out: Dict[str, jax.Array] = {"kv_a_proj_with_mqa": x1}
    if cfg.q_lora_rank:
        out["q_a_proj"] = x1
        qa = rms_norm(
            pv.apply("q_a_proj", x1), pv.get("q_a_layernorm"), cfg.rms_norm_eps
        )
        out["q_b_proj"] = qa
    else:
        out["q_proj"] = x1
    ckv = pv.apply("kv_a_proj_with_mqa", x1)
    out["kv_b_proj"] = rms_norm(
        ckv[..., : cfg.kv_lora_rank], pv.get("kv_a_layernorm"), cfg.rms_norm_eps
    )
    q, k, v = _mla_projections(pv, cfg, x1, cos, sin)
    attn = _attention(q, k, v, mask, 1)[..., : cfg.v_head_dim]
    attn_flat = attn.reshape(
        h.shape[0], h.shape[1], cfg.num_attention_heads * cfg.v_head_dim
    )
    out["o_proj"] = attn_flat
    h2 = h + pv.apply("o_proj", attn_flat)
    x2 = apply_norm(
        cfg,
        h2,
        pv.get("post_attention_layernorm"),
        pv.get("post_attention_layernorm_bias"),
    )
    out.update(_mlp_intermediates(lp, cfg, x2))
    return out


def embed_tokens_forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,
    positions: jax.Array,
) -> jax.Array:
    """Token ids + positions -> first block's hidden input, covering
    learned positions (opt/gpt2), bloom's embedding layernorm, and
    gemma's sqrt(D) multiplier."""
    # mode="clip": out-of-range ids clamp instead of jnp.take's default
    # NaN fill (defensive; calibration/generation ids should be in range)
    h = jnp.take(params["embed_tokens"], token_ids, axis=0, mode="clip")
    if cfg.embedding_multiplier != 1.0:
        # HF gemma casts the multiplier to the embedding dtype first
        h = h * jnp.asarray(cfg.embedding_multiplier, h.dtype)
    if cfg.pos_embedding == "learned":
        h = h + jnp.take(
            params["pos_embed"],
            positions + cfg.learned_pos_offset,
            axis=0,
            mode="clip",
        )
    if cfg.embed_layernorm:
        h = layer_norm(
            h,
            params["embed_layernorm"],
            params.get("embed_layernorm_bias"),
            cfg.rms_norm_eps,
        )
    return h


def final_logits(
    params: Dict[str, Any], cfg: ModelConfig, h: jax.Array
) -> jax.Array:
    h = apply_norm(cfg, h, params["norm"], params.get("norm_bias"))
    if cfg.tie_word_embeddings or "lm_head" not in params:
        logits = jnp.dot(
            h.astype(jnp.bfloat16),
            params["embed_tokens"].T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        logits = apply_linear(
            params["lm_head"], h, params.get("lm_head_bias")
        ).astype(jnp.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    if cfg.final_logit_softcap:
        cap = cfg.final_logit_softcap
        logits = cap * jnp.tanh(logits / cap)
    return logits.astype(jnp.float32)


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
        import os as _os

        if any(isinstance(v, list) for v in params["layers"].values()) or (
            "_moe_stride" in params["layers"]
            and _os.environ.get("QLLM_TPU_MOE_SCAN", "0") != "1"
        ):
            # hybrid MoE/MLA stacking (stack_layer_params_hybrid):
            # [L]-stacked attention + per-layer or full [L*E] expert
            # stacks, python-loop forward. The loop is the MoE serving
            # DEFAULT: measured 5.3% faster than the lax.scan body for
            # B=1 decode on the qwen3-moe slab (1938 vs 1836 tok/s —
            # scan's dynamic layer indexing costs ~29 us/token here);
            # QLLM_TPU_MOE_SCAN=1 opts into scan (one compiled layer
            # body — much faster compiles for many-layer models)
            from .stacked import forward_hybrid

            return forward_hybrid(params, cfg, token_ids, cache, pos)
        from .stacked import forward_stacked

        return forward_stacked(params, cfg, token_ids, cache, pos)

    B, T = token_ids.shape
    if cache is None:
        positions = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        mask = build_mask(cfg, B, T, T, None)
        mask_swa = (
            build_mask(cfg, B, T, T, None, window=cfg.sliding_window)
            if cfg.sliding_window > 0
            else mask
        )
    else:
        if pos is None:
            pos = jnp.int32(0)
        pos = jnp.asarray(pos)
        S = cache.max_seq
        if pos.ndim == 0:
            positions = pos + jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        else:
            positions = pos[:, None] + jnp.arange(T)[None, :]
        mask = build_mask(cfg, B, T, S, pos)
        mask_swa = (
            build_mask(cfg, B, T, S, pos, window=cfg.sliding_window)
            if cfg.sliding_window > 0
            else mask
        )

    h = embed_tokens_forward(params, cfg, token_ids, positions)
    if cfg.pos_embedding == "rope":
        cos, sin = _rope_cos_sin(
            positions, cfg.rot_dim, cfg.rope_theta, cfg.rope_style, cfg=cfg
        )
    else:
        cos = sin = None
    for i, lp in enumerate(params["layers"]):
        m = mask_swa if layer_uses_swa(cfg, i) else mask
        h, cache = _layer_forward(lp, cfg, h, cos, sin, m, cache, i, pos)

    return final_logits(params, cfg, h), cache


def iter_quantizable(params: Dict[str, Any]):
    """Yield (path, layer_idx, name, w) for every quantizable linear.

    The analog of reference find_layers (utils/modelutils.py:17-23).
    """
    for i, lp in enumerate(params["layers"]):
        for name in ALL_LINEAR_NAMES:
            if name in lp:
                yield (f"model.layers.{i}.{_hf_name(name)}", i, name, lp[name])


def _hf_name(name: str) -> str:
    if name in ("q_proj", "k_proj", "v_proj", "o_proj") + MLA_LINEAR_NAMES:
        return f"self_attn.{name}"
    return f"mlp.{name}"
