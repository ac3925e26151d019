"""Pure-numpy reference forward: the cross-engine oracle.

The reference verifies exports across ENGINES (torch vs onnxruntime,
utils/onnx/exporter.py:68-128). The StableHLO artifacts here would
otherwise only be compared against the same live XLA program — this
module provides the independent numerics: dequantization, norms, rope,
attention, MLP and logits implemented in float32 numpy with no JAX in
the compute path. export.exporter.verify_correctness checks the
deserialized artifact's prefill logits against it.

Coverage: the llama shape family (rope neox/gptj, rms/layer norm,
gated/plain MLP, GQA, sequential residual). Unsupported configs raise
NotImplementedError and the caller degrades to the serialization-only
check with a warning.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..quant.qtensor import QuantizedTensor

__all__ = ["np_dequantize", "np_forward_logits"]


def np_dequantize(qt: QuantizedTensor) -> np.ndarray:
    """Packed -> float32 [K, N], pure numpy (mirrors quant.qtensor
    unpack_rows + group dequant, independent of JAX)."""
    K, N = qt.in_features, qt.out_features
    packed = np.asarray(qt.qweight).astype(np.uint32)
    bits = qt.bits
    if bits in (2, 4, 8):
        pf = 32 // bits
        mask = np.uint32((1 << bits) - 1)
        shifts = (np.arange(pf, dtype=np.uint32) * bits)[None, :, None]
        q = ((packed[:, None, :] >> shifts) & mask).reshape(-1, packed.shape[-1])
        q = q[:K]
    else:
        wpp = K // 32
        q = np.zeros((K, packed.shape[-1]), np.uint32)
        shifts = np.arange(32, dtype=np.uint32)[None, :, None]
        for b in range(bits):
            plane = packed[b * wpp : (b + 1) * wpp]
            bitv = ((plane[:, None, :] >> shifts) & np.uint32(1)).reshape(
                K, -1
            )
            q |= bitv << np.uint32(b)
    q = q[:, :N].astype(np.float32)
    scales = np.asarray(qt.scales, np.float32)[:, :N]
    zeros = np.asarray(qt.zeros, np.float32)[:, :N]
    if qt.zeros_prefolded:
        zeros = zeros / scales
    g = qt.effective_group_size
    gi = np.arange(K) // g
    w = (q - zeros[gi]) * scales[gi]
    if qt.perm is not None:
        out = np.empty_like(w)
        out[np.asarray(qt.perm)] = w
        w = out
    return w


def _w(x) -> np.ndarray:
    if isinstance(x, QuantizedTensor):
        if x.planar:
            raise NotImplementedError("planar runtime layout in numpy ref")
        return np_dequantize(x)
    return np.asarray(x, np.float32)


def _norm(cfg, x, weight, bias):
    wt = np.asarray(weight, np.float32)
    if cfg.norm_type == "layernorm":
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        y = (x - mu) / np.sqrt(var + cfg.rms_norm_eps) * wt
        if bias is not None:
            y = y + np.asarray(bias, np.float32)
        return y
    var = (x * x).mean(-1, keepdims=True)
    xn = x / np.sqrt(var + cfg.rms_norm_eps)
    if cfg.norm_type == "rmsnorm_plus1":
        return xn * (1.0 + wt)
    return xn * wt


def _act(name: str, x: np.ndarray) -> np.ndarray:
    if name == "silu":
        return x / (1.0 + np.exp(-x))
    if name in ("gelu", "gelu_python", "gelu_new", "gelu_pytorch_tanh"):
        return (
            0.5
            * x
            * (1.0 + np.tanh(0.7978845608028654 * (x + 0.044715 * x**3)))
        )
    if name == "relu":
        return np.maximum(x, 0.0)
    raise NotImplementedError(f"act {name}")


def _qk_head_norm(x, weight, eps, kind):
    """Per-head q/k norm (mirrors models.llama.qk_head_norm): cohere =
    per-head layernorm [H, hd]; rms = shared [hd] RMSNorm (qwen3)."""
    w = np.asarray(weight, np.float32)
    if kind == "rms":
        var = (x * x).mean(-1, keepdims=True)
        return x / np.sqrt(var + eps) * w
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w[None, None]


def _rope(q, k, positions, cfg):
    from ..models.llama import rope_inv_freq_mscale

    hd = q.shape[-1]
    rd = cfg.rotary_dim or hd
    inv, msc = rope_inv_freq_mscale(cfg)
    ang = positions[..., None].astype(np.float32) * inv  # [B, T, rd/2]
    cos, sin = np.cos(ang) * msc, np.sin(ang) * msc

    def rot(x):
        xr, xp = x[..., :rd], x[..., rd:]
        if cfg.rope_style == "gptj":
            x1, x2 = xr[..., 0::2], xr[..., 1::2]
            r1 = x1 * cos[:, :, None] - x2 * sin[:, :, None]
            r2 = x2 * cos[:, :, None] + x1 * sin[:, :, None]
            out = np.stack([r1, r2], axis=-1).reshape(xr.shape)
        else:  # neox rotate-half
            half = rd // 2
            x1, x2 = xr[..., :half], xr[..., half:]
            c = np.concatenate([cos, cos], -1)[:, :, None]
            s = np.concatenate([sin, sin], -1)[:, :, None]
            out = xr * c + np.concatenate([-x2, x1], -1) * s
        return np.concatenate([out, xp], -1)

    return rot(q), rot(k)


def _alibi_bias(cfg, T: int) -> np.ndarray:
    """[H, 1, T] additive score bias: slopes * key-index (the absolute
    form; softmax shift-invariance makes it equal to the relative one —
    same construction as models.llama.build_mask)."""
    from ..models.llama import alibi_slopes

    sl = np.asarray(
        alibi_slopes(cfg.num_attention_heads, cfg.alibi_style), np.float32
    )
    return sl[:, None, None] * np.arange(T, dtype=np.float32)[None, None, :]


def _np_moe(cfg, lp, x2: np.ndarray) -> np.ndarray:
    """Sparse MoE block (mixtral + deepseek routing, shared experts,
    qwen2-moe sigmoid shared gate) — mirrors models.llama._moe_forward
    in pure numpy."""
    rl = x2 @ np.asarray(lp["router"], np.float32)  # [B, T, E]
    E = rl.shape[-1]
    k = min(cfg.num_experts_per_tok, E)
    if cfg.moe_router == "deepseek":
        sc = np.exp(rl - rl.max(-1, keepdims=True))
        sc = sc / sc.sum(-1, keepdims=True)
        if cfg.topk_method == "group_limited_greedy":
            G = cfg.n_group
            gs = sc.reshape(*sc.shape[:-1], G, E // G)
            gmax = gs.max(-1)  # [B, T, G]
            gsel = np.argsort(-gmax, -1, kind="stable")[..., : cfg.topk_group]
            gmask = np.zeros_like(gmax)
            np.put_along_axis(gmask, gsel, 1.0, -1)
            sc = (gs * gmask[..., None]).reshape(sc.shape)
        idx = np.argsort(-sc, axis=-1, kind="stable")[..., :k]
        vals = np.take_along_axis(sc, idx, -1)
        renorm = cfg.norm_topk_prob and (k > 1 or cfg.arch != "deepseek_v2")
        if renorm:
            vals = vals / (vals.sum(-1, keepdims=True) + 1e-20)
        else:
            vals = vals * np.float32(cfg.routed_scaling_factor)
    else:
        idx = np.argsort(-rl, axis=-1, kind="stable")[..., :k]
        vals = np.take_along_axis(rl, idx, -1)
        vals = np.exp(vals - vals.max(-1, keepdims=True))
        vals = vals / vals.sum(-1, keepdims=True)
    weights = np.zeros_like(rl)
    np.put_along_axis(weights, idx, vals, -1)

    out = np.zeros_like(x2)
    for e, ep in enumerate(lp["experts"]):
        gate = _act(cfg.hidden_act, x2 @ _w(ep["gate_proj"]))
        up = x2 @ _w(ep["up_proj"])
        out = out + ((gate * up) @ _w(ep["down_proj"])) * weights[..., e:e + 1]
    se = lp.get("shared_experts")
    if se is not None:
        gate = _act(cfg.hidden_act, x2 @ _w(se["gate_proj"]))
        seo = (gate * (x2 @ _w(se["up_proj"]))) @ _w(se["down_proj"])
        sg = lp.get("shared_expert_gate")
        if sg is not None:
            seo = seo / (1.0 + np.exp(-(x2 @ np.asarray(sg, np.float32))))
        out = out + seo
    return out


def _np_mla(cfg, lp, x1: np.ndarray, positions, causal) -> np.ndarray:
    """Multi-head latent attention (deepseek-v2) — mirrors
    models.llama._mla_projections/_mla_attention."""
    B, T, _ = x1.shape
    H = cfg.num_attention_heads
    dn, dr, dv = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    qk_hd = dn + dr
    if cfg.q_lora_rank:
        qa = x1 @ _w(lp["q_a_proj"])
        qa = _norm(cfg, qa, lp["q_a_layernorm"], None)
        q = qa @ _w(lp["q_b_proj"])
    else:
        q = x1 @ _w(lp["q_proj"])
    q = q.reshape(B, T, H, qk_hd)
    q_nope, q_pe = q[..., :dn], q[..., dn:]
    ckv = x1 @ _w(lp["kv_a_proj_with_mqa"])
    c_kv, k_pe = ckv[..., : cfg.kv_lora_rank], ckv[..., cfg.kv_lora_rank:]
    kv = (
        _norm(cfg, c_kv, lp["kv_a_layernorm"], None) @ _w(lp["kv_b_proj"])
    ).reshape(B, T, H, dn + dv)
    k_nope, v = kv[..., :dn], kv[..., dn:]
    q_pe, k_pe = _rope(q_pe, k_pe[:, :, None, :], positions, cfg)
    q = np.concatenate([q_nope, q_pe], -1)
    k = np.concatenate(
        [k_nope, np.broadcast_to(k_pe, (B, T, H, dr))], -1
    )
    scores = (q.transpose(0, 2, 1, 3) @ k.transpose(0, 2, 3, 1)) / np.sqrt(
        qk_hd
    )
    scores = np.where(causal[None, None], scores, -np.inf)
    scores = scores - scores.max(-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(-1, keepdims=True)
    attn = (p @ v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
    return attn.reshape(B, T, H * dv)


def np_forward_logits(
    params: Dict[str, Any], cfg, token_ids: np.ndarray
) -> np.ndarray:
    """Causal full-sequence forward -> logits [B, T, V], f32 numpy."""
    if cfg.pos_embedding not in ("rope", "alibi", "learned"):
        raise NotImplementedError(f"pos_embedding {cfg.pos_embedding}")
    ids = np.asarray(token_ids)
    B, T = ids.shape
    H = cfg.num_attention_heads
    Hkv = cfg.num_key_value_heads
    hd = cfg.hd
    emb = np.asarray(params["embed_tokens"], np.float32)
    h = emb[ids]
    if cfg.embedding_multiplier != 1.0:
        h = h * cfg.embedding_multiplier
    if cfg.pos_embedding == "learned":
        pe = np.asarray(params["pos_embed"], np.float32)
        idx = np.clip(
            np.arange(T) + cfg.learned_pos_offset, 0, pe.shape[0] - 1
        )
        h = h + pe[idx][None]
    if cfg.embed_layernorm:
        h = _norm(
            cfg,
            h,
            params["embed_layernorm"],
            params.get("embed_layernorm_bias"),
        )
    positions = np.broadcast_to(np.arange(T)[None], (B, T))
    causal = np.tril(np.ones((T, T), bool))
    alibi = _alibi_bias(cfg, T) if cfg.pos_embedding == "alibi" else None
    for lp in params["layers"]:
        x1 = _norm(
            cfg, h, lp["input_layernorm"], lp.get("input_layernorm_bias")
        )
        if getattr(cfg, "attn_type", "mha") == "mla":
            attn = _np_mla(cfg, lp, x1, positions, causal)
        else:
            q = x1 @ _w(lp["q_proj"])
            k = x1 @ _w(lp["k_proj"])
            v = x1 @ _w(lp["v_proj"])
            for nm, arr in (("q_proj", q), ("k_proj", k), ("v_proj", v)):
                b = lp.get(f"{nm}_bias")
                if b is not None:
                    arr += np.asarray(b, np.float32)
            q = q.reshape(B, T, H, hd)
            k = k.reshape(B, T, Hkv, hd)
            v = v.reshape(B, T, Hkv, hd)
            if getattr(cfg, "qk_norm", ""):
                q = _qk_head_norm(
                    q, lp["q_norm"], cfg.rms_norm_eps, cfg.qk_norm
                )
                k = _qk_head_norm(
                    k, lp["k_norm"], cfg.rms_norm_eps, cfg.qk_norm
                )
            if cfg.pos_embedding == "rope":
                q, k = _rope(q, k, positions, cfg)
            if H != Hkv:
                rep = H // Hkv
                k = np.repeat(k, rep, axis=2)
                v = np.repeat(v, rep, axis=2)
            qT = q.transpose(0, 2, 1, 3)  # [B, H, T, hd]
            kT = k.transpose(0, 2, 3, 1)  # [B, H, hd, T]
            scores = (qT @ kT) / np.sqrt(hd)
            if alibi is not None:
                scores = scores + alibi[None]
            scores = np.where(causal[None, None], scores, -np.inf)
            scores = scores - scores.max(-1, keepdims=True)
            p = np.exp(scores)
            p /= p.sum(-1, keepdims=True)
            attn = (p @ v.transpose(0, 2, 1, 3)).transpose(0, 2, 1, 3)
            attn = attn.reshape(B, T, H * hd)
        o = attn @ _w(lp["o_proj"])
        if lp.get("o_proj_bias") is not None:
            o += np.asarray(lp["o_proj_bias"], np.float32)
        parallel = bool(getattr(cfg, "parallel_residual", False))
        if parallel:
            # h_out = h + attn(x1) + mlp(x2), x2 = x1 (shared norm,
            # gptj/falcon/cohere) or a second norm of the INPUT h (neox)
            x2 = (
                x1
                if cfg.shared_input_norm
                else _norm(
                    cfg,
                    h,
                    lp["post_attention_layernorm"],
                    lp.get("post_attention_layernorm_bias"),
                )
            )
            h = h + o
        else:
            h = h + o
            x2 = _norm(
                cfg,
                h,
                lp["post_attention_layernorm"],
                lp.get("post_attention_layernorm_bias"),
            )
        if "experts" in lp:
            h = h + _np_moe(cfg, lp, x2)
            continue
        if "gate_proj" in lp:
            gate = x2 @ _w(lp["gate_proj"])
            if lp.get("gate_proj_bias") is not None:
                gate += np.asarray(lp["gate_proj_bias"], np.float32)
            up = x2 @ _w(lp["up_proj"])
            if lp.get("up_proj_bias") is not None:
                up += np.asarray(lp["up_proj_bias"], np.float32)
            mlp = (_act(cfg.hidden_act, gate) * up) @ _w(lp["down_proj"])
        else:
            up = x2 @ _w(lp["up_proj"])
            if lp.get("up_proj_bias") is not None:
                up += np.asarray(lp["up_proj_bias"], np.float32)
            up = _act(cfg.hidden_act, up)
            asc = lp.get("down_proj_act_scale")
            if asc is not None:
                up = up / np.asarray(asc, np.float32)
            mlp = up @ _w(lp["down_proj"])
        if lp.get("down_proj_bias") is not None:
            mlp += np.asarray(lp["down_proj_bias"], np.float32)
        h = h + mlp
    h = _norm(cfg, h, params["norm"], params.get("norm_bias"))
    lm = params.get("lm_head")
    if cfg.tie_word_embeddings or lm is None:
        logits = h @ emb.T
    else:
        logits = h @ _w(lm)
        if params.get("lm_head_bias") is not None:
            logits += np.asarray(params["lm_head_bias"], np.float32)
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    return logits.astype(np.float32)
