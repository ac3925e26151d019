"""Stacked-layer execution: lax.scan over the transformer stack.

For homogeneous layer stacks (same shapes/bits every layer — the
common case), stacking per-layer params into leading-[L] pytrees and
scanning compiles ONE layer body instead of L unrolled copies: ~L×
faster compiles and a smaller executable, with identical numerics.

The scan iterates over LAYER INDICES, not over the stacked pytree:
profiling showed that scanning params as `xs` makes XLA dynamic-slice
(i.e. fully copy) each layer's packed weights every step — more HBM
traffic than the matmul kernel itself. Instead the quantized matmul
reads blocks straight out of the [L]-stacked buffers with the layer
index delivered by scalar prefetch (ops.pallas_qmm.qmatmul_pallas_stacked).

Heterogeneous (mixed-bit) models keep the python-loop path in
``forward``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..quant.qtensor import QuantizedTensor
from .llama import (
    ModelConfig,
    _attention,
    _pallas_attn_enabled,
    _rope_cos_sin,
    apply_linear,
    apply_rope,
    rms_norm,
)

__all__ = ["stack_layer_params", "forward_stacked", "is_stackable"]


def is_stackable(params: Dict[str, Any]) -> bool:
    """True when every layer has the same pytree structure and shapes."""
    layers = params["layers"]
    if not isinstance(layers, list) or len(layers) < 2:
        return False
    if "experts" in layers[0]:
        return False  # MoE layer bodies not yet scan-specialized
    ref = jax.tree_util.tree_structure(layers[0])
    ref_shapes = [x.shape for x in jax.tree_util.tree_leaves(layers[0])]
    for lp in layers[1:]:
        if jax.tree_util.tree_structure(lp) != ref:
            return False
        if [x.shape for x in jax.tree_util.tree_leaves(lp)] != ref_shapes:
            return False
    return True


def stack_layer_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Replace the per-layer list with one pytree of [L, ...] leaves.

    Quantized scales/zeros are converted to f32 ONCE here — per-call
    casting of a whole [L, G, N] stack inside the decode loop profiled
    at ~25% of token latency."""
    import dataclasses

    if not is_stackable(params):
        raise ValueError(
            "params are not stackable (heterogeneous layers or MoE); "
            "use the per-layer list path"
        )
    layers = params["layers"]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)

    def widen(node):
        if isinstance(node, QuantizedTensor):
            scales = node.scales.astype(jnp.float32)
            zeros = node.zeros.astype(jnp.float32)
            qweight = node.qweight
            # pad out-features to a 512 multiple so the kernel can use
            # wide lane blocks (profiled: bn=256 runs at ~60% of bn=512
            # streaming; e.g. llama N=11008 -> 11264). The logical width
            # stays in out_features; consumers slice.
            N = qweight.shape[-1]
            pad = (-N) % 512
            if pad:
                qweight = jnp.pad(qweight, ((0, 0), (0, 0), (0, pad)))
                scales = jnp.pad(
                    scales, ((0, 0), (0, 0), (0, pad)), constant_values=1.0
                )
                zeros = jnp.pad(zeros, ((0, 0), (0, 0), (0, pad)))
            # planar relayout (4-bit): bitcast-to-int8 becomes k-ordered
            # so the kernel consumes x without any transpose
            planar = False
            from ..ops.pallas_qmm import planar_bk
            from ..quant.qtensor import planarize_packed

            if (
                node.bits == 4
                and node.perm is None
                and planar_bk(node.in_features, node.effective_group_size)
                is not None
            ):
                qweight = jnp.stack(
                    [
                        planarize_packed(qweight[i], node.in_features)
                        for i in range(qweight.shape[0])
                    ]
                )
                planar = True
            return dataclasses.replace(
                node,
                qweight=qweight,
                scales=scales,
                zeros=zeros,
                planar=planar,
            )
        return node

    stacked = {
        k: widen(v) if isinstance(v, QuantizedTensor) else v
        for k, v in stacked.items()
    }
    out = dict(params)
    out["layers"] = stacked
    return out


def unstack_layer_params(params: Dict[str, Any], n_layers: int) -> Dict[str, Any]:
    """Inverse of stack_layer_params: per-layer list with the lane
    padding stripped (buffers match the logical out_features again)."""
    import dataclasses

    stacked = params["layers"]

    def slice_layer(i):
        lp = {}
        for k, v in stacked.items():
            if isinstance(v, QuantizedTensor):
                N = v.out_features
                qw = v.qweight[i]
                if v.planar:
                    from ..quant.qtensor import unplanarize_packed

                    qw = unplanarize_packed(qw, v.in_features)
                lp[k] = dataclasses.replace(
                    v,
                    qweight=qw[:, :N],
                    scales=v.scales[i, :, :N],
                    zeros=v.zeros[i, :, :N],
                    perm=None if v.perm is None else v.perm[i],
                    planar=False,
                )
            else:
                lp[k] = v[i]
        return lp

    out = dict(params)
    out["layers"] = [slice_layer(i) for i in range(n_layers)]
    return out


def _apply_stacked(w, x, l, bias=None):
    """x @ stack[l] for a stacked linear leaf."""
    if isinstance(w, QuantizedTensor):
        from ..ops.pallas_qmm import qmatmul_pallas_stacked

        y = qmatmul_pallas_stacked(x, w, l)
        if bias is not None:
            y = y + bias
        return y
    y = jnp.dot(
        x.astype(jnp.bfloat16),
        w[l].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        y = y + bias
    return y


def _layer_forward_stacked(slp, cfg, h, cos, sin, mask, cache, l, pos):
    B, T, D = h.shape
    H, Hkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.hd
    x = rms_norm(h, slp["input_layernorm"][l], cfg.rms_norm_eps)
    qb = slp.get("q_proj_bias")
    kb = slp.get("k_proj_bias")
    vb = slp.get("v_proj_bias")
    q = _apply_stacked(slp["q_proj"], x, l, None if qb is None else qb[l])
    k = _apply_stacked(slp["k_proj"], x, l, None if kb is None else kb[l])
    v = _apply_stacked(slp["v_proj"], x, l, None if vb is None else vb[l])
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, Hkv, hd)
    v = v.reshape(B, T, Hkv, hd)
    q, k = apply_rope(q, k, cos, sin)

    cache = cache.update(l, k, v, pos)
    if T == 1 and cache.quantized and _pallas_attn_enabled():
        from ..ops.pallas_attention import decode_attention_pallas

        lengths = jnp.broadcast_to(jnp.asarray(pos) + 1, (B,)).astype(jnp.int32)
        # pass the WHOLE [L]-cache; the kernel's index maps select the
        # layer (slicing here would copy the layer's K/V every step)
        attn = decode_attention_pallas(
            q[:, 0],
            cache.k,
            cache.v,
            cache.k_scale,
            cache.v_scale,
            lengths,
            layer=l,
        )[:, None].astype(h.dtype)
    else:
        k_all, v_all = cache.layer_kv(l, dtype=h.dtype)
        attn = _attention(q, k_all, v_all, mask, cfg.n_rep)
    h = h + _apply_stacked(slp["o_proj"], attn.reshape(B, T, H * hd), l)

    x = rms_norm(h, slp["post_attention_layernorm"][l], cfg.rms_norm_eps)
    gate = _apply_stacked(slp["gate_proj"], x, l)
    up = _apply_stacked(slp["up_proj"], x, l)
    h = h + _apply_stacked(slp["down_proj"], jax.nn.silu(gate) * up, l)
    return h, cache


def forward_stacked(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,
    cache,
    pos,
):
    """Decode/prefill forward with lax.scan over layer indices.

    Semantics identical to models.llama.forward with a cache.
    """
    B, T = token_ids.shape
    h = jnp.take(params["embed_tokens"], token_ids, axis=0, mode="clip")
    pos = jnp.asarray(pos if pos is not None else 0)
    S = cache.max_seq
    if pos.ndim == 0:
        positions = pos + jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
        q_pos = pos + jnp.arange(T)[:, None]
        s_idx = jnp.arange(S)[None, :]
        mask = jnp.where(s_idx <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)
        mask = jnp.broadcast_to(mask.reshape(1, 1, T, S), (B, 1, T, S))
    else:
        positions = pos[:, None] + jnp.arange(T)[None, :]
        q_pos = pos[:, None, None, None] + jnp.arange(T)[None, None, :, None]
        s_idx = jnp.arange(S)[None, None, None, :]
        mask = jnp.where(s_idx <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)
        mask = jnp.broadcast_to(mask, (B, 1, T, S))
    cos, sin = _rope_cos_sin(positions, cfg.hd, cfg.rope_theta)

    slp = params["layers"]

    def body(carry, l):
        h, cache = carry
        h, cache = _layer_forward_stacked(
            slp, cfg, h, cos, sin, mask, cache, l, pos
        )
        return (h, cache), None

    (h, cache), _ = jax.lax.scan(
        body, (h, cache), jnp.arange(cfg.num_hidden_layers)
    )
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
