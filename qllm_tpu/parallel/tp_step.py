"""Tensor-parallel serving via shard_map: the Pallas kernels under TP.

GSPMD cannot partition a pallas_call, so NamedSharding alone silently
degrades a multi-chip mesh to gathered/replicated matmuls. This module
runs the WHOLE decode step inside ``jax.shard_map``: every device owns
its weight shard, invokes the fused stacked kernels on local blocks,
and the collectives are explicit:

  * column-parallel (q/k/v, gate/up, lm_head): shard out-features; no
    communication (attention heads are device-local).
  * row-parallel (o_proj, down_proj): shard in-features; one psum of the
    partial products per projection (Megatron layout — 2 psums/layer).
  * embedding: vocab-sharded lookup, masked + psum.
  * greedy sampling: local top-1 + pmax/pmin index reconciliation
    (bit-identical to the single-device argmax incl. tie order).

Alignment: out-features are padded to lcm(512, 128·tp) multiples at
stack time so every shard is lane-aligned, and row-parallel in-features
(down_proj's K) are padded to the SAME padded width as their
column-parallel producer (gate/up's N) — zero weight rows are exact
(see quant.qtensor.pad_in_features). This replaces the reference's only
"model parallel" story (accelerate device_map layer placement,
modeling/base.py:296-305) with true tensor parallelism over ICI.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.llama import (
    ModelConfig,
    _block_attn_mlp,
    _rope_cos_sin,
    apply_norm,
    build_mask,
    layer_norm,
)
from ..models.stacked import NormedX, StackedLayerView, stack_layer_params
from ..ops.kv_cache import QuantizedKVCache
from ..quant.qtensor import QuantizedTensor, pad_in_features, pad_out_features

__all__ = [
    "prepare_tp_params",
    "prepare_tp_moe_params",
    "stacked_tp_pspecs",
    "moe_tp_pspecs",
    "tp_cache_pspecs",
    "make_tp_decode_loop",
    "tp_forward_stacked",
    "tp_forward_moe",
]

_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_ROW = ("o_proj", "down_proj")


# ---------------------------------------------------------------------------
# Parameter preparation: pad + stack (planar off) for a tp-way split
# ---------------------------------------------------------------------------


def _lane_quantum(group_size: int, tp: int) -> int:
    g = max(group_size, 1)
    return math.lcm(512, 128 * tp, g * tp)


def prepare_tp_params(
    params: Dict[str, Any], cfg: ModelConfig, tp: int
) -> Dict[str, Any]:
    """Per-layer params -> [L]-stacked params laid out for a tp-way mesh.

    Pads gate/up out-features (and the matching down_proj in-features)
    to lcm(512, 128·tp, g·tp) so every shard stays lane-aligned and
    down's G divides tp; q/k/v/o are NEVER padded (padding would break
    the head layout — their dims must divide tp at head granularity,
    asserted below). Stacks WITHOUT the planar relayout (the planar
    word interleaves rows k and K/2+k, which row sharding would split)."""
    if tp < 1:
        raise ValueError(f"tp must be >= 1, got {tp}")
    if cfg.num_attention_heads % tp or cfg.num_key_value_heads % tp:
        raise ValueError(
            f"attention heads ({cfg.num_attention_heads}/"
            f"{cfg.num_key_value_heads} kv) must divide tp={tp}"
        )
    layers = params["layers"]
    if not isinstance(layers, list):
        raise ValueError("prepare_tp_params expects per-layer (list) params")

    new_layers = []
    for lp in layers:
        nlp = dict(lp)
        for name in ("gate_proj", "up_proj"):
            w = nlp.get(name)
            if isinstance(w, QuantizedTensor):
                q = _lane_quantum(w.effective_group_size, tp)
                i_pad = -(-w.out_features // q) * q
                nlp[name] = pad_out_features(w, i_pad)
                b = nlp.get(f"{name}_bias")
                if b is not None and b.shape[-1] != i_pad:
                    nlp[f"{name}_bias"] = jnp.concatenate(
                        [b, jnp.zeros((i_pad - b.shape[-1],), b.dtype)]
                    )
        down = nlp.get("down_proj")
        if isinstance(down, QuantizedTensor):
            q = _lane_quantum(down.effective_group_size, tp)
            i_pad = -(-down.in_features // q) * q
            nlp["down_proj"] = pad_in_features(down, i_pad)
            asc = nlp.get("down_proj_act_scale")
            if asc is not None and asc.shape[-1] != i_pad:
                nlp["down_proj_act_scale"] = jnp.concatenate(
                    [asc, jnp.ones((i_pad - asc.shape[-1],), asc.dtype)]
                )
        # row-parallel scale shards need G % tp == 0 (o_proj's K is the
        # head dim product and cannot be padded — assert instead)
        for name in _ROW:
            w = nlp.get(name)
            if isinstance(w, QuantizedTensor) and w.n_groups % tp:
                raise ValueError(
                    f"{name}: groups {w.n_groups} % tp {tp} != 0 — "
                    f"in_features {w.in_features} must be a multiple "
                    f"of group_size*tp"
                )
        new_layers.append(nlp)

    out = dict(params)
    out["layers"] = new_layers
    # stack with NO extra lane padding (done selectively above) and no
    # planar relayout
    out = stack_layer_params(
        out, lane_quantum=1, planar=False, fuse_projections=False
    )

    # lm_head: pad vocab columns to a lane-aligned per-shard width
    # (pad logits are masked to -inf before the greedy pick)
    lm = out.get("lm_head")
    if lm is not None:
        if isinstance(lm, QuantizedTensor):
            vq = _lane_quantum(lm.effective_group_size, tp)
            v_pad = -(-lm.out_features // vq) * vq
            out["lm_head"] = pad_out_features(lm, v_pad)
        else:
            v_pad = -(-lm.shape[-1] // (128 * tp)) * (128 * tp)
            if v_pad != lm.shape[-1]:
                out["lm_head"] = jnp.pad(
                    lm, ((0, 0), (0, v_pad - lm.shape[-1]))
                )
    # vocab-sharded embedding: pad rows so V % tp == 0 (ids never hit pads)
    emb = out["embed_tokens"]
    v_rows = -(-emb.shape[0] // tp) * tp
    if v_rows != emb.shape[0]:
        out["embed_tokens"] = jnp.pad(
            emb, ((0, v_rows - emb.shape[0]), (0, 0))
        )
    return out


# ---------------------------------------------------------------------------
# PartitionSpec trees
# ---------------------------------------------------------------------------


def _qt_pspec(qt: QuantizedTensor, kind: str, stacked: bool):
    lead = (None,) if stacked else ()
    if kind == "col":
        spec = P(*lead, None, "tp")
    else:
        spec = P(*lead, "tp", None)
    return dataclasses.replace(
        qt,
        qweight=spec,
        scales=spec,
        zeros=spec,
        perm=None if qt.perm is None else P(),
    )


def stacked_tp_pspecs(params: Dict[str, Any]):
    """Leafwise PartitionSpec tree for prepare_tp_params output."""
    out = {}
    for key, v in params.items():
        if key == "embed_tokens":
            out[key] = P("tp", None)
        elif key == "lm_head":
            out[key] = (
                _qt_pspec(v, "col", stacked=False)
                if isinstance(v, QuantizedTensor)
                else P(None, "tp")
            )
        elif key == "layers":
            lo = {}
            for name, w in v.items():
                if name in _COL and isinstance(w, QuantizedTensor):
                    lo[name] = _qt_pspec(w, "col", stacked=True)
                elif name in _ROW and isinstance(w, QuantizedTensor):
                    lo[name] = _qt_pspec(w, "row", stacked=True)
                elif name in _COL:
                    lo[name] = P(None, None, "tp")
                elif name in _ROW:
                    lo[name] = P(None, "tp", None)
                elif name.endswith("_bias") and name[: -len("_bias")] in _COL:
                    lo[name] = P(None, "tp")
                elif name == "down_proj_act_scale":
                    lo[name] = P(None, "tp")
                else:
                    lo[name] = P()  # norms, row biases: replicated
            out[key] = lo
        else:
            out[key] = P()  # norm(_bias), pos_embed, embed_layernorm, ...
    return out


def tp_cache_pspecs(cache: QuantizedKVCache) -> QuantizedKVCache:
    kv = P(None, "dp", "tp", None, None)
    sc = P(None, "dp", "tp", None) if cache.quantized else P(None)
    return dataclasses.replace(cache, k=kv, v=kv, k_scale=sc, v_scale=sc)


# ---------------------------------------------------------------------------
# The per-device forward (runs INSIDE shard_map on local shards)
# ---------------------------------------------------------------------------


def _localize_qt(qt: QuantizedTensor, stacked: bool = True) -> QuantizedTensor:
    """Rewrite static (in/out)_features metadata to the LOCAL shard's
    shapes (shard_map hands the body local-shaped refs, but pytree meta
    fields keep their global values)."""
    qw = qt.qweight
    rows = qw.shape[-2]
    if qt.bits in (2, 4, 8):
        k_local = rows * (32 // qt.bits)
    else:
        k_local = rows * 32 // qt.bits
    n_local = qw.shape[-1]
    # column shards treat their whole local width as logical (lane-pad
    # columns compute exact zeros); an unsharded tensor keeps the
    # logical slice semantics of the single-chip path
    n_out = qt.out_features if n_local >= qt.out_features else n_local
    return dataclasses.replace(qt, in_features=k_local, out_features=n_out)


class TPStackedLayerView(StackedLayerView):
    """StackedLayerView over LOCAL shards: localizes quantized metadata
    and psums row-parallel partial products over the tp axis."""

    def __init__(self, slp: Dict[str, Any], l, axis: str):
        super().__init__(slp, l)
        self.axis = axis

    def get(self, name):
        v = self.lp.get(name)
        if isinstance(v, QuantizedTensor):
            return _localize_qt(v)
        if v is None:
            return None
        return v[self.l]

    def apply(self, name, x):
        w = self.lp[name]
        b = self.lp.get(f"{name}_bias")
        bias = None if b is None else b[self.l]
        norm_kw = {}
        if isinstance(x, NormedX):
            # column-parallel matmuls keep the full K axis per shard and
            # the norm weight is replicated, so the in-kernel norm
            # fusion is sharding-transparent; anything else materializes
            if isinstance(w, QuantizedTensor) and name not in _ROW:
                norm_kw = {"norm_w": x.w_stacked, "norm_eps": x.eps}
                x = x.x
            else:
                x = x.materialize()
        if isinstance(w, QuantizedTensor):
            from ..ops.pallas_qmm import qmatmul_pallas_stacked

            y = qmatmul_pallas_stacked(x, _localize_qt(w), self.l, **norm_kw)
        else:
            y = jnp.dot(
                x.astype(jnp.bfloat16),
                w[self.l].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        if name in _ROW:
            y = jax.lax.psum(y, self.axis)
        if bias is not None:
            y = y + bias
        return y


def _tp_embed(
    params, cfg: ModelConfig, token_ids, positions, axis: str
) -> jax.Array:
    """Vocab-sharded embedding lookup: local take + mask + psum."""
    emb = params["embed_tokens"]
    vl = emb.shape[0]
    rank = jax.lax.axis_index(axis)
    local = token_ids - rank * vl
    ok = (local >= 0) & (local < vl)
    h = jnp.take(emb, jnp.clip(local, 0, vl - 1), axis=0)
    h = jnp.where(ok[..., None], h, jnp.zeros_like(h))
    h = jax.lax.psum(h, axis)
    if cfg.embedding_multiplier != 1.0:
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


def _tp_logits_local(params, cfg: ModelConfig, h) -> jax.Array:
    """Final norm + column-sharded lm_head -> LOCAL logits [B, T, V/tp]."""
    from ..models.llama import apply_linear

    h = apply_norm(cfg, h, params["norm"], params.get("norm_bias"))
    lm = params.get("lm_head")
    if cfg.tie_word_embeddings or lm is None:
        logits = jnp.dot(
            h.astype(jnp.bfloat16),
            params["embed_tokens"].T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    elif isinstance(lm, QuantizedTensor):
        logits = apply_linear(
            _localize_qt(lm, stacked=False), h, params.get("lm_head_bias")
        ).astype(jnp.float32)
    else:
        logits = jnp.dot(
            h.astype(jnp.bfloat16),
            lm.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    if cfg.logit_scale != 1.0:
        logits = logits * cfg.logit_scale
    return logits.astype(jnp.float32)


def _tp_greedy(logits_local: jax.Array, v_total: int, axis: str) -> jax.Array:
    """argmax over vocab-sharded logits [B, Vl] — identical result
    (incl. first-max tie order) to jnp.argmax on the gathered vector."""
    B, vl = logits_local.shape
    rank = jax.lax.axis_index(axis)
    col = rank * vl + jnp.arange(vl)[None, :]
    neg = jnp.finfo(jnp.float32).min
    masked = jnp.where(col < v_total, logits_local, neg)
    m_local = jnp.max(masked, axis=-1)
    i_local = jnp.argmax(masked, axis=-1).astype(jnp.int32)
    m_global = jax.lax.pmax(m_local, axis)
    cand = jnp.where(
        m_local >= m_global, rank * vl + i_local, jnp.int32(2**31 - 1)
    )
    return jax.lax.pmin(cand, axis)


def _local_cfg(cfg: ModelConfig, tp: int) -> ModelConfig:
    return dataclasses.replace(
        cfg,
        num_attention_heads=cfg.num_attention_heads // tp,
        num_key_value_heads=cfg.num_key_value_heads // tp,
        # pin the head dim: the derived-from-hidden_size fallback would
        # inflate it by tp once the head counts shrink
        head_dim=cfg.hd,
    )


def tp_forward_stacked(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,  # LOCAL [B/dp, T]
    cache: QuantizedKVCache,  # LOCAL shards
    pos,
    tp: int,
    axis: str = "tp",
) -> Tuple[jax.Array, QuantizedKVCache]:
    """models.stacked.forward_stacked on local shards inside shard_map.
    Returns LOCAL logits [B/dp, T, V_pad/tp] and the updated cache."""
    lcfg = _local_cfg(cfg, tp)
    B, T = token_ids.shape
    pos = jnp.asarray(pos if pos is not None else 0)
    S = cache.max_seq
    if pos.ndim == 0:
        positions = pos + jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    else:
        positions = pos[:, None] + jnp.arange(T)[None, :]
    mask = build_mask(lcfg, B, T, S, pos)
    h = _tp_embed(params, lcfg, token_ids, positions, axis)
    if cfg.pos_embedding == "rope":
        cos, sin = _rope_cos_sin(
            positions, cfg.rot_dim, cfg.rope_theta, cfg.rope_style, cfg=cfg
        )
    else:
        cos = sin = None
    slp = params["layers"]

    def body(carry, l):
        h, cache = carry
        h, cache = _block_attn_mlp(
            TPStackedLayerView(slp, l, axis),
            lcfg,
            h,
            cos,
            sin,
            mask,
            cache,
            l,
            pos,
        )
        return (h, cache), None

    (h, cache), _ = jax.lax.scan(
        body, (h, cache), jnp.arange(cfg.num_hidden_layers)
    )
    return _tp_logits_local(params, lcfg, h), cache


# ---------------------------------------------------------------------------
# MoE / MLA tensor parallelism: per-layer list params + [E]-stacked experts
# ---------------------------------------------------------------------------
#
# MoE and MLA models cannot take the [L]-stack (mixed dense/sparse
# layers; the expert axis adds a second stacking level), so TP serves
# them on the per-layer python-loop path. MLA (deepseek-v2) head split:
# q_b/kv_b column-sharded by heads, o_proj row-sharded, the latent
# projections (q_a, kv_a_proj_with_mqa) and their norms replicated —
# their outputs feed every head. Expert split: every expert's gate/up is
# column-sharded and its down row-sharded over tp (Megatron layout, the
# same intermediate-dim split as the dense MLP), with the routed-expert
# partial sum psum'd ONCE per MoE block (LayerView.combine_moe). The
# router, shared experts, and shared_expert_gate stay replicated: the
# router must be (identical top-k on every shard), and the shared
# expert is small relative to E routed experts. Works for both the
# sparse decode path and the dense prefill loop in models.llama.
# Reference contrast: the reference's only multi-GPU MoE story is
# accelerate layer placement (modeling/base.py:296-305).


def prepare_tp_moe_params(
    params: Dict[str, Any], cfg: ModelConfig, tp: int
) -> Dict[str, Any]:
    """Per-layer MoE params laid out for a tp-way mesh: expert gate/up
    out-features padded to lcm(512, 128·tp, g·tp) (down in-features to
    the same width), experts [E]-stacked per layer (planar OFF — row
    sharding cannot consume the planar word), dense-MLP layers padded
    like prepare_tp_params. Layers stay a python list."""
    from ..models.moe import _experts_homogeneous, stack_experts

    if tp < 1:
        raise ValueError(f"tp must be >= 1, got {tp}")
    if cfg.num_attention_heads % tp or cfg.num_key_value_heads % tp:
        raise ValueError(
            f"attention heads ({cfg.num_attention_heads}/"
            f"{cfg.num_key_value_heads} kv) must divide tp={tp}"
        )
    layers = params["layers"]
    if not isinstance(layers, list):
        raise ValueError("prepare_tp_moe_params expects per-layer params")
    # MLA (deepseek-v2): q_b / kv_b are column-sharded by heads, o_proj
    # row-sharded; the latent projections (q_a, kv_a_proj_with_mqa —
    # their outputs feed every head) and their norms stay replicated.
    # No extra prep needed here: the head split is a plain column split
    # (qk_hd/dn+dv-contiguous per head) and o's group check runs below.

    new_layers = []
    for lp in layers:
        nlp = dict(lp)
        if "experts" in nlp:
            if not _experts_homogeneous(nlp["experts"]):
                raise ValueError(
                    "TP MoE requires homogeneous experts (same bits/"
                    "shapes across the expert axis)"
                )
            experts = []
            for ep in nlp["experts"]:
                nep = dict(ep)
                for name in ("gate_proj", "up_proj"):
                    w = nep.get(name)
                    if isinstance(w, QuantizedTensor):
                        q = _lane_quantum(w.effective_group_size, tp)
                        i_pad = -(-w.out_features // q) * q
                        nep[name] = pad_out_features(w, i_pad)
                down = nep.get("down_proj")
                if isinstance(down, QuantizedTensor):
                    q = _lane_quantum(down.effective_group_size, tp)
                    i_pad = -(-down.in_features // q) * q
                    nep["down_proj"] = pad_in_features(down, i_pad)
                    if nep["down_proj"].n_groups % tp:
                        raise ValueError(
                            f"expert down_proj groups "
                            f"{nep['down_proj'].n_groups} % tp {tp} != 0"
                        )
                experts.append(nep)
            nlp["experts"] = experts
        else:
            # dense-MLP layer (qwen-moe mlp_only_layers): same padding
            # as the dense TP path
            for name in ("gate_proj", "up_proj"):
                w = nlp.get(name)
                if isinstance(w, QuantizedTensor):
                    q = _lane_quantum(w.effective_group_size, tp)
                    i_pad = -(-w.out_features // q) * q
                    nlp[name] = pad_out_features(w, i_pad)
                    b = nlp.get(f"{name}_bias")
                    if b is not None and b.shape[-1] != i_pad:
                        nlp[f"{name}_bias"] = jnp.concatenate(
                            [b, jnp.zeros((i_pad - b.shape[-1],), b.dtype)]
                        )
            down = nlp.get("down_proj")
            if isinstance(down, QuantizedTensor):
                q = _lane_quantum(down.effective_group_size, tp)
                i_pad = -(-down.in_features // q) * q
                nlp["down_proj"] = pad_in_features(down, i_pad)
        for name in _ROW:
            w = nlp.get(name)
            if isinstance(w, QuantizedTensor) and w.n_groups % tp:
                raise ValueError(
                    f"{name}: groups {w.n_groups} % tp {tp} != 0"
                )
        new_layers.append(nlp)

    out = dict(params)
    out["layers"] = new_layers
    # [E]-stack each layer's (now padded) experts; no extra lane
    # padding, NO gate/up fusion (the concat's column split would break
    # gate/up locality under tp sharding — same reason dense TP
    # disables fuse_projections)
    out = stack_experts(out, lane_quantum=1, planar=False, fuse_gateup=False)

    lm = out.get("lm_head")
    if lm is not None:
        if isinstance(lm, QuantizedTensor):
            vq = _lane_quantum(lm.effective_group_size, tp)
            v_pad = -(-lm.out_features // vq) * vq
            out["lm_head"] = pad_out_features(lm, v_pad)
        else:
            v_pad = -(-lm.shape[-1] // (128 * tp)) * (128 * tp)
            if v_pad != lm.shape[-1]:
                out["lm_head"] = jnp.pad(
                    lm, ((0, 0), (0, v_pad - lm.shape[-1]))
                )
    emb = out["embed_tokens"]
    v_rows = -(-emb.shape[0] // tp) * tp
    if v_rows != emb.shape[0]:
        out["embed_tokens"] = jnp.pad(
            emb, ((0, v_rows - emb.shape[0]), (0, 0))
        )
    return out


_EXPERT_COL = ("gate_proj", "up_proj")
# MLA head-sharded projections (deepseek-v2): column split = head split
_MLA_COL = ("q_b_proj", "kv_b_proj")


def moe_tp_pspecs(params: Dict[str, Any]):
    """Leafwise PartitionSpec tree for prepare_tp_moe_params output
    (per-layer list; experts_stacked leaves carry a leading [E] axis)."""
    out = {}
    for key, v in params.items():
        if key == "embed_tokens":
            out[key] = P("tp", None)
        elif key == "lm_head":
            out[key] = (
                _qt_pspec(v, "col", stacked=False)
                if isinstance(v, QuantizedTensor)
                else P(None, "tp")
            )
        elif key == "layers":
            lspecs = []
            for lp in v:
                lo = {}
                for name, w in lp.items():
                    if name == "experts_stacked":
                        eo = {}
                        for en, ew in w.items():
                            kind = "col" if en in _EXPERT_COL else "row"
                            if isinstance(ew, QuantizedTensor):
                                # leading [E] axis is unsharded
                                eo[en] = _qt_pspec(ew, kind, stacked=True)
                            else:
                                eo[en] = (
                                    P(None, None, "tp")
                                    if kind == "col"
                                    else P(None, "tp", None)
                                )
                        lo[name] = eo
                    elif (
                        name in _COL or name in _MLA_COL
                    ) and isinstance(w, QuantizedTensor):
                        lo[name] = _qt_pspec(w, "col", stacked=False)
                    elif name in _ROW and isinstance(w, QuantizedTensor):
                        lo[name] = _qt_pspec(w, "row", stacked=False)
                    elif (
                        (name in _COL or name in _MLA_COL)
                        and w is not None
                        and getattr(w, "ndim", 0) == 2
                    ):
                        lo[name] = P(None, "tp")
                    elif (
                        name in _ROW
                        and w is not None
                        and getattr(w, "ndim", 0) == 2
                    ):
                        lo[name] = P("tp", None)
                    elif (
                        name.endswith("_bias")
                        and name[: -len("_bias")] in _COL
                    ):
                        lo[name] = P("tp")
                    elif name == "down_proj_act_scale":
                        lo[name] = P("tp")
                    else:
                        # router, shared experts, shared_expert_gate,
                        # MLA latent projections (q_a / kv_a — feed
                        # every head), norms, row biases: replicated.
                        # Quantized leaves need a QT-shaped spec tree.
                        lo[name] = (
                            jax.tree_util.tree_map(lambda _: P(), w)
                            if isinstance(w, (dict, QuantizedTensor))
                            else P()
                        )
                lspecs.append(lo)
            out[key] = lspecs
        else:
            out[key] = P()
    return out


class TPMoeLayerView:
    """llama.LayerView over one MoE layer's LOCAL shards: localizes
    quantized metadata, psums row-parallel partials (o_proj / dense
    down_proj per call; routed experts once via combine_moe)."""

    def __init__(self, lp: Dict[str, Any], axis: str):
        self.lp = lp
        self.axis = axis

    def get(self, name):
        v = self.lp.get(name)
        if isinstance(v, QuantizedTensor) and name not in (
            "router",
        ):
            return _localize_qt(v, stacked=False)
        return v

    def apply(self, name, x):
        from ..ops.ref_matmul import qmatmul
        from ..models.llama import apply_linear

        w = self.lp[name]
        b = self.lp.get(f"{name}_bias")
        if isinstance(w, QuantizedTensor):
            y = qmatmul(x, _localize_qt(w, stacked=False))
        else:
            y = jnp.dot(
                x.astype(jnp.bfloat16),
                w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        if name in _ROW:
            # row-parallel: psum partials BEFORE the (replicated) bias
            y = jax.lax.psum(y, self.axis)
        if b is not None:
            y = y + b
        return y

    def apply_expert(self, name, e, x):
        from ..models.moe import expert_linear

        w = self.lp["experts_stacked"][name]
        if isinstance(w, QuantizedTensor):
            w = _localize_qt(w)  # stacked [E] metadata -> local shard
        return expert_linear(w, e, x)

    def apply_experts_grouped(self, name, ids, x_rows, x_shared=False):
        from ..models.moe import grouped_expert_linear

        w = self.lp["experts_stacked"][name]
        if isinstance(w, QuantizedTensor):
            w = _localize_qt(w)
        return grouped_expert_linear(w, ids, x_rows, x_shared)

    def apply_shared(self, name, x):
        # shared experts stay replicated under TP (see moe_tp_pspecs)
        from ..models.llama import apply_linear

        return apply_linear(self.lp["shared_experts"][name], x)

    def combine_moe(self, out):
        # expert down_proj is row-sharded: one psum per MoE block
        # combines every expert's partial product (weights/router are
        # replicated, so scalar combination commutes with the psum)
        return jax.lax.psum(out, self.axis)


def tp_forward_moe(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: jax.Array,  # LOCAL [B/dp, T]
    cache: QuantizedKVCache,  # LOCAL shards
    pos,
    tp: int,
    axis: str = "tp",
) -> Tuple[jax.Array, QuantizedKVCache]:
    """Per-layer (python loop) TP forward for MoE models inside
    shard_map. Returns LOCAL logits [B/dp, T, V_pad/tp] + cache."""
    lcfg = _local_cfg(cfg, tp)
    B, T = token_ids.shape
    pos = jnp.asarray(pos if pos is not None else 0)
    S = cache.max_seq
    if pos.ndim == 0:
        positions = pos + jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    else:
        positions = pos[:, None] + jnp.arange(T)[None, :]
    mask = build_mask(lcfg, B, T, S, pos)
    h = _tp_embed(params, lcfg, token_ids, positions, axis)
    if cfg.pos_embedding == "rope":
        cos, sin = _rope_cos_sin(
            positions, cfg.rot_dim, cfg.rope_theta, cfg.rope_style, cfg=cfg
        )
    else:
        cos = sin = None
    for l, lp in enumerate(params["layers"]):
        h, cache = _block_attn_mlp(
            TPMoeLayerView(lp, axis), lcfg, h, cos, sin, mask, cache, l, pos
        )
    return _tp_logits_local(params, lcfg, h), cache


def make_tp_moe_decode_loop(
    cfg: ModelConfig,
    mesh: Mesh,
    params: Dict[str, Any],
    cache: QuantizedKVCache,
    steps: int,
):
    """jitted shard_map multi-token greedy decode over per-layer MoE
    params (prepare_tp_moe_params output)."""
    tp = mesh.shape["tp"]
    pspecs = moe_tp_pspecs(params)
    cspecs = tp_cache_pspecs(cache)
    v_total = cfg.vocab_size

    def step_body(params, token, cache, pos0):
        def body(carry, _):
            token, cache, pos = carry
            logits, cache = tp_forward_moe(
                params, cfg, token, cache, pos, tp
            )
            nxt = _tp_greedy(logits[:, -1], v_total, "tp")[:, None]
            return (nxt, cache, pos + 1), nxt[:, 0]

        (_, cache, _), toks = jax.lax.scan(
            body, (token, cache, pos0), None, length=steps
        )
        return toks.T, cache

    shmapped = jax.shard_map(
        step_body,
        mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspecs, P()),
        out_specs=(P("dp", None), cspecs),
        check_vma=False,
    )
    return jax.jit(shmapped)


def make_tp_decode_loop(
    cfg: ModelConfig,
    mesh: Mesh,
    params: Dict[str, Any],
    cache: QuantizedKVCache,
    steps: int,
):
    """Build the jitted shard_map multi-token greedy decode.

    Returns fn(params, token, cache, pos0) -> (tokens [B, steps], cache).
    ``params`` must come from prepare_tp_params; place operands with
    jax.device_put on the matching NamedShardings (or let jit do it).
    """
    tp = mesh.shape["tp"]
    pspecs = stacked_tp_pspecs(params)
    cspecs = tp_cache_pspecs(cache)
    v_total = cfg.vocab_size

    def step_body(params, token, cache, pos0):
        def body(carry, _):
            token, cache, pos = carry
            logits, cache = tp_forward_stacked(
                params, cfg, token, cache, pos, tp
            )
            nxt = _tp_greedy(logits[:, -1], v_total, "tp")[:, None]
            return (nxt, cache, pos + 1), nxt[:, 0]

        (_, cache, _), toks = jax.lax.scan(
            body, (token, cache, pos0), None, length=steps
        )
        return toks.T, cache

    shmapped = jax.shard_map(
        step_body,
        mesh=mesh,
        in_specs=(pspecs, P("dp", None), cspecs, P()),
        out_specs=(P("dp", None), cspecs),
        check_vma=False,
    )
    return jax.jit(shmapped)


def place_tp(params, cache, mesh: Mesh):
    """device_put params/cache onto the mesh with the TP layout
    ([L]-stacked dense params, or per-layer-list MoE params)."""
    pspecs = (
        moe_tp_pspecs(params)
        if isinstance(params.get("layers"), list)
        else stacked_tp_pspecs(params)
    )
    cspecs = tp_cache_pspecs(cache)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map(put, params, pspecs)
    cache = jax.tree_util.tree_map(
        put,
        cache,
        cspecs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return params, cache
