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

The block body is SHARED with the per-layer path
(llama._block_attn_mlp) via the StackedLayerView accessor, so every
architecture-family switch (parallel residual, ALiBi, plain MLP, ...)
works identically under the scan.

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
    _block_attn_mlp,
    _rope_cos_sin,
    build_mask,
    embed_tokens_forward,
    final_logits,
)

__all__ = [
    "stack_layer_params",
    "forward_stacked",
    "is_stackable",
    "prepare_stacked_tensor",
    "prepare_lm_head",
]


def is_stackable(params: Dict[str, Any]) -> bool:
    """True when every layer has the same pytree structure and shapes."""
    layers = params["layers"]
    if not isinstance(layers, list) or len(layers) < 2:
        return False
    if "experts" in layers[0]:
        return False  # MoE layer bodies not yet scan-specialized
    if "kv_a_proj_with_mqa" in layers[0]:
        return False  # MLA (deepseek-v2) serves via the per-layer path
    ref = jax.tree_util.tree_structure(layers[0])
    ref_shapes = [x.shape for x in jax.tree_util.tree_leaves(layers[0])]
    for lp in layers[1:]:
        if jax.tree_util.tree_structure(lp) != ref:
            return False
        if [x.shape for x in jax.tree_util.tree_leaves(lp)] != ref_shapes:
            return False
    return True


_FUSE_GROUPS = (
    ("qkv_proj", ("q_proj", "k_proj", "v_proj")),
    ("gateup_proj", ("gate_proj", "up_proj")),
)


def _fusable(lp: Dict[str, Any], names) -> bool:
    parts = [lp.get(n) for n in names]
    if not all(isinstance(p, QuantizedTensor) for p in parts):
        return False
    p0 = parts[0]
    return all(
        (p.bits, p.group_size, p.sym, p.in_features)
        == (p0.bits, p0.group_size, p0.sym, p0.in_features)
        and p.perm is None
        and not p.planar
        and not p.zeros_prefolded
        for p in parts
    )


def _fuse_layer_projections(lp: Dict[str, Any]) -> Dict[str, Any]:
    """Merge q/k/v (and gate/up) into one column-concatenated quantized
    tensor: one kernel invocation with a 2-3x wider N streams weights
    faster than 2-3 narrow ones (profiled: N=4096 kernels run ~582 GB/s
    vs ~612 at N=11008+) and saves launch overhead. The StackedLayerView
    slices the fused output back per consumer; unstack splits exactly
    via take_columns."""
    import numpy as np

    from ..quant.qtensor import concat_columns

    lp = dict(lp)
    for fused_name, names in _FUSE_GROUPS:
        if not _fusable(lp, names):
            continue
        parts = [lp[n] for n in names]
        widths = [p.out_features for p in parts]
        offs = np.cumsum([0] + widths)
        total = int(offs[-1])
        lp[fused_name] = concat_columns(
            parts,
            [np.arange(offs[i], offs[i + 1]) for i in range(len(parts))],
            total,
        )
        biases = [lp.get(f"{n}_bias") for n in names]
        if any(b is not None for b in biases):
            bdt = next(b for b in biases if b is not None).dtype
            lp[f"{fused_name}_bias"] = jnp.concatenate(
                [
                    b if b is not None else jnp.zeros((w,), bdt)
                    for b, w in zip(biases, widths)
                ]
            )
        for n in names:
            del lp[n]
            lp.pop(f"{n}_bias", None)
    return lp


def fused_splits(cfg: ModelConfig):
    """Column boundaries of the fused projections (logical widths)."""
    hd = cfg.head_dim or cfg.hidden_size // cfg.num_attention_heads
    nq = cfg.num_attention_heads * hd
    nkv = cfg.num_key_value_heads * hd
    ii = cfg.intermediate_size
    return {
        "qkv_proj": (0, nq, nq + nkv, nq + 2 * nkv),
        "gateup_proj": (0, ii, 2 * ii),
    }


def stack_layer_params(
    params: Dict[str, Any],
    lane_quantum: int = 512,
    planar: bool = True,
    scale_store_dtype=jnp.float32,
    fuse_projections: bool = True,
    sync_per_leaf: bool = False,
    consume: bool = False,
) -> Dict[str, Any]:
    """Replace the per-layer list with one pytree of [L, ...] leaves.

    Quantized scales/zeros are converted to f32 ONCE here — per-call
    casting of a whole [L, G, N] stack inside the decode loop profiled
    at ~25% of token latency.

    ``lane_quantum``: out-feature padding quantum (tensor-parallel
    serving passes lcm(512, 128*tp) so every shard stays lane-aligned).
    ``planar``: apply the 4-bit planar relayout (disable for TP — the
    planar word mixes rows k and K/2+k, which a row-sharded shard
    cannot consume; parallel.tp_step re-planarizes per shard).
    ``fuse_projections``: column-concatenate q/k/v and gate/up into one
    wide kernel call each (disable for TP, whose column sharding needs
    head locality).
    ``sync_per_leaf`` + ``consume``: HBM discipline for big models on a
    single chip. Eager async dispatch otherwise piles EVERY tensor's
    stack/pad/planarize transients into device memory at once ON TOP of
    the caller's original per-layer arrays — the 7B pipeline OOM'd a
    16GB chip that way. sync_per_leaf drains the dispatch queue after
    each tensor; consume=True additionally DELETES each entry from the
    caller's ``params['layers']`` dicts as soon as its stack is built,
    so the original buffers free progressively (the caller loses its
    per-layer view — pass ownership only)."""
    import dataclasses

    if not is_stackable(params):
        raise ValueError(
            "params are not stackable (heterogeneous layers or MoE); "
            "use the per-layer list path"
        )
    orig_layers = params["layers"]
    layers = orig_layers
    if fuse_projections:
        layers = [_fuse_layer_projections(lp) for lp in layers]
        if consume:
            # component projections live on only inside the fused concat
            for olp, flp in zip(orig_layers, layers):
                for n in list(olp.keys()):
                    if n not in flp:
                        del olp[n]

    prepared = {}
    for k in list(layers[0].keys()):
        vals = [lp[k] for lp in layers]
        v = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *vals)
        if isinstance(v, QuantizedTensor):
            v = prepare_stacked_tensor(
                v, lane_quantum, planar, scale_store_dtype
            )
            if sync_per_leaf:
                _sync_one(v.qweight)
        if consume:
            for lp in layers:
                lp.pop(k, None)
            for olp in orig_layers:
                olp.pop(k, None)
        prepared[k] = v
    out = dict(params)
    out["layers"] = prepared
    return out


def _sync_one(leaf) -> None:
    """Force completion of the computation producing ``leaf`` (tiny
    one-element fetch; block_until_ready does not reliably block on
    remote backends — NOTES.md)."""
    import numpy as _np

    _np.asarray(jax.device_get(leaf[(0,) * (leaf.ndim - 1)][:1]))


def prepare_stacked_tensor(
    node: QuantizedTensor,
    lane_quantum: int = 512,
    planar: bool = True,
    scale_store_dtype=jnp.float32,
) -> QuantizedTensor:
    """Serving prep for one [L]-stacked QuantizedTensor: lane padding,
    planar relayout, zero-point pre-fold, scale storage dtype (the
    per-leaf body of stack_layer_params; also reused for the L=1
    lm_head stack via prepare_lm_head)."""
    import dataclasses

    scales = node.scales.astype(jnp.float32)
    zeros = node.zeros.astype(jnp.float32)
    qweight = node.qweight
    # pad out-features to a lane_quantum multiple so the kernel
    # can use wide lane blocks (profiled: bn=256 runs at ~60% of
    # bn=512 streaming; e.g. llama N=11008 -> 11264). The logical
    # width stays in out_features; consumers slice.
    N = qweight.shape[-1]
    pad = (-N) % lane_quantum
    # evidence-driven wider padding: when the tuned table holds a
    # winner for a wider padded shape (e.g. 7B gateup 22016 ->
    # 22528 admitting bn=1024, swept faster despite extra bytes),
    # pad to it — never speculatively (ops.autotune)
    from ..ops.autotune import padded_width_hint

    wide = padded_width_hint(
        node.in_features,
        N + pad,
        node.bits,
        node.effective_group_size,
    )
    if wide > N + pad and wide % lane_quantum == 0:
        pad = wide - N
    if pad:
        qweight = jnp.pad(qweight, ((0, 0), (0, 0), (0, pad)))
        scales = jnp.pad(
            scales, ((0, 0), (0, 0), (0, pad)), constant_values=1.0
        )
        zeros = jnp.pad(zeros, ((0, 0), (0, 0), (0, pad)))
    # planar relayout (4-bit): bitcast-to-int8 becomes k-ordered
    # so the kernel consumes x without any transpose
    is_planar = False
    from ..ops.pallas_qmm import planar_bk, planar_full_ok
    from ..quant.qtensor import planarize_packed

    if (
        planar
        and node.bits == 4
        and node.perm is None
        and (
            planar_bk(node.in_features, node.effective_group_size)
            is not None
            or planar_full_ok(
                node.in_features, node.effective_group_size
            )
        )
    ):
        # planar relayout of the whole stack: the Pallas repack kernel
        # does it in one read+write pass over the packed words
        # (ops.pallas_repack); the jnp reference unpacks every nibble
        # to uint32 — an 8x-inflated HBM transient that made the
        # 128-expert qwen3-moe slab prep stream ~100 s — so it runs
        # chunked, as the fallback only
        from ..ops.pallas_repack import planarize_packed_pallas

        pq = planarize_packed_pallas(qweight, node.in_features)
        if pq is not None:
            qweight = pq
        else:
            L = qweight.shape[0]
            per_slice = node.in_features * qweight.shape[-1] * 4
            ch = max(1, min(L, (1 << 29) // max(per_slice, 1)))
            qweight = jnp.concatenate(
                [
                    planarize_packed(qweight[i : i + ch], node.in_features)
                    for i in range(0, L, ch)
                ]
            )
        is_planar = True
    # pre-fold the zero-point term: the decode-loop correction is
    # y -= xsum @ (zeros * scales); computing that product per
    # call re-reads BOTH [L, G, N] stacks every token (profiled
    # ~0.4 ms/token on 7B). Store zs once; unstack inverts.
    zs = zeros * scales
    if scale_store_dtype != jnp.float32:
        # bf16 scale storage (fused-correction kernels only):
        # halves scale/zs HBM bytes; ~2^-9 relative scale error,
        # far below 4-bit quantization noise
        scales = scales.astype(scale_store_dtype)
        zs = zs.astype(scale_store_dtype)
    return dataclasses.replace(
        node,
        qweight=qweight,
        scales=scales,
        zeros=zs,
        planar=is_planar,
        zeros_prefolded=True,
    )


def prepare_lm_head(
    qt: QuantizedTensor, scale_store_dtype=jnp.float32
) -> QuantizedTensor:
    """Serving prep for a quantized lm_head: the same planar relayout /
    lane padding / zero pre-fold as the stacked layers, as an L=1 stack.
    ops.qmatmul routes 3-D (stacked) tensors through the stacked Pallas
    kernel with layer=0 — the fastest kernel family also serves the
    head (profiled: the v3 2-D path streams ~650 GB/s vs the planar
    stacked kernel's ~740 GB/s on 7B shapes)."""
    if qt.perm is not None:
        return qt  # act-order head: keep the 2-D path (kernel needs no perm)
    stacked = jax.tree_util.tree_map(lambda a: a[None], qt)
    return prepare_stacked_tensor(
        stacked, planar=True, scale_store_dtype=scale_store_dtype
    )


def unstack_layer_params(
    params: Dict[str, Any], n_layers: int, cfg: ModelConfig = None
) -> Dict[str, Any]:
    """Inverse of stack_layer_params: per-layer list with the lane
    padding stripped (buffers match the logical out_features again).
    Fused qkv/gateup projections split back into their parts (``cfg``
    required for the split boundaries)."""
    import dataclasses

    stacked = params["layers"]

    def split_fused(lp):
        from ..quant.qtensor import take_columns

        import numpy as np

        for fused_name, names in _FUSE_GROUPS:
            qt = lp.pop(fused_name, None)
            if qt is None:
                continue
            if cfg is None:
                raise ValueError(
                    f"unstacking fused '{fused_name}' needs cfg for the "
                    "split boundaries"
                )
            s = fused_splits(cfg)[fused_name]
            bias = lp.pop(f"{fused_name}_bias", None)
            for j, n in enumerate(names):
                lp[n] = take_columns(qt, np.arange(s[j], s[j + 1]))
                if bias is not None:
                    lp[f"{n}_bias"] = bias[s[j] : s[j + 1]]
        return lp

    def slice_layer(i):
        lp = {}
        for k, v in stacked.items():
            if isinstance(v, QuantizedTensor):
                N = v.out_features
                qw = v.qweight[i]
                if v.planar:
                    from ..quant.qtensor import unplanarize_packed

                    qw = unplanarize_packed(qw, v.in_features)
                scales = v.scales[i, :, :N].astype(jnp.float32)
                zeros = v.zeros[i, :, :N].astype(jnp.float32)
                if v.zeros_prefolded:
                    # invert zs -> zeros (scales are >= eps by
                    # construction; f32 divide is exact to ~2^-24)
                    zeros = zeros / scales
                lp[k] = dataclasses.replace(
                    v,
                    qweight=qw[:, :N],
                    scales=scales,
                    zeros=zeros,
                    perm=None if v.perm is None else v.perm[i],
                    planar=False,
                    zeros_prefolded=False,
                )
            else:
                lp[k] = v[i]
        return split_fused(lp)

    out = dict(params)
    out["layers"] = [slice_layer(i) for i in range(n_layers)]
    return out


_FUSED_OF = {
    "q_proj": ("qkv_proj", 0),
    "k_proj": ("qkv_proj", 1),
    "v_proj": ("qkv_proj", 2),
    "gate_proj": ("gateup_proj", 0),
    "up_proj": ("gateup_proj", 1),
}


class NormedX:
    """An activation with a PENDING rms-norm, to be fused into the next
    stacked quantized matmul (ops.pallas_qmm full-K planar kernel
    computes the row mean for free — the whole x row is already in
    VMEM). Consumers that cannot fuse call ``materialize()``; llama's
    block code guards the non-matmul paths (MoE router) the same way."""

    __slots__ = ("x", "w_stacked", "layer", "eps")

    def __init__(self, x, w_stacked, layer, eps: float):
        self.x = x
        self.w_stacked = w_stacked
        self.layer = layer
        self.eps = eps

    @property
    def shape(self):
        return self.x.shape

    @property
    def dtype(self):
        return self.x.dtype

    def materialize(self):
        from ..ops.pallas_qmm import _rms_norm_rows

        return _rms_norm_rows(self.x, self.w_stacked[self.layer], self.eps)


class StackedLayerView:
    """llama.LayerView equivalent over [L]-stacked params + layer index.

    ``cfg`` enables the fused-projection path: q/k/v (gate/up) slices of
    one wide matmul, memoized per input so the fused kernel runs once
    per consumer group."""

    #: subclasses (e.g. the tensor-parallel view) can switch off the
    #: fused-norm marker without overriding ``fused_norm_arg``
    fuse_norms = True

    def __init__(self, slp: Dict[str, Any], l, cfg: ModelConfig = None):
        self.lp = slp
        self.l = l
        self.cfg = cfg
        self._fused_memo = {}

    def get(self, name):
        v = self.lp.get(name)
        if v is None or isinstance(v, QuantizedTensor):
            return v
        if name in ("shared_experts", "experts_stacked") and isinstance(
            v, dict
        ):
            # [L]-stacked shared-expert leaves (apply_shared) / full
            # [L*E]-stacked expert leaves (apply_expert[s_grouped] bias
            # ids by l * _moe_stride): truthy presence markers for
            # _mlp_from_view
            return v
        return v[self.l]

    def fused_norm_arg(self, h, name: str, cfg):
        """NormedX marker for ``rms_norm(h, <name>)`` when the next
        matmul can fuse it; None -> caller normalizes normally."""
        import os as _os

        if (
            not self.fuse_norms
            or cfg is None
            or cfg.norm_type != "rmsnorm"
            or self.lp.get(f"{name}_bias") is not None
            or _os.environ.get("QLLM_TPU_FUSED_NORM", "1") == "0"
        ):
            return None
        w = self.lp.get(name)
        if w is None or isinstance(w, QuantizedTensor) or w.ndim != 2:
            return None  # needs a plain [L, K] stacked weight
        return NormedX(h, w, self.l, cfg.rms_norm_eps)

    def apply(self, name, x):
        fused = _FUSED_OF.get(name)
        if fused is not None and fused[0] in self.lp:
            fused_name, part = fused
            if self.cfg is None:
                raise ValueError(
                    "fused stacked params need a cfg-aware view "
                    "(StackedLayerView(slp, l, cfg))"
                )
            key = (fused_name, id(x))
            y = self._fused_memo.get(key)
            if y is None:
                y = self._apply_name(fused_name, x)
                self._fused_memo[key] = y
            s = fused_splits(self.cfg)[fused_name]
            return y[..., s[part] : s[part + 1]]
        return self._apply_name(name, x)

    def _expert_stack(self, name):
        """(expert weight stack, id bias) for this layer: per-layer
        [E]-stacks have bias 0; the full [L*E] stack (one concat leaf
        for the whole model — the lax.scan MoE path) biases by
        l * _moe_stride."""
        est = self.lp.get("experts_stacked")
        if isinstance(est, dict):
            return est[name], self.l * self.lp["_moe_stride"]
        return est[self.l][name], 0

    def apply_expert(self, name, e, x):
        """MoE layers: [E]- or [L*E]-stacked expert weights; same
        contract as llama.LayerView.apply_expert."""
        from .moe import expert_linear

        w, bias = self._expert_stack(name)
        return expert_linear(w, bias + e, x)

    def apply_experts_grouped(self, name, ids, x_rows, x_shared=False):
        from .moe import grouped_expert_linear

        w, bias = self._expert_stack(name)
        return grouped_expert_linear(w, bias + ids, x_rows, x_shared)

    def fused_expert_mlp(self, ids, x_rows, cfg):
        """Whole expert MLP (gateup -> act -> down) in one kernel
        launch when the fused grouped kernel serves these stacks;
        None -> caller runs the per-projection grouped path."""
        est = self.lp.get("experts_stacked")
        est_l = est if isinstance(est, dict) else est[self.l]
        if "gateup_proj" not in est_l or "down_proj" not in est_l:
            return None
        gu, dn = est_l["gateup_proj"], est_l["down_proj"]
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
        bias = (
            self.l * self.lp["_moe_stride"] if isinstance(est, dict) else 0
        )
        return qmatmul_grouped_experts_fused(
            x_rows, gu, dn, bias + ids, act=cfg.hidden_act
        )

    def apply_shared(self, name, x):
        """Shared experts in hybrid params: [L]-stacked (dict of
        stacked QTs, tuned kernel) or per-layer list (heterogeneous)."""
        se = self.lp["shared_experts"]
        if isinstance(se, dict):
            from ..ops.pallas_qmm import qmatmul_pallas_stacked

            return qmatmul_pallas_stacked(x, se[name], self.l)
        from .llama import apply_linear

        return apply_linear(se[self.l][name], x)

    def combine_moe(self, out):
        return out

    def _apply_name(self, name, x):
        w = self.lp[name]
        if isinstance(w, list):
            # hybrid layers: heterogeneous entries (e.g. qwen-moe's
            # dense mlp_only layers among sparse ones) stay per-layer
            w = w[self.l]
            if isinstance(x, NormedX):
                x = x.materialize()
            if isinstance(w, QuantizedTensor):
                from ..ops.ref_matmul import qmatmul

                b = self.lp.get(f"{name}_bias")
                bias = None
                if isinstance(b, list):
                    bias = b[self.l]
                elif b is not None:
                    bias = b[self.l]
                return qmatmul(x, w, bias)
            return jnp.dot(
                x.astype(jnp.bfloat16),
                w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
        b = self.lp.get(f"{name}_bias")
        bias = None if b is None else b[self.l]
        norm_kw = {}
        if isinstance(x, NormedX):
            if isinstance(w, QuantizedTensor):
                norm_kw = {"norm_w": x.w_stacked, "norm_eps": x.eps}
                x = x.x
            else:
                x = x.materialize()
        if isinstance(w, QuantizedTensor):
            from ..ops.pallas_qmm import qmatmul_pallas_stacked

            y = qmatmul_pallas_stacked(x, w, self.l, **norm_kw)
            if bias is not None:
                y = y + bias
            return y
        y = jnp.dot(
            x.astype(jnp.bfloat16),
            w[self.l].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if bias is not None:
            y = y + bias
        return y


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
    pos = jnp.asarray(pos if pos is not None else 0)
    S = cache.max_seq
    if pos.ndim == 0:
        positions = pos + jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    else:
        positions = pos[:, None] + jnp.arange(T)[None, :]
    mask = build_mask(cfg, B, T, S, pos)
    mask_swa = (
        build_mask(cfg, B, T, S, pos, window=cfg.sliding_window)
        if cfg.sliding_window > 0
        else None
    )
    h = embed_tokens_forward(params, cfg, token_ids, positions)
    if cfg.pos_embedding == "rope":
        cos, sin = _rope_cos_sin(
            positions, cfg.rot_dim, cfg.rope_theta, cfg.rope_style, cfg=cfg
        )
    else:
        cos = sin = None

    slp = params["layers"]

    def body(carry, l):
        h, cache = carry
        if mask_swa is None:
            m = mask
        else:
            from .llama import swa_layer_pred

            m = jnp.where(swa_layer_pred(cfg, l), mask_swa, mask)
        h, cache = _block_attn_mlp(
            StackedLayerView(slp, l, cfg), cfg, h, cos, sin, m, cache, l, pos
        )
        return (h, cache), None

    (h, cache), _ = jax.lax.scan(
        body, (h, cache), jnp.arange(cfg.num_hidden_layers)
    )
    return final_logits(params, cfg, h), cache


# ---------------------------------------------------------------------------
# Hybrid stacking for MoE / MLA models: [L]-stack every homogeneous
# per-layer tensor (attention projections, norms, routers) so they ride
# the tuned stacked kernels + fused qkv, while experts keep their
# per-layer [E]-stacks (they cannot join an [L]-scan — the sparse path
# selects experts per token). Execution is a python loop over layers
# (forward_hybrid); the qwen3moe bench showed per-layer attention on
# the unstacked kernel was the biggest residual after the expert-side
# fixes.
# ---------------------------------------------------------------------------


def _qt_stackable_across(vals) -> bool:
    q0 = vals[0]
    return all(
        isinstance(q, QuantizedTensor)
        and (q.bits, q.group_size, q.sym, q.in_features, q.out_features)
        == (q0.bits, q0.group_size, q0.sym, q0.in_features, q0.out_features)
        and q.perm is None
        and not q.planar
        and not q.zeros_prefolded
        for q in vals
    )


def stack_layer_params_hybrid(
    params: Dict[str, Any],
    lane_quantum: int = 512,
    planar: bool = True,
    scale_store_dtype=jnp.float32,
    fuse_projections: bool = True,
    sync_per_leaf: bool = False,
    consume: bool = False,
) -> Dict[str, Any]:
    """Serving prep for MoE/MLA models (per-layer list in, hybrid
    layers-dict out). Homogeneous entries stack to [L] leaves with the
    usual serving prep; ``experts_stacked`` stays a per-layer list;
    heterogeneous entries (qwen-moe's dense mlp_only layers, deepseek's
    first_k_dense layer) stay per-layer lists served by the plain
    kernel. models.llama.forward dispatches to forward_hybrid.

    ``consume``: same HBM/host discipline as stack_layer_params — the
    caller passes ownership; source per-layer entries are deleted as
    each stacked copy lands, so originals free progressively instead of
    doubling resident memory for the whole prep."""
    from .moe import has_stackable_experts, stack_experts

    src_layers = params.get("layers")
    if has_stackable_experts(params):
        params = stack_experts(
            params,
            planar=planar,
            scale_store_dtype=scale_store_dtype,
            sync_per_leaf=sync_per_leaf,
            consume=consume,
        )
    layers = params["layers"]
    if not isinstance(layers, list):
        raise ValueError("hybrid stacking expects per-layer (list) params")
    # every dict generation that can still hold a ref to a source
    # tensor: the caller's originals, the stack_experts copies, and
    # (below) the fused-projection copies — consume must pop from all
    consume_dicts = [
        list(src_layers) if isinstance(src_layers, list) else [],
        list(layers),
    ]
    if fuse_projections:
        layers = [_fuse_layer_projections(lp) for lp in layers]
        consume_dicts.append(list(layers))
        if consume:
            # drop the unfused q/k/v (gate/up) originals now: the fused
            # copies hold the only refs the serving path needs
            for gen in consume_dicts[:2]:
                for lp, flp in zip(gen, layers):
                    if flp is not lp:
                        for nm in list(lp.keys()):
                            if nm not in flp:
                                lp.pop(nm)

    keys = []
    for lp in layers:
        for k in lp.keys():
            if k not in keys:
                keys.append(k)
    slp: Dict[str, Any] = {}

    def _consume_key(k):
        if consume:
            for gen in consume_dicts:
                for lp in gen:
                    lp.pop(k, None)

    for k in keys:
        vals = [lp.get(k) for lp in layers]
        if k == "experts_stacked" or any(v is None for v in vals):
            slp[k] = vals  # per-layer (possibly sparse-only) entry
            continue
        if k == "shared_experts" and all(isinstance(v, dict) for v in vals):
            # qwen2-moe/deepseek always-on shared experts: homogeneous
            # across every layer -> [L]-stack each leaf so the shared
            # MLP rides the tuned stacked kernel (apply_shared) instead
            # of the generic per-layer path
            names = sorted(vals[0].keys())
            if all(sorted(v.keys()) == names for v in vals) and all(
                _qt_stackable_across([v[nm] for v in vals]) for nm in names
            ):
                sse = {}
                for nm in names:
                    sv = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *[v[nm] for v in vals]
                    )
                    sv = prepare_stacked_tensor(
                        sv, lane_quantum, planar, scale_store_dtype
                    )
                    if sync_per_leaf:
                        _sync_one(sv.qweight)
                    sse[nm] = sv
                slp[k] = sse
                _consume_key(k)
                continue
            slp[k] = vals
            continue
        if isinstance(vals[0], QuantizedTensor):
            if not _qt_stackable_across(vals):
                slp[k] = vals
                continue
            v = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *vals)
            v = prepare_stacked_tensor(
                v, lane_quantum, planar, scale_store_dtype
            )
            if sync_per_leaf:
                _sync_one(v.qweight)
            slp[k] = v
            _consume_key(k)
            continue
        if all(
            hasattr(v, "shape") and v.shape == vals[0].shape for v in vals
        ):
            slp[k] = jnp.stack(vals)
            _consume_key(k)
        else:
            slp[k] = vals

    # full [L*E] expert stacking: when every layer's (already prepped)
    # expert stack is homogeneous and nothing else stayed per-layer,
    # concatenate the per-layer [E]-stacks into ONE [L*E]-leading stack
    # per name. The grouped kernel selects weight blocks by a traced id
    # (scalar prefetch), so the scan body just biases ids by l*E — the
    # whole MoE model then runs forward_stacked's lax.scan (one
    # compiled layer body, no per-layer python-loop XLA glue) instead
    # of forward_hybrid.
    ests = slp.get("experts_stacked")
    if (
        isinstance(ests, list)
        and all(isinstance(e, dict) for e in ests)
        and not any(
            isinstance(v, list)
            for k2, v in slp.items()
            if k2 != "experts_stacked"
        )
    ):
        names = sorted(ests[0].keys())

        def _meta(qt):
            return (
                qt.bits,
                qt.group_size,
                qt.sym,
                qt.in_features,
                qt.out_features,
                qt.planar,
                qt.zeros_prefolded,
                tuple(qt.qweight.shape),
                qt.scales.dtype,
            )

        if all(
            sorted(e.keys()) == names
            and all(
                isinstance(e[nm], QuantizedTensor)
                and e[nm].perm is None
                and _meta(e[nm]) == _meta(ests[0][nm])
                for nm in names
            )
            for e in ests
        ):
            full = {}
            for nm in names:
                full[nm] = jax.tree_util.tree_map(
                    lambda *xs: jnp.concatenate(xs), *[e[nm] for e in ests]
                )
                if sync_per_leaf:
                    _sync_one(full[nm].qweight)
            slp["experts_stacked"] = full
            slp["_moe_stride"] = int(ests[0][names[0]].qweight.shape[0])

    out = dict(params)
    out["layers"] = slp
    return out


def forward_hybrid(params, cfg, token_ids, cache, pos):
    """forward for hybrid-stacked MoE/MLA params: python loop over
    layers with the StackedLayerView (stacked attention kernels + fused
    qkv), per-layer expert stacks under it. Semantics identical to
    models.llama.forward with a cache."""
    from .llama import layer_uses_swa

    B, T = token_ids.shape
    if cache is None:
        raise ValueError(
            "hybrid forward requires a KV cache; use the per-layer "
            "(list) params for cacheless scoring"
        )
    pos = jnp.asarray(pos if pos is not None else 0)
    S = cache.max_seq
    if pos.ndim == 0:
        positions = pos + jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    else:
        positions = pos[:, None] + jnp.arange(T)[None, :]
    mask = build_mask(cfg, B, T, S, pos)
    mask_swa = (
        build_mask(cfg, B, T, S, pos, window=cfg.sliding_window)
        if cfg.sliding_window > 0
        else None
    )
    h = embed_tokens_forward(params, cfg, token_ids, positions)
    if cfg.pos_embedding == "rope":
        cos, sin = _rope_cos_sin(
            positions, cfg.rot_dim, cfg.rope_theta, cfg.rope_style, cfg=cfg
        )
    else:
        cos = sin = None
    slp = params["layers"]
    for l in range(cfg.num_hidden_layers):
        m = mask if mask_swa is None or not layer_uses_swa(cfg, l) else mask_swa
        h, cache = _block_attn_mlp(
            StackedLayerView(slp, l, cfg), cfg, h, cos, sin, m, cache, l, pos
        )
    return final_logits(params, cfg, h), cache
