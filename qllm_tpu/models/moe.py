"""MoE serving prep: stack per-expert weights into [E]-leading pytrees.

The reference inherits HF's sparse MoE blocks, which gather tokens and
run ONLY the selected experts' weights (MixtralSparseMoeBlock is the
forward the reference quantizes and evaluates through — Mixtral and
deepseek-v2 are first-class in its per-model tables,
/root/reference/qllm/quantization/sequential_layes_gptq_config.py:70-101
and sequential_layes_awq_config.py get_deepseek_v2_layers). A dense
all-experts loop would read E experts' weights to use k of them — an
E/k-times HBM-traffic penalty in the memory-bound decode regime (4x on
Mixtral 8x7B, E=8 k=2).

The TPU-native equivalent of HF's token gathering: stack every expert's
packed weights into one [E, ...] buffer so expert selection at decode is
a scalar index delivered to the Pallas kernel by scalar prefetch
(ops.pallas_qmm.qmatmul_pallas_stacked, the same no-copy indexed-read
kernel that serves the [L]-stacked layer loop). The kernel reads ONLY
the selected expert's blocks out of HBM; nothing is gathered or copied
on-device. models.llama._moe_forward takes this sparse path whenever
B*T*k < E (decode and small-batch), and keeps the dense all-experts
path for prefill where every expert is hit anyway.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..quant.qtensor import QuantizedTensor

__all__ = ["stack_experts", "expert_linear", "has_stackable_experts"]

_EXPERT_LINEARS = ("gate_proj", "up_proj", "down_proj")


def _experts_homogeneous(experts) -> bool:
    """True when every expert carries the same fields with identical
    shapes/metadata (required to stack them on a leading [E] axis)."""
    if not experts:
        return False
    e0 = experts[0]
    names = set(e0.keys())
    if not names.issubset(set(_EXPERT_LINEARS)):
        return False  # unexpected per-expert field (e.g. act scales)
    for ep in experts:
        if set(ep.keys()) != names:
            return False
        for n in names:
            a, b = e0[n], ep[n]
            if isinstance(a, QuantizedTensor) != isinstance(
                b, QuantizedTensor
            ):
                return False
            if isinstance(a, QuantizedTensor):
                if (
                    (a.bits, a.group_size, a.sym, a.in_features, a.out_features)
                    != (b.bits, b.group_size, b.sym, b.in_features, b.out_features)
                    or b.perm is not None
                    or b.planar
                    or b.zeros_prefolded
                ):
                    return False
            else:
                if a is None or b is None or a.shape != b.shape:
                    return False
    return True


def _raw_prestacked(lp) -> bool:
    """A layer carrying raw (un-prepped) [E]-leading stacked expert
    tensors — testing.random_quantized_params(experts_prestacked=True)
    emits these; stack_experts must still run the serving prep."""
    est = lp.get("experts_stacked") if isinstance(lp, dict) else None
    return (
        isinstance(est, dict)
        and "experts" not in lp
        and any(
            isinstance(v, QuantizedTensor)
            and not v.planar
            and not v.zeros_prefolded
            for v in est.values()
        )
    )


def has_stackable_experts(params: Dict[str, Any]) -> bool:
    layers = params.get("layers")
    if not isinstance(layers, list):
        return False
    return any(
        (
            isinstance(lp, dict)
            and "experts" in lp
            and _experts_homogeneous(lp["experts"])
        )
        or _raw_prestacked(lp)
        for lp in layers
    )


def stack_experts(
    params: Dict[str, Any],
    lane_quantum: int = 512,
    planar: bool = True,
    scale_store_dtype=jnp.float32,
    sync_per_leaf: bool = False,
    consume: bool = False,
    fuse_gateup: bool = True,
) -> Dict[str, Any]:
    """Return a copy of ``params`` where each MoE layer's per-expert
    list is replaced by ``experts_stacked``: one dict of [E]-leading
    tensors (QuantizedTensor stacks get the same serving prep as the
    [L]-layer stacks: lane padding, planar relayout, zero pre-fold —
    models.stacked.prepare_stacked_tensor).

    A serving-time transform like stack_layer_params: the returned
    params are for inference only (save/quantize paths keep using the
    original per-expert list). Layers whose experts are heterogeneous
    (mixed bits/shapes) are left untouched — they keep the dense path.

    ``sync_per_leaf`` + ``consume``: the same HBM discipline as
    stack_layer_params for big models on one chip — drain the dispatch
    queue after each stacked tensor and delete the source per-expert
    entries so originals free progressively (caller passes ownership).
    """
    from .stacked import _sync_one, prepare_stacked_tensor

    layers = params.get("layers")
    if not isinstance(layers, list):
        return params
    new_layers = []
    for lp in layers:
        if _raw_prestacked(lp):
            # pre-stacked raw [E]-leading entries: same serving prep
            # (adaptive lane quantum, planar relayout, zero pre-fold),
            # no per-expert re-stack needed
            est = {}
            for n, v in lp["experts_stacked"].items():
                if isinstance(v, QuantizedTensor) and not v.planar:
                    q = (
                        lane_quantum
                        if v.out_features >= 4 * max(lane_quantum, 1)
                        else min(lane_quantum, 128)
                    )
                    v = prepare_stacked_tensor(
                        v, q, planar, scale_store_dtype
                    )
                    if sync_per_leaf:
                        _sync_one(v.qweight)
                est[n] = v
            nlp = dict(lp)
            if consume:
                lp["experts_stacked"] = None
            nlp["experts_stacked"] = est
            new_layers.append(nlp)
            continue
        if not (
            isinstance(lp, dict)
            and "experts" in lp
            and _experts_homogeneous(lp["experts"])
        ):
            new_layers.append(lp)
            continue
        experts = lp["experts"]
        # fuse each expert's gate+up into one column-concat tensor when
        # possible: HALVES the launches per MoE block (the grouped
        # kernel then runs twice, not three times) — decisive for big-E
        # families whose per-expert matmuls are small (qwen3-moe I=768)
        names = list(experts[0].keys())
        def _gu_fusable(ep):
            g0, u0 = ep.get("gate_proj"), ep.get("up_proj")
            return (
                isinstance(g0, QuantizedTensor)
                and isinstance(u0, QuantizedTensor)
                and (
                    g0.bits,
                    g0.group_size,
                    g0.sym,
                    g0.in_features,
                    g0.out_features,
                )
                == (
                    u0.bits,
                    u0.group_size,
                    u0.sym,
                    u0.in_features,
                    u0.out_features,
                )
                and g0.perm is None
                and u0.perm is None
                and not g0.planar
                and not u0.planar
            )

        fuse_gu = (
            fuse_gateup
            and "gate_proj" in names
            and "up_proj" in names
            and all(_gu_fusable(ep) for ep in experts)
        )
        if fuse_gu:
            from ..quant.qtensor import concat_columns
            import numpy as _np

            fused = []
            for ep in experts:
                gqt, uqt = ep["gate_proj"], ep["up_proj"]
                ii = gqt.out_features
                fused.append(
                    concat_columns(
                        [gqt, uqt],
                        [_np.arange(0, ii), _np.arange(ii, ii + uqt.out_features)],
                        ii + uqt.out_features,
                    )
                )
            experts = [
                {"gateup_proj": f, "down_proj": ep["down_proj"]}
                for f, ep in zip(fused, experts)
            ]
            names = ["gateup_proj", "down_proj"]
        est: Dict[str, Any] = {}
        for n in names:
            vals = [ep[n] for ep in experts]
            v = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *vals)
            if isinstance(v, QuantizedTensor):
                # adaptive lane quantum: 512-padding a small per-expert
                # width wastes real bytes (qwen3-moe N=768 -> 1024 was
                # +33% expert traffic); narrow stacks pad to 128 only
                q = (
                    lane_quantum
                    if v.out_features >= 4 * max(lane_quantum, 1)
                    else min(lane_quantum, 128)
                )
                v = prepare_stacked_tensor(
                    v, q, planar, scale_store_dtype
                )
                if sync_per_leaf:
                    _sync_one(v.qweight)
            if consume:
                for ep in lp["experts"]:
                    ep.pop(n, None)
            est[n] = v
        nlp = dict(lp)
        del nlp["experts"]
        if consume:
            lp.pop("experts", None)
        nlp["experts_stacked"] = est
        new_layers.append(nlp)
    out = dict(params)
    out["layers"] = new_layers
    return out


def grouped_expert_linear(
    w, ids: jax.Array, x_rows: jax.Array, x_shared: bool = False
) -> jax.Array:
    """y[i] = x_rows[i] @ W[ids[i]] for [E]-stacked expert weights —
    ONE kernel launch for every (token, expert) selection when the
    grouped Pallas kernel's constraints hold
    (ops.pallas_qmm.qmatmul_grouped_experts); otherwise a static
    per-selection loop of indexed matmuls (exact same math).
    ``x_shared``: all rows of x_rows are the same row (B=1 top-k) —
    the kernel reads one shared x block."""
    n = x_rows.shape[0]
    if isinstance(w, QuantizedTensor):
        from ..ops.pallas_qmm import (
            grouped_experts_ok,
            qmatmul_grouped_experts,
        )

        if grouped_experts_ok(w):
            return qmatmul_grouped_experts(
                x_rows, w, ids, x_shared=x_shared
            )
        return jnp.concatenate(
            [expert_linear(w, ids[i], x_rows[i : i + 1]) for i in range(n)]
        )
    we = jnp.take(w, ids, axis=0)  # [n, K, N] (dense test-scale stacks)
    return jnp.einsum(
        "nk,nkd->nd",
        x_rows.astype(jnp.bfloat16),
        we.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(x_rows.dtype)


def expert_linear(w, e, x: jax.Array) -> jax.Array:
    """y = x @ W[e] for one [E]-stacked expert weight ``w``; ``e`` may be
    a traced scalar (decode top-k selection) or a python int (dense
    prefill loop). Quantized stacks ride the indexed-read Pallas kernel
    (no gather materialized); dense stacks dynamic-slice."""
    if isinstance(w, QuantizedTensor):
        from ..ops.pallas_qmm import qmatmul_pallas_stacked

        return qmatmul_pallas_stacked(x, w, jnp.asarray(e, jnp.int32))
    we = jax.lax.dynamic_index_in_dim(w, e, axis=0, keepdims=False)
    return jnp.dot(
        x.astype(jnp.bfloat16),
        we.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
