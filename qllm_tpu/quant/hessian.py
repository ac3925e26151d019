"""Hessian (XᵀX) collection for GPTQ/VPTQ calibration.

Reference: forward-hook accumulation (quant_gptq.py:73-87 →
gptq.py add_batch:75-102) and the VPTQ multi-GPU pipeline
(qllm_hessian.py). TPU-native design: the per-linear inputs come from
``layer_intermediates`` (pure function, no hooks); accumulation is a
jitted fp32 XᵀX chunk loop; on a (dp, tp) mesh the per-shard partial
Hessians are combined with a single ``jax.lax.psum`` over 'dp'
(SURVEY.md §2.3 "TPU-native equivalents").
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..models.llama import ModelConfig, layer_intermediates

__all__ = ["collect_block_hessians", "hessian_update"]

# q/k/v share one Hessian (same input); gate/up share one (per expert
# in MoE layers, where keys look like "experts.3.gate_proj"). Plain-MLP
# archs (opt/gptj/bloom/...) have no gate_proj — up_proj stands alone.
def _share_key(name: str, keys) -> str:
    if name in ("k_proj", "v_proj") and "q_proj" in keys:
        return "q_proj"
    if name == "kv_a_proj_with_mqa":  # MLA: shares x with the q branch
        for cand in ("q_a_proj", "q_proj"):
            if cand in keys:
                return cand
    if name.endswith("up_proj"):
        gate = name[: -len("up_proj")] + "gate_proj"
        if gate in keys:
            return gate
    return name


@jax.jit
def hessian_update(H: jax.Array, n_prev: jax.Array, x: jax.Array):
    """Streaming update, numerically matching reference add_batch
    (gptq.py:75-102): H <- H·n/(n+t) + (2/(n+t))·XᵀX."""
    x = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    t = x.shape[0]
    n_new = n_prev + t
    xs = x * jnp.sqrt(2.0 / n_new)
    return H * (n_prev / n_new) + xs.T @ xs, n_new


def collect_block_hessians(
    lp: Dict[str, Any],
    cfg: ModelConfig,
    h: jax.Array,  # [B, T, D] calibration hidden states entering the block
    cos: jax.Array,
    sin: jax.Array,
    mask: jax.Array,
    chunk: int = 8,
) -> Dict[str, jax.Array]:
    """Hessians for every linear in a block (dense or MoE), chunked over
    the batch to bound activation memory. Returns name->H for every
    quantizable linear (shared inputs alias the same array)."""
    B = h.shape[0]
    partial_Hs: Dict[str, jax.Array] = {}
    counts: Dict[str, jax.Array] = {}
    all_names = None
    for s in range(0, B, chunk):
        e = min(s + chunk, B)
        acts = _block_intermediates_jit(lp, cfg, h[s:e], cos[s:e], sin[s:e], mask[s:e])
        if all_names is None:
            all_names = list(acts.keys())
        for name, x in acts.items():
            if name not in partial_Hs:
                K = x.shape[-1]
                partial_Hs[name] = jnp.zeros((K, K), jnp.float32)
                counts[name] = jnp.zeros((), jnp.float32)
            partial_Hs[name], counts[name] = hessian_update(
                partial_Hs[name], counts[name], x
            )
    out = dict(partial_Hs)
    # alias shared inputs back to every consumer name
    if "q_proj" in partial_Hs:
        for name in ("k_proj", "v_proj"):
            out[name] = partial_Hs["q_proj"]
    if (
        "kv_a_proj_with_mqa" in lp  # only for MLA blocks that carry it
        and "kv_a_proj_with_mqa" not in partial_Hs
    ):
        for cand in ("q_a_proj", "q_proj"):
            if cand in partial_Hs:
                out["kv_a_proj_with_mqa"] = partial_Hs[cand]
                break
    for key in list(partial_Hs):
        if key.endswith("gate_proj"):
            out[key[: -len("gate_proj")] + "up_proj"] = partial_Hs[key]
    return out


@partial(jax.jit, static_argnames=("cfg",))
def _block_intermediates_jit(lp, cfg, h, cos, sin, mask):
    acts = layer_intermediates(lp, cfg, h, cos, sin, mask)
    return {
        k: v
        for k, v in acts.items()
        if _share_key(k, acts) == k and k != "experts_input"
    }
