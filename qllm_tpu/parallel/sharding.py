"""NamedSharding layouts for quantized params and the KV cache.

Megatron-style layout over the (dp, tp) mesh:
  * column-parallel (shard out-features N): q/k/v, gate/up, lm_head
  * row-parallel  (shard in-features K): o_proj, down_proj — XLA inserts
    the psum of partial sums at the jit boundary automatically
  * KV cache sharded over (dp=batch, tp=kv-heads)
  * packed qweight/scales/zeros shard with their owning matrix; the K
    axis of a packed uint32 qweight is K/pack_factor so any tp that
    divides K/32 divides it too.

This is new design demanded by BASELINE.json's north star — the
reference has no tensor parallelism at all (SURVEY.md §2.3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.kv_cache import QuantizedKVCache
from ..quant.qtensor import QuantizedTensor

__all__ = ["shard_params", "shard_cache", "param_pspecs", "cache_pspec"]

_COL = (
    "q_proj",
    "k_proj",
    "v_proj",
    "gate_proj",
    "up_proj",
    "lm_head",
    # stack-time fused projections (models.stacked._FUSE_GROUPS) are
    # column-concatenations of column-parallel matrices — still
    # column-parallel under GSPMD (XLA handles any boundary misalignment)
    "qkv_proj",
    "gateup_proj",
)
_ROW = ("o_proj", "down_proj")


def _qt_put(qt: QuantizedTensor, mesh: Mesh, kind: str) -> QuantizedTensor:
    tp = mesh.shape["tp"]
    if kind == "col":
        wspec = P(None, "tp")
        sspec = P(None, "tp")
    else:
        wspec = P("tp", None)
        # scales [G, N]: shard G only when divisible (g=-1 -> G=1)
        sspec = P("tp", None) if qt.n_groups % tp == 0 else P(None, None)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return dataclasses.replace(
        qt,
        qweight=put(qt.qweight, wspec),
        scales=put(qt.scales, sspec),
        zeros=put(qt.zeros, sspec),
        perm=None if qt.perm is None else put(qt.perm, P(None)),
    )


def _dense_put(w: jax.Array, mesh: Mesh, kind: str) -> jax.Array:
    spec = P(None, "tp") if kind == "col" else P("tp", None)
    return jax.device_put(w, NamedSharding(mesh, spec))


def _put_linear(w, mesh: Mesh, kind: str):
    if isinstance(w, QuantizedTensor):
        return _qt_put(w, mesh, kind)
    return _dense_put(w, mesh, kind)


def _shard_layer_dict(lp: Dict[str, Any], mesh: Mesh, stacked: bool):
    """Shard one layer dict (or the [L]-stacked layers dict — specs gain
    a leading replicated axis)."""

    def rep(x, spec=P()):
        if stacked and spec != P():
            spec = P(None, *spec)
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_lin(w, kind):
        if not stacked:
            return _put_linear(w, mesh, kind)
        if isinstance(w, QuantizedTensor):
            tp = mesh.shape["tp"]
            wspec = P(None, None, "tp") if kind == "col" else P(None, "tp", None)
            sspec = (
                P(None, None, "tp")
                if kind == "col"
                else (
                    P(None, "tp", None)
                    if w.n_groups % tp == 0
                    else P(None, None, None)
                )
            )
            return dataclasses.replace(
                w,
                qweight=jax.device_put(w.qweight, NamedSharding(mesh, wspec)),
                scales=jax.device_put(w.scales, NamedSharding(mesh, sspec)),
                zeros=jax.device_put(w.zeros, NamedSharding(mesh, sspec)),
                perm=None
                if w.perm is None
                else jax.device_put(w.perm, NamedSharding(mesh, P(None, None))),
            )
        spec = P(None, None, "tp") if kind == "col" else P(None, "tp", None)
        return jax.device_put(w, NamedSharding(mesh, spec))

    nlp = {}
    for name, w in lp.items():
        if name in ("input_layernorm", "post_attention_layernorm", "router"):
            nlp[name] = rep(w)
        elif name == "experts":
            nlp[name] = [
                _shard_layer_dict(ep, mesh, stacked) for ep in w
            ]
        elif name.endswith("_bias"):
            base = name[: -len("_bias")]
            spec = P("tp") if base in _COL else P()
            nlp[name] = rep(w, spec)
        elif name in _COL:
            nlp[name] = put_lin(w, "col")
        elif name in _ROW:
            nlp[name] = put_lin(w, "row")
        else:
            nlp[name] = rep(w)
    return nlp


def shard_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place every param on the mesh with its TP layout. Handles both
    per-layer lists and [L]-stacked layers (models.stacked)."""

    def rep(x, spec=P()):
        return jax.device_put(x, NamedSharding(mesh, spec))

    out = dict(params)
    out["embed_tokens"] = jax.device_put(
        params["embed_tokens"], NamedSharding(mesh, P("tp", None))
    )
    out["norm"] = rep(params["norm"])
    if "lm_head" in params:
        out["lm_head"] = _put_linear(params["lm_head"], mesh, "col")
    layers = params["layers"]
    if isinstance(layers, list):
        out["layers"] = [
            _shard_layer_dict(lp, mesh, stacked=False) for lp in layers
        ]
    else:
        out["layers"] = _shard_layer_dict(layers, mesh, stacked=True)
    return out


def cache_pspec(quantized: bool):
    # cache layout [L, B, H_kv, S, D]
    kv = P(None, "dp", "tp", None, None)
    scale = P(None, "dp", "tp", None) if quantized else P(None)
    return kv, scale


def shard_cache(cache: QuantizedKVCache, mesh: Mesh) -> QuantizedKVCache:
    kv, scale = cache_pspec(cache.quantized)

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    return dataclasses.replace(
        cache,
        k=put(cache.k, kv),
        v=put(cache.v, kv),
        k_scale=put(cache.k_scale, scale),
        v_scale=put(cache.v_scale, scale),
    )


def param_pspecs(params: Dict[str, Any]):
    """PartitionSpec pytree (for in_shardings-style use). Mirrors
    shard_params' layout; QuantizedTensor leaves expand to their fields."""

    def qt_spec(qt, kind):
        if kind == "col":
            s = P(None, "tp")
            ss = s
        else:
            s = P("tp", None)
            ss = s
        return dataclasses.replace(
            qt,
            qweight=s,
            scales=ss,
            zeros=ss,
            perm=None if qt.perm is None else P(None),
        )

    out = dict(params)
    out["embed_tokens"] = P("tp", None)
    out["norm"] = P()
    if "lm_head" in params:
        w = params["lm_head"]
        out["lm_head"] = (
            qt_spec(w, "col") if isinstance(w, QuantizedTensor) else P(None, "tp")
        )
    layers = []
    for lp in params["layers"]:
        nlp = {}
        for name, w in lp.items():
            if name in ("input_layernorm", "post_attention_layernorm"):
                nlp[name] = P()
            elif name.endswith("_bias"):
                nlp[name] = P("tp") if name[: -len("_bias")] in _COL else P()
            elif name in _COL or name in _ROW:
                kind = "col" if name in _COL else "row"
                nlp[name] = (
                    qt_spec(w, kind)
                    if isinstance(w, QuantizedTensor)
                    else (P(None, "tp") if kind == "col" else P("tp", None))
                )
            else:
                nlp[name] = P()
        layers.append(nlp)
    out["layers"] = layers
    return out
