"""Tensor-parallel continuous-batching engine: serving across chips/hosts.

The BASELINE north star is "INT8-KV continuous batching across hosts".
This subclass runs EVERY engine dispatch (admission prefill, batched
decode, fused multi-step, speculative rounds) inside ``jax.shard_map``
over a tp mesh axis, so each device owns its weight/KV-head shard and
invokes the fused Pallas kernels on local blocks (parallel/tp_step.py —
GSPMD alone cannot partition a pallas_call). Data parallelism across
hosts composes on top: each host (or dp group) runs its own engine over
its own request stream — weights are tp-sharded over ICI, requests are
dp-partitioned over DCN (parallel/distributed.make_pod_mesh).

Greedy steps reconcile the argmax across vocab shards bit-identically
to the single-device engine (tp_step._tp_greedy); sampled steps gather
the [B, V] logits row (tiny) and reuse models.sampling.sample_logits
with a replicated key, so every device picks the same token. Outputs
are asserted equal to the single-device engine in tests.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.generate import make_cache
from ..models.llama import ModelConfig
from ..models.sampling import sample_logits
from .engine import ContinuousBatchingEngine, ServeConfig, _spec_accept

__all__ = ["TPEngine"]


def _gather_full(logits_local: jax.Array, axis: str, v_total: int):
    """[..., V/tp] local -> [..., v_total] replicated."""
    full = jax.lax.all_gather(
        logits_local, axis, axis=logits_local.ndim - 1, tiled=True
    )
    return full[..., :v_total]


class TPEngine(ContinuousBatchingEngine):
    """ContinuousBatchingEngine whose step functions are shard_map'd
    over ``mesh``'s ``tp`` axis. ``params`` are per-layer (list) params
    as produced by the loaders/quantizers; they are TP-prepared, layer-
    stacked, and placed here."""

    def __init__(
        self,
        params: Dict[str, Any],
        cfg: ModelConfig,
        serve_cfg: ServeConfig,
        mesh: Mesh,
        axis: str = "tp",
        prepared: bool = False,
    ):
        from ..parallel.tp_step import (
            moe_tp_pspecs,
            place_tp,
            prepare_tp_moe_params,
            prepare_tp_params,
            stacked_tp_pspecs,
            tp_cache_pspecs,
            tp_forward_moe,
            tp_forward_stacked,
        )

        self.mesh = mesh
        self.axis = axis
        self.tp = mesh.shape[axis]
        # MoE / MLA models serve on the per-layer (python-loop) TP path
        # — their layers cannot [L]-stack; dense models keep the
        # scan-over-stacked path
        layers = params.get("layers")
        per_layer = isinstance(layers, list) and any(
            isinstance(lp, dict)
            and (
                "experts" in lp
                or "experts_stacked" in lp
                or "kv_a_proj_with_mqa" in lp
            )
            for lp in layers
        )
        self._per_layer_tp = per_layer
        self._tp_forward = tp_forward_moe if per_layer else tp_forward_stacked
        if not prepared:
            params = (
                prepare_tp_moe_params(params, cfg, self.tp)
                if per_layer
                else prepare_tp_params(params, cfg, self.tp)
            )
        import os

        if os.environ.get("QLLM_TPU_AUTOTUNE") == "1" and not per_layer:
            # tune the LOCAL shard shapes the shard_map body will hand
            # the kernels (must run OUTSIDE any trace — lookups from
            # inside a jit can only read the cache)
            from ..ops.autotune import tune_for_tp_params

            tune_for_tp_params(
                params, self.tp, Ms=(serve_cfg.max_batch,)
            )
        super().__init__(params, cfg, serve_cfg)
        self.params, self.cache = place_tp(self.params, self.cache, mesh)
        self._pspecs = (
            moe_tp_pspecs(self.params)
            if self._per_layer_tp
            else stacked_tp_pspecs(self.params)
        )
        self._cspecs = tp_cache_pspecs(self.cache)
        self._fns: Dict[Any, Any] = {}  # (kind, *static) -> jitted shmap

    # ------------------------------------------------------------ helpers

    def _shmap(self, body, in_specs, out_specs):
        return jax.jit(
            jax.shard_map(
                body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )
        )

    def _pick(self, logits_local, sampling, key):
        """Next token from LOCAL [B, V/tp] logits; replicated result."""
        from ..parallel.tp_step import _tp_greedy

        if sampling is None:
            return _tp_greedy(logits_local, self.cfg.vocab_size, self.axis)
        t, k, p = sampling
        full = _gather_full(logits_local, self.axis, self.cfg.vocab_size)
        return sample_logits(full, key, t, k, p)

    # ----------------------------------------------------- step overrides

    def _fn_decode_step(self, tokens, cache, positions, sampling, key):

        sampled = sampling is not None
        fn = self._fns.get(("step", sampled))
        if fn is None:

            def body(params, tokens, cache, positions, *rest):
                samp = (rest[0], rest[1], rest[2]) if sampled else None
                k = rest[3] if sampled else None
                logits, cache = self._tp_forward(
                    params, self.cfg, tokens, cache, positions, self.tp
                )
                return self._pick(logits[:, -1], samp, k), cache

            extra = (P(), P(), P(), P()) if sampled else ()
            fn = self._shmap(
                body,
                (self._pspecs, P(), self._cspecs, P()) + extra,
                (P(), self._cspecs),
            )
            self._fns[("step", sampled)] = fn
        args = (sampling + (key,)) if sampled else ()
        return fn(self.params, tokens, cache, positions, *args)

    def _fn_decode_multi(
        self, tokens, cache, positions, active, steps, sampling, key
    ):

        sampled = sampling is not None
        eos = self.scfg.eos_token_id
        fn = self._fns.get(("multi", steps, sampled))
        if fn is None:

            def body(params, tokens, cache, positions, active, *rest):
                samp = (rest[0], rest[1], rest[2]) if sampled else None
                kk = rest[3] if sampled else None

                def step(carry, i):
                    tokens, cache, positions, active = carry
                    logits, cache = self._tp_forward(
                        params, self.cfg, tokens, cache, positions, self.tp
                    )
                    k_i = (
                        jax.random.fold_in(kk, i) if sampled else None
                    )
                    nxt = self._pick(logits[:, -1], samp, k_i)
                    if eos is not None:
                        fin = nxt == eos
                    else:
                        fin = jnp.zeros_like(nxt, dtype=bool)
                    emit = jnp.where(active, nxt, -1)
                    positions = positions + active.astype(jnp.int32)
                    active = active & (~fin)
                    tokens = jnp.where(active[:, None], nxt[:, None], tokens)
                    return (tokens, cache, positions, active), emit

                (tokens, cache, positions, active), trace = jax.lax.scan(
                    step,
                    (tokens, cache, positions, active),
                    jnp.arange(steps),
                )
                return trace.T, tokens, cache, positions, active

            extra = (P(), P(), P(), P()) if sampled else ()
            fn = self._shmap(
                body,
                (self._pspecs, P(), self._cspecs, P(), P()) + extra,
                (P(), P(), self._cspecs, P(), P()),
            )
            self._fns[("multi", steps, sampled)] = fn
        args = (sampling + (key,)) if sampled else ()
        return fn(self.params, tokens, cache, positions, active, *args)

    def _fn_spec_step(
        self, tokens, cache, positions, active, history, hist_len
    ):
        from ..models.speculative import ngram_draft

        eos = self.scfg.eos_token_id
        gamma, ngram = self.scfg.spec_gamma, self.scfg.spec_ngram
        fn = self._fns.get("spec")
        if fn is None:

            def body(params, tokens, cache, positions, active, hist, hlen):
                draft = ngram_draft(hist, hlen, gamma, ngram)
                seq = jnp.concatenate([tokens, draft], axis=1)
                logits, cache = self._tp_forward(
                    params, self.cfg, seq, cache, positions, self.tp
                )
                B, T, Vl = logits.shape
                nxt = self._pick(
                    logits.reshape(B * T, Vl), None, None
                ).reshape(B, T)
                el, tokens2, positions2, active2 = _spec_accept(
                    nxt, draft, tokens, positions, active, eos
                )
                return nxt, el, tokens2, cache, positions2, active2

            fn = self._shmap(
                body,
                (self._pspecs, P(), self._cspecs, P(), P(), P(), P()),
                (P(), P(), P(), self._cspecs, P(), P()),
            )
            self._fns["spec"] = fn
        return fn(
            self.params, tokens, cache, positions, active, history, hist_len
        )

    def _fn_prefill_one(self, tokens, cache, length):

        Tb = tokens.shape[1]
        fn = self._fns.get(("prefill", Tb, cache.max_seq))
        if fn is None:

            def body(params, tokens, cache, length):
                logits, cache = self._tp_forward(
                    params, self.cfg, tokens, cache, jnp.int32(0), self.tp
                )
                last = jnp.take_along_axis(
                    logits, (length - 1)[None, None, None], axis=1
                )[:, 0]
                return (
                    _gather_full(last, self.axis, self.cfg.vocab_size),
                    cache,
                )

            fn = self._shmap(
                body,
                (self._pspecs, P(), self._cspecs, P()),
                (P(), self._cspecs),
            )
            self._fns[("prefill", Tb, cache.max_seq)] = fn
        return fn(self.params, tokens, cache, length)

    def _fn_prefill_chunk(self, tokens, cache, offset, length):

        C = tokens.shape[1]
        fn = self._fns.get(("prefill_chunk", C, cache.max_seq))
        if fn is None:

            def body(params, tokens, cache, offset, length):
                logits, cache = self._tp_forward(
                    params, self.cfg, tokens, cache, offset, self.tp
                )
                last = jnp.take_along_axis(
                    logits,
                    jnp.maximum(length - offset - 1, 0)[None, None, None],
                    axis=1,
                )[:, 0]
                return (
                    _gather_full(last, self.axis, self.cfg.vocab_size),
                    cache,
                )

            fn = self._shmap(
                body,
                (self._pspecs, P(), self._cspecs, P(), P()),
                (P(), self._cspecs),
            )
            self._fns[("prefill_chunk", C, cache.max_seq)] = fn
        return fn(self.params, tokens, cache, offset, length)

    def _make_mini_cache(self, Tcap):
        from ..parallel.tp_step import tp_cache_pspecs

        mini = make_cache(self.cfg, 1, Tcap, self.scfg.quantized_kv)
        cspecs = tp_cache_pspecs(mini)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(self.mesh, s)),
            mini,
            cspecs,
            is_leaf=lambda x: isinstance(x, P),
        )
