"""Fused multi-step greedy decode: one dispatch for N tokens.

lax.scan over the decode step keeps the whole token loop on-device —
essential on TPU where per-dispatch host latency would otherwise
dominate decode (the reference pays a python loop + kernel launch per
token, chatcli/generation.py:65-115).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops.kv_cache import QuantizedKVCache
from .llama import ModelConfig, forward

__all__ = ["decode_loop"]


@partial(jax.jit, static_argnames=("cfg", "steps"))
def decode_loop(
    params,
    cfg: ModelConfig,
    token: jax.Array,  # [B, 1] int32
    cache: QuantizedKVCache,
    pos0: jax.Array,  # scalar int32
    steps: int,
    sampling=None,  # (temperature [B], top_k [B], top_p [B]) or None=greedy
    key: jax.Array = None,  # PRNG key, required when sampling is set
) -> Tuple[jax.Array, QuantizedKVCache]:
    """Decode ``steps`` tokens on-device. Returns ([B, steps], cache).

    Greedy by default; pass ``sampling`` (models.sampling.params_arrays)
    + ``key`` for temperature/top-k/top-p sampling — the per-step key is
    fold_in(key, pos), so resuming at the same position reproduces the
    same stream."""
    if sampling is not None and key is None:
        raise ValueError("sampling requires a PRNG key")

    def pick(logits, pos):
        if sampling is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        from .sampling import sample_logits

        t, k, p = sampling
        return sample_logits(logits, jax.random.fold_in(key, pos), t, k, p)

    def body(carry, _):
        token, cache, pos = carry
        logits, cache = forward(params, cfg, token, cache, pos=pos)
        nxt = pick(logits[:, -1], pos)[:, None]
        return (nxt, cache, pos + 1), nxt[:, 0]

    ring = cache.ring_k is not None
    if ring and steps % 8 == 0:
        # ring-fused KV: the attention kernel appends each token's k/v
        # to the small bf16 ring (no write launch); once per 8 steps ONE
        # all-layers kernel quantizes the full rings into the int8
        # cache. CONTRACT: pos0 must be a multiple of 8 (pad prefill
        # lengths) — the kernel masks cache cols by (pos//8)*8, so an
        # unaligned start silently drops the unflushed prefill tail.
        import dataclasses

        from ..ops.pallas_attention import kv_ring_flush_pallas

        B = token.shape[0]

        def group(carry, _):
            (token, cache, pos), toks = jax.lax.scan(
                body, carry, None, length=8
            )
            k2, v2, ks2, vs2 = kv_ring_flush_pallas(
                cache.k,
                cache.v,
                cache.k_scale,
                cache.v_scale,
                cache.ring_k,
                cache.ring_v,
                jnp.broadcast_to(pos, (B,)).astype(jnp.int32),
            )
            cache = dataclasses.replace(
                cache, k=k2, v=v2, k_scale=ks2, v_scale=vs2
            )
            return (token, cache, pos), toks

        (_, cache, _), toks = jax.lax.scan(
            group, (token, cache, pos0), None, length=steps // 8
        )
        return toks.reshape(steps, -1).T, cache

    if ring:
        raise ValueError(
            "ring-fused decode needs steps % 8 == 0 (the flush kernel "
            "only writes full rings); pad steps or use a ring-less cache"
        )

    (_, cache, _), toks = jax.lax.scan(
        body, (token, cache, pos0), None, length=steps
    )
    return toks.T, cache
