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
) -> Tuple[jax.Array, QuantizedKVCache]:
    """Greedy-decode ``steps`` tokens on-device. Returns ([B, steps], cache)."""

    def body(carry, _):
        token, cache, pos = carry
        logits, cache = forward(params, cfg, token, cache, pos=pos)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)[:, None]
        return (nxt, cache, pos + 1), nxt[:, 0]

    (_, cache, _), toks = jax.lax.scan(
        body, (token, cache, pos0), None, length=steps
    )
    return toks.T, cache
