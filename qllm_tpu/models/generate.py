"""Generation: jitted prefill + decode with the quantized KV cache.

The analog of the reference chat generation loop
(plugin/chatcli/generation.py:5-115: greedy DynamicCache decode) —
redesigned for XLA: static shapes, one compiled prefill, one compiled
decode step re-used every token.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.kv_cache import QuantizedKVCache
from .llama import ModelConfig, forward

__all__ = [
    "prefill",
    "decode_step",
    "greedy_generate",
    "sample_generate",
    "make_cache",
]


def make_cache(
    cfg: ModelConfig,
    batch: int,
    max_seq: int,
    quantized_kv: bool = True,
    ring: bool = False,
) -> QuantizedKVCache:
    """``ring=True`` opts into the ring-fused decode path (the KV write
    rides inside the attention kernel; models.decode_loop flushes every
    8 steps). Requires 8-aligned prefill lengths and decode via
    decode_loop with steps % 8 == 0."""
    return QuantizedKVCache.create(
        cfg.num_hidden_layers,
        batch,
        max_seq,
        cfg.num_key_value_heads,
        cfg.hd,
        quantized=quantized_kv,
        ring=ring,
    )


@partial(jax.jit, static_argnames=("cfg",))
def prefill(
    params: Dict[str, Any],
    cfg: ModelConfig,
    tokens: jax.Array,  # [B, T]
    cache: QuantizedKVCache,
) -> Tuple[jax.Array, QuantizedKVCache]:
    """Run the prompt through the model, filling cache[0:T).

    Returns (last-token logits [B, V], cache)."""
    logits, cache = forward(params, cfg, tokens, cache, pos=jnp.int32(0))
    return logits[:, -1, :], cache


@partial(jax.jit, static_argnames=("cfg",))
def decode_step(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token: jax.Array,  # [B, 1]
    cache: QuantizedKVCache,
    pos: jax.Array,  # scalar int32: index where this token is written
) -> Tuple[jax.Array, QuantizedKVCache]:
    logits, cache = forward(params, cfg, token, cache, pos=pos)
    return logits[:, -1, :], cache


def greedy_generate(
    params: Dict[str, Any],
    cfg: ModelConfig,
    prompt: jax.Array,  # [B, T]
    max_new_tokens: int,
    max_seq: Optional[int] = None,
    quantized_kv: bool = True,
    eos_token_id: Optional[int] = None,
) -> jax.Array:
    """Greedy decode. Returns [B, T + max_new_tokens] token ids.

    The decode loop is a host loop around a single compiled step (the
    step itself contains the full layer stack); sampling is argmax as in
    the reference chat plugin's default path.
    """
    B, T = prompt.shape
    max_seq = max_seq or (T + max_new_tokens)
    cache = make_cache(cfg, B, max_seq, quantized_kv)
    logits, cache = prefill(params, cfg, prompt, cache)
    out = [prompt]
    token = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
    finished = jnp.zeros((B,), bool)
    for i in range(max_new_tokens):
        out.append(token)
        if eos_token_id is not None:
            finished = finished | (token[:, 0] == eos_token_id)
            if bool(jnp.all(finished)):
                break
        if i == max_new_tokens - 1:
            break
        logits, cache = decode_step(
            params, cfg, token, cache, jnp.int32(T + i)
        )
        token = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
        # Host-sync each step: backends with high dispatch latency (e.g.
        # the axon TPU tunnel) degrade badly when dependent executions
        # queue unsynced. Bulk decoding should use decode_loop (one
        # dispatch for N tokens) instead of this convenience loop.
        token.block_until_ready()
    return jnp.concatenate(out, axis=1)


def sample_generate(
    params: Dict[str, Any],
    cfg: ModelConfig,
    prompt: jax.Array,  # [B, T]
    max_new_tokens: int,
    sampling: "SamplingParams" = None,  # noqa: F821 — models.sampling
    max_seq: Optional[int] = None,
    quantized_kv: bool = True,
) -> jax.Array:
    """Stochastic decode (temperature / top-k / top-p) — one on-device
    decode_loop dispatch. Returns [B, T + max_new_tokens] token ids.
    ``sampling=None`` (or temperature<=0) degrades to greedy. Same
    sampling params apply to every row; per-row mixing is the serving
    engine's job (serve.engine Request.sampling)."""
    from ..models.decode_loop import decode_loop
    from .sampling import SamplingParams, params_arrays, sample_logits

    sp = sampling or SamplingParams()
    B, T = prompt.shape
    max_seq = max_seq or (T + max_new_tokens)
    cache = make_cache(cfg, B, max_seq, quantized_kv)
    logits, cache = prefill(params, cfg, prompt, cache)
    t, k, p = params_arrays([sp] * B)
    key = jax.random.key(sp.seed)
    first = sample_logits(logits, jax.random.fold_in(key, T - 1), t, k, p)
    toks, _ = decode_loop(
        params,
        cfg,
        first[:, None],
        cache,
        jnp.int32(T),
        max_new_tokens - 1,
        sampling=(t, k, p),
        key=key,
    )
    return jnp.concatenate([prompt, first[:, None], toks], axis=1)
