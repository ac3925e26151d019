"""Speculative decoding with n-gram (prompt-lookup) drafts — exact greedy.

Beyond-reference serving feature (the reference decodes strictly one
token per forward, chatcli/generation.py:65-115). Each round drafts
``gamma`` tokens by looking up the longest recent n-gram match in the
token history (prompt + generated so far), verifies them with ONE
forward over [last_token, draft...] (gamma+1 positions), and accepts
the longest prefix that agrees with the model's own argmax — plus the
model's "bonus" token at the first disagreement. Greedy outputs are
therefore EXACTLY the non-speculative greedy stream; speedup comes from
amortizing the per-token weight read over accepted drafts (decode is
HBM-bound, so a verified draft token is nearly free).

TPU design notes:
  * everything is static-shaped: the drafts, the verify forward
    ([B, gamma+1]), the output buffer; a lax.while_loop runs until every
    row has emitted ``steps`` tokens (each round emits >= 1/row).
  * rejected drafts leave stale KV entries at [pos+a+1, pos+gamma]; the
    next round's write starts at pos+a+1 and spans gamma+1 >= the stale
    range, and forward writes the cache BEFORE attending, so staleness
    is never visible (the mask additionally hides everything > q_pos).
  * n-gram matching is a vectorized scan over the history buffer — no
    host round trips, no dynamic shapes.

Works with the quantized KV cache's per-position scales (a chunked
write quantizes each position independently, so spec and non-spec
caches are bit-identical). Ring caches are not supported (the ring
append assumes strictly sequential single-token decode).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .llama import ModelConfig, forward

__all__ = [
    "ngram_draft",
    "speculative_decode_loop",
    "speculative_generate",
    "draft_speculative_decode_loop",
    "draft_speculative_generate",
]


def ngram_draft(
    history: jax.Array,  # [B, H] int32 tokens (prompt + generated)
    hist_len: jax.Array,  # [B] int32 valid length (>= 1)
    gamma: int,
    ngram: int = 2,
) -> jax.Array:
    """[B, gamma] drafts: continue the most recent earlier occurrence of
    the trailing (ngram-1)-gram; fall back to repeating the last token
    when no match exists. Pure function of the visible history."""
    B, H = history.shape
    idx = jnp.arange(H)[None, :]  # [1, H]

    # ok[b, j]: history[b, j-t] == history[b, hlen-1-t] for t<ngram-1
    ok = jnp.ones((B, H), bool)
    for t in range(ngram - 1):
        key_t = jnp.take_along_axis(
            history, jnp.maximum(hist_len - 1 - t, 0)[:, None], axis=1
        )  # [B, 1]
        shifted = jnp.take_along_axis(
            history, jnp.maximum(idx - t, 0).repeat(B, axis=0), axis=1
        )
        ok &= (shifted == key_t) & (idx >= t)
    # j must end strictly before the trailing key itself
    valid = ok & (idx < (hist_len - 1)[:, None])
    j = jnp.max(jnp.where(valid, idx, -1), axis=1)  # [B]
    found = j >= 0

    start = jnp.clip(j + 1, 0, H - gamma)
    gather = start[:, None] + jnp.arange(gamma)[None, :]
    draft = jnp.take_along_axis(history, gather, axis=1)  # [B, gamma]
    last = jnp.take_along_axis(
        history, jnp.maximum(hist_len - 1, 0)[:, None], axis=1
    )
    return jnp.where(found[:, None], draft, last).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cfg", "steps", "gamma", "ngram"))
def speculative_decode_loop(
    params,
    cfg: ModelConfig,
    token: jax.Array,  # [B, 1] int32 — last emitted token (in history)
    cache,
    pos0: jax.Array,  # [B] or scalar int32 — token's cache position
    steps: int,
    history: jax.Array,  # [B, H] with the prompt + token already placed
    hist_len: jax.Array,  # [B] int32
    gamma: int = 4,
    ngram: int = 2,
) -> Tuple[jax.Array, object, jax.Array]:
    """Greedy-decode >= ``steps`` tokens with n-gram speculation.

    Returns (tokens [B, steps] — exactly the greedy stream, cache,
    rounds — the number of verify forwards used; rounds/steps < 1 means
    speculation paid off)."""
    if getattr(cache, "ring_k", None) is not None:
        raise ValueError("speculative decode does not support ring caches")
    B, H = history.shape
    if H < steps + gamma + 1:
        raise ValueError(
            f"history buffer too small: need >= hist_len + steps + gamma "
            f"({H} < {steps + gamma + 1} beyond the prompt)"
        )
    pos0 = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32), (B,))
    outbuf = jnp.zeros((B, steps + gamma + 1), jnp.int32)
    cursor = jnp.zeros((B,), jnp.int32)
    rounds = jnp.int32(0)

    def body2(st):
        token, cache, pos, history, hist_len, cursor, rounds, outbuf = st
        draft = ngram_draft(history, hist_len, gamma, ngram)
        seq = jnp.concatenate([token, draft], axis=1)
        logits, cache = forward(params, cfg, seq, cache, pos=pos)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        match = (draft == nxt[:, :-1]).astype(jnp.int32)
        acc = jnp.cumprod(match, axis=1).sum(axis=1)
        emit_len = acc + 1

        def write_row(buf, emit, at):
            return jax.lax.dynamic_update_slice(buf, emit, (at,))

        outbuf = jax.vmap(write_row)(outbuf, nxt, cursor)
        history = jax.vmap(write_row)(history, nxt, hist_len)
        token = jnp.take_along_axis(nxt, acc[:, None], axis=1)  # [B, 1]
        return (
            token,
            cache,
            pos + emit_len,
            history,
            hist_len + emit_len,
            cursor + emit_len,
            rounds + 1,
            outbuf,
        )

    def cond2(st):
        return jnp.min(st[5]) < steps

    st = (token, cache, pos0, history, hist_len, cursor, rounds, outbuf)
    token, cache, pos, history, hist_len, cursor, rounds, outbuf = (
        jax.lax.while_loop(cond2, body2, st)
    )
    return outbuf[:, :steps], cache, rounds


def speculative_generate(
    params,
    cfg: ModelConfig,
    prompt: jax.Array,  # [B, T]
    max_new_tokens: int,
    max_seq: Optional[int] = None,
    quantized_kv: bool = True,
    gamma: int = 4,
    ngram: int = 2,
) -> Tuple[jax.Array, int]:
    """Prefill + speculative greedy decode. Returns
    ([B, T + max_new_tokens] ids — identical to greedy_generate — and
    the number of verify forwards used)."""
    from .generate import make_cache, prefill

    B, T = prompt.shape
    # gamma+1 writes per round may run past the last emitted position
    max_seq = max_seq or (T + max_new_tokens)
    cache = make_cache(cfg, B, max_seq + gamma + 1, quantized_kv)
    logits, cache = prefill(params, cfg, prompt, cache)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]

    Hbuf = T + max_new_tokens + gamma + 1
    history = jnp.zeros((B, Hbuf), jnp.int32)
    history = jax.lax.dynamic_update_slice(history, prompt, (0, 0))
    history = jax.lax.dynamic_update_slice(history, first, (0, T))
    hist_len = jnp.full((B,), T + 1, jnp.int32)

    toks, _, rounds = speculative_decode_loop(
        params,
        cfg,
        first,
        cache,
        jnp.full((B,), T, jnp.int32),
        max_new_tokens - 1,
        history,
        hist_len,
        gamma=gamma,
        ngram=ngram,
    )
    out = jnp.concatenate([prompt, first, toks], axis=1)
    return out, int(rounds) + 1  # + the prefill's first token


@partial(
    jax.jit, static_argnames=("cfg", "draft_cfg", "steps", "gamma")
)
def draft_speculative_decode_loop(
    params,
    cfg: ModelConfig,
    draft_params,
    draft_cfg: ModelConfig,
    token: jax.Array,  # [B, 1] int32 — last emitted token
    cache,
    draft_cache,
    pos0: jax.Array,  # [B] or scalar int32
    steps: int,
    gamma: int = 4,
) -> Tuple[jax.Array, object, object, jax.Array]:
    """Greedy decode with a DRAFT MODEL proposing gamma tokens per round
    (classic two-model speculation; the n-gram variant above needs no
    draft). Per round: gamma sequential draft-model steps (cheap — the
    draft's weights are small), ONE target forward over gamma+1
    positions, exact greedy acceptance. Both KV caches stay consistent:
    accepted positions hold real tokens in both; stale draft/target
    entries from rejected proposals are overwritten by the next round's
    writes before any attention can see them (same argument as the
    n-gram loop). Vocabularies must match.

    Returns (tokens [B, steps] — exactly the target's greedy stream,
    cache, draft_cache, rounds)."""
    for c in (cache, draft_cache):
        if getattr(c, "ring_k", None) is not None:
            raise ValueError(
                "speculative decode does not support ring caches"
            )
    B = token.shape[0]
    pos0 = jnp.broadcast_to(jnp.asarray(pos0, jnp.int32), (B,))
    outbuf = jnp.zeros((B, steps + gamma + 1), jnp.int32)
    cursor = jnp.zeros((B,), jnp.int32)

    def body(st):
        token, cache, dcache, pos, cursor, rounds, outbuf = st

        def draft_step(carry, i):
            tok, dcache = carry
            dlogits, dcache = forward(
                draft_params, draft_cfg, tok, dcache, pos=pos + i
            )
            nxt = jnp.argmax(dlogits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt[:, None], dcache), nxt

        (_, dcache), draft = jax.lax.scan(
            draft_step, (token, dcache), jnp.arange(gamma)
        )
        draft = draft.T  # [B, gamma]
        seq = jnp.concatenate([token, draft], axis=1)
        logits, cache = forward(params, cfg, seq, cache, pos=pos)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        match = (draft == nxt[:, :-1]).astype(jnp.int32)
        acc = jnp.cumprod(match, axis=1).sum(axis=1)
        # cap at gamma-1: the draft chain only wrote ITS OWN KV for the
        # gamma fed tokens [token, d1..d_{gamma-1}] at pos..pos+gamma-1;
        # accepting all gamma drafts would leave the draft cache with a
        # permanent hole at pos+gamma (the next round's writes start at
        # pos+gamma+1 and never rewrite it)
        acc = jnp.minimum(acc, gamma - 1)
        emit_len = acc + 1

        def write_row(buf, emit, at):
            return jax.lax.dynamic_update_slice(buf, emit, (at,))

        outbuf = jax.vmap(write_row)(outbuf, nxt, cursor)
        token = jnp.take_along_axis(nxt, acc[:, None], axis=1)
        return (
            token,
            cache,
            dcache,
            pos + emit_len,
            cursor + emit_len,
            rounds + 1,
            outbuf,
        )

    def cond(st):
        return jnp.min(st[4]) < steps

    st = (token, cache, draft_cache, pos0, cursor, jnp.int32(0), outbuf)
    token, cache, draft_cache, pos, cursor, rounds, outbuf = (
        jax.lax.while_loop(cond, body, st)
    )
    return outbuf[:, :steps], cache, draft_cache, rounds


def draft_speculative_generate(
    params,
    cfg: ModelConfig,
    draft_params,
    draft_cfg: ModelConfig,
    prompt: jax.Array,  # [B, T]
    max_new_tokens: int,
    max_seq: Optional[int] = None,
    quantized_kv: bool = True,
    gamma: int = 4,
) -> Tuple[jax.Array, int]:
    """Prefill both models + draft-model speculative greedy decode.
    Returns ([B, T + max_new_tokens] ids — identical to the target's
    greedy_generate — and the number of target forwards used)."""
    from .generate import make_cache, prefill

    B, T = prompt.shape
    max_seq = max_seq or (T + max_new_tokens)
    cache = make_cache(cfg, B, max_seq + gamma + 1, quantized_kv)
    dcache = make_cache(draft_cfg, B, max_seq + gamma + 1, quantized_kv)
    logits, cache = prefill(params, cfg, prompt, cache)
    _, dcache = prefill(draft_params, draft_cfg, prompt, dcache)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]

    toks, _, _, rounds = draft_speculative_decode_loop(
        params,
        cfg,
        draft_params,
        draft_cfg,
        first,
        cache,
        dcache,
        jnp.full((B,), T, jnp.int32),
        max_new_tokens - 1,
        gamma=gamma,
    )
    out = jnp.concatenate([prompt, first, toks], axis=1)
    return out, int(rounds) + 1
