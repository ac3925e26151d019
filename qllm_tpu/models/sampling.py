"""Token sampling: temperature / top-k / top-p (nucleus), fully on-device.

Beyond-reference feature: the reference's chat loop is greedy-only
(plugin/chatcli/generation.py:65-115 — argmax per step). A serving
framework needs stochastic sampling, so this module provides it the
XLA way: one vectorized [B, V] pass (a single descending sort serves
both the top-k threshold and the nucleus cumulative mass), per-row
parameters as arrays so one compiled step serves a continuous batch of
requests with different settings, and a counter-derived PRNG key so the
scan stays functional.

Rules (matching the de-facto HF/vLLM semantics):
  * temperature <= 0  -> greedy argmax for that row (top-k/p ignored)
  * top_k == 0        -> no top-k truncation
  * top_p >= 1        -> no nucleus truncation
  * the nucleus is the SMALLEST prefix of descending-prob tokens with
    cumulative probability >= top_p (the argmax token always survives)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["SamplingParams", "sample_logits", "params_arrays"]

_NEG = -1e30


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration (0-temperature = greedy)."""

    temperature: float = 0.0
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0

    @property
    def greedy(self) -> bool:
        return self.temperature <= 0.0


def params_arrays(params_list):
    """Stack a list of SamplingParams (or None = greedy) into the
    (temperature [B], top_k [B], top_p [B]) arrays sample_logits takes."""
    ps = [p or SamplingParams() for p in params_list]
    return (
        jnp.asarray([p.temperature for p in ps], jnp.float32),
        jnp.asarray([p.top_k for p in ps], jnp.int32),
        jnp.asarray([p.top_p for p in ps], jnp.float32),
    )


def sample_logits(
    logits: jax.Array,  # [B, V] f32
    key: jax.Array,
    temperature: jax.Array,  # [B] f32; <=0 -> greedy row
    top_k: Optional[jax.Array] = None,  # [B] int32; 0 -> off
    top_p: Optional[jax.Array] = None,  # [B] f32; >=1 -> off
) -> jax.Array:
    """Sample one token per row. Returns [B] int32.

    One descending sort per row feeds both truncations: the top-k
    threshold is the k-th sorted logit, the nucleus threshold is the
    logit at the smallest index whose inclusive cumulative softmax mass
    reaches top_p. Tokens strictly below max(thresholds) are masked and
    the survivor distribution is sampled with the Gumbel trick
    (jax.random.categorical)."""
    B, V = logits.shape
    lf = logits.astype(jnp.float32)
    greedy_tok = jnp.argmax(lf, axis=-1).astype(jnp.int32)
    temperature = temperature.astype(jnp.float32)
    is_greedy = temperature <= 0.0

    # scale first so the sort is reusable for the nucleus mass
    lt = lf / jnp.maximum(temperature, 1e-6)[:, None]
    sl = -jnp.sort(-lt, axis=-1)  # [B, V] descending

    thresh = jnp.full((B,), _NEG, jnp.float32)
    if top_k is not None:
        k = jnp.where(top_k > 0, top_k, V)
        k = jnp.clip(k, 1, V)
        kth = jnp.take_along_axis(sl, (k - 1)[:, None], axis=-1)[:, 0]
        thresh = jnp.maximum(thresh, kth)
    if top_p is not None:
        probs = jax.nn.softmax(sl, axis=-1)
        csum = jnp.cumsum(probs, axis=-1)
        # smallest prefix with inclusive mass >= top_p; index 0 always in
        reached = csum >= jnp.minimum(top_p, 1.0)[:, None]
        # first True position -> nucleus boundary logit
        idx = jnp.argmax(reached, axis=-1)
        idx = jnp.where(jnp.any(reached, axis=-1), idx, V - 1)
        pth = jnp.take_along_axis(sl, idx[:, None], axis=-1)[:, 0]
        on = top_p < 1.0
        thresh = jnp.maximum(thresh, jnp.where(on, pth, _NEG))

    masked = jnp.where(lt >= thresh[:, None], lt, _NEG)
    sampled = jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
    return jnp.where(is_greedy, greedy_tok, sampled)
