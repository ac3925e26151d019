"""llama.cpp-style sliding-window perplexity.

Port of the *semantics* of reference plugin/perplexity_utils.py:97-201
(the accuracy gate for the whole framework): the token stream is cut
into n_ctx-long chunks; each chunk is scored with a causal forward; only
the second half of each chunk contributes NLL (the first half is
context warm-up); ppl = exp(mean NLL).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import ModelConfig, forward

__all__ = ["perplexity_from_ids", "Perplexity"]


def _chunk_nll(params, cfg, chunk: jax.Array) -> jax.Array:
    """chunk [1, n_ctx] -> (sum_nll, count) over the second half."""
    logits, _ = forward(params, cfg, chunk, cache=None)
    logits = logits.astype(jnp.float32)
    n_ctx = chunk.shape[1]
    start = n_ctx // 2
    # logits[:, j-1] predicts chunk[:, j]
    lp = jax.nn.log_softmax(logits[:, start - 1 : n_ctx - 1], axis=-1)
    targets = chunk[:, start:n_ctx]
    nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll), nll.size


_chunk_nll_jit = jax.jit(_chunk_nll, static_argnames=("cfg",))


def perplexity_from_ids(
    params: Dict[str, Any],
    cfg: ModelConfig,
    token_ids: np.ndarray,
    n_ctx: int = 512,
    max_chunks: Optional[int] = None,
    progress: bool = False,
) -> float:
    """Perplexity of a flat token stream (reference: 512-token contexts,
    second-half NLL, perplexity_utils.py:97-132)."""
    token_ids = np.asarray(token_ids).reshape(-1)
    n_chunks = len(token_ids) // n_ctx
    if max_chunks is not None:
        n_chunks = min(n_chunks, max_chunks)
    if n_chunks == 0:
        raise ValueError(f"need at least {n_ctx} tokens, got {len(token_ids)}")
    total, count = 0.0, 0
    for i in range(n_chunks):
        chunk = jnp.asarray(
            token_ids[i * n_ctx : (i + 1) * n_ctx][None, :], jnp.int32
        )
        nll, c = _chunk_nll_jit(params, cfg, chunk)
        total += float(nll)
        count += int(c)
        if progress:
            print(
                f"[ppl] chunk {i + 1}/{n_chunks} "
                f"running ppl={np.exp(total / count):.4f}",
                flush=True,
            )
    return float(np.exp(total / count))


class Perplexity:
    """Object-style wrapper mirroring the reference class shape
    (plugin/perplexity_utils.py:10-224)."""

    def __init__(self, params, cfg, tokenizer=None, n_ctx: int = 512):
        self.params, self.cfg, self.tokenizer, self.n_ctx = (
            params,
            cfg,
            tokenizer,
            n_ctx,
        )

    def calculate_perplexity(self, text: Optional[str] = None, token_ids=None):
        if token_ids is None:
            if self.tokenizer is None or text is None:
                raise ValueError("need token_ids or (tokenizer and text)")
            token_ids = self.tokenizer(text, return_tensors="np").input_ids[0]
        return perplexity_from_ids(
            self.params, self.cfg, token_ids, n_ctx=self.n_ctx, progress=True
        )
