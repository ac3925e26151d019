"""Fused int8-KV decode attention vs the XLA reference (interpret mode)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.ops.kv_cache import QuantizedKVCache
from qllm_tpu.ops.pallas_attention import decode_attention_pallas


def _ref_attention(q, k, v, lengths):
    """q [B,H,d], k/v [B,H_kv,S,d] float, per-batch lengths."""
    B, H, d = q.shape
    Hkv = k.shape[1]
    n_rep = H // Hkv
    k = np.repeat(k, n_rep, axis=1)
    v = np.repeat(v, n_rep, axis=1)
    scores = np.einsum("bhd,bhsd->bhs", q, k) / np.sqrt(d)
    S = k.shape[2]
    mask = np.arange(S)[None, None, :] < lengths[:, None, None]
    scores = np.where(mask, scores, -np.inf)
    scores -= scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p /= p.sum(axis=-1, keepdims=True)
    return np.einsum("bhs,bhsd->bhd", p, v)


@pytest.mark.parametrize("n_rep", [1, 2, 4])
def test_decode_attention_matches_reference(n_rep):
    rng = np.random.default_rng(0)
    B, Hkv, S, d = 2, 2, 128, 128
    H = Hkv * n_rep
    q = rng.normal(size=(B, H, d)).astype(np.float32)
    k = (rng.integers(-127, 128, (B, Hkv, S, d))).astype(np.int8)
    v = (rng.integers(-127, 128, (B, Hkv, S, d))).astype(np.int8)
    ks = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    vs = rng.uniform(0.005, 0.02, (B, Hkv, S)).astype(np.float32)
    lengths = np.array([100, 37], np.int32)

    out = np.asarray(
        decode_attention_pallas(
            jnp.asarray(q),
            jnp.asarray(k),
            jnp.asarray(v),
            jnp.asarray(ks),
            jnp.asarray(vs),
            jnp.asarray(lengths),
        )
    )
    ref = _ref_attention(
        q,
        k.astype(np.float32) * ks[..., None],
        v.astype(np.float32) * vs[..., None],
        lengths,
    )
    np.testing.assert_allclose(out, ref, atol=2e-2, rtol=2e-2)


def test_model_decode_with_pallas_attention_matches_xla():
    """Full decode step through the model with the kernel forced on."""
    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG as CFG
    from qllm_tpu.models import init_params, prefill
    from qllm_tpu.models.generate import decode_step, make_cache

    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 9)), jnp.int32)
    cache = make_cache(CFG, 1, 128, quantized_kv=True)
    last, cache = prefill(params, CFG, tokens[:, :8], cache)

    os.environ["QLLM_TPU_FORCE_PALLAS_ATTN"] = "1"
    try:
        lp, _ = decode_step(
            params, CFG, tokens[:, 8:9], cache, jnp.int32(8)
        )
    finally:
        del os.environ["QLLM_TPU_FORCE_PALLAS_ATTN"]
    lx, _ = decode_step(params, CFG, tokens[:, 8:9], cache, jnp.int32(8))
    np.testing.assert_allclose(
        np.asarray(lp), np.asarray(lx), atol=5e-2, rtol=5e-2
    )
