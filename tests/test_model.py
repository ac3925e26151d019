"""Functional Llama model: shapes, cache-vs-full-forward parity, generation."""

import jax
import jax.numpy as jnp
import numpy as np

from qllm_tpu.models import (
    TINY_LLAMA_TEST_CONFIG,
    decode_step,
    forward,
    greedy_generate,
    init_params,
    prefill,
)
from qllm_tpu.models.generate import make_cache

CFG = TINY_LLAMA_TEST_CONFIG


def _params():
    return init_params(CFG, jax.random.key(0))


def test_forward_shapes():
    params = _params()
    tokens = jnp.zeros((2, 8), jnp.int32)
    logits, cache = forward(params, CFG, tokens)
    assert logits.shape == (2, 8, CFG.vocab_size)
    assert logits.dtype == jnp.float32
    assert cache is None


def test_prefill_decode_matches_full_forward():
    """logits from incremental decode must match the full causal forward
    — the KV-cache correctness gate."""
    params = _params()
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 12)), jnp.int32)

    full_logits, _ = forward(params, CFG, tokens)

    # bf16 KV cache (quantized=False) to isolate cache bookkeeping
    cache = make_cache(CFG, 1, 16, quantized_kv=False)
    last, cache = prefill(params, CFG, tokens[:, :8], cache)
    np.testing.assert_allclose(
        np.asarray(last), np.asarray(full_logits[:, 7]), atol=2e-2, rtol=2e-2
    )
    for i in range(8, 12):
        step_logits, cache = decode_step(
            params, CFG, tokens[:, i : i + 1], cache, jnp.int32(i)
        )
        np.testing.assert_allclose(
            np.asarray(step_logits),
            np.asarray(full_logits[:, i]),
            atol=2e-2,
            rtol=2e-2,
        )


def test_int8_kv_cache_decode_close():
    params = _params()
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 10)), jnp.int32)
    full_logits, _ = forward(params, CFG, tokens)
    cache = make_cache(CFG, 1, 16, quantized_kv=True)
    last, cache = prefill(params, CFG, tokens[:, :9], cache)
    step_logits, _ = decode_step(
        params, CFG, tokens[:, 9:10], cache, jnp.int32(9)
    )
    # int8 KV adds noise; argmax should almost always survive
    assert (
        np.argmax(np.asarray(step_logits)) == np.argmax(np.asarray(full_logits[:, 9]))
        or np.max(
            np.abs(np.asarray(step_logits) - np.asarray(full_logits[:, 9]))
        )
        < 0.3
    )


def test_greedy_generate():
    params = _params()
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out = greedy_generate(params, CFG, prompt, max_new_tokens=6)
    assert out.shape == (1, 10)
    out2 = greedy_generate(params, CFG, prompt, max_new_tokens=6)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_gqa_grouping():
    assert CFG.n_rep == 2  # test config exercises GQA


def test_attention_bias_config():
    cfg = jax.tree_util.tree_structure  # noqa: F841  (placeholder)
    import dataclasses

    qcfg = dataclasses.replace(CFG, attention_bias=True)
    params = init_params(qcfg, jax.random.key(1))
    assert "q_proj_bias" in params["layers"][0]
    logits, _ = forward(params, qcfg, jnp.zeros((1, 4), jnp.int32))
    assert logits.shape == (1, 4, qcfg.vocab_size)
