"""Sampling (temperature / top-k / top-p): unit semantics + engine wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, greedy_generate, init_params
from qllm_tpu.models.generate import sample_generate
from qllm_tpu.models.sampling import SamplingParams, params_arrays, sample_logits
from qllm_tpu.serve import ContinuousBatchingEngine, ServeConfig

CFG = TINY_LLAMA_TEST_CONFIG


def _logits(rows):
    return jnp.asarray(np.array(rows, np.float32))


def test_zero_temperature_is_greedy():
    lg = _logits([[0.1, 2.0, -1.0, 0.5], [3.0, 0.0, 0.0, 0.0]])
    t, k, p = params_arrays([SamplingParams(0.0), None])
    for seed in range(5):
        out = sample_logits(lg, jax.random.key(seed), t, k, p)
        np.testing.assert_array_equal(np.asarray(out), [1, 0])


def test_top_k_1_is_greedy():
    lg = _logits([[0.1, 2.0, -1.0, 0.5]])
    t, k, p = params_arrays([SamplingParams(temperature=1.0, top_k=1)])
    for seed in range(8):
        out = sample_logits(lg, jax.random.key(seed), t, k, p)
        assert int(out[0]) == 1


def test_top_k_restricts_support():
    rng = np.random.default_rng(0)
    lg = _logits([rng.normal(size=32)])
    top3 = set(np.argsort(np.asarray(lg)[0])[-3:].tolist())
    t, k, p = params_arrays([SamplingParams(temperature=2.0, top_k=3)])
    seen = set()
    for seed in range(64):
        seen.add(int(sample_logits(lg, jax.random.key(seed), t, k, p)[0]))
    assert seen <= top3
    assert len(seen) >= 2  # hot temperature actually explores the set


def test_top_p_nucleus_restricts_support():
    # softmax of [5, 4, 0*6]: p0~0.710, p1~0.261 -> nucleus(0.7) = {0},
    # nucleus(0.9) = {0, 1}
    lg = _logits([[5.0, 4.0] + [0.0] * 6])
    t, k, p = params_arrays([SamplingParams(temperature=1.0, top_p=0.7)])
    for seed in range(16):
        assert int(sample_logits(lg, jax.random.key(seed), t, k, p)[0]) == 0
    t, k, p = params_arrays([SamplingParams(temperature=1.0, top_p=0.9)])
    seen = {
        int(sample_logits(lg, jax.random.key(s), t, k, p)[0])
        for s in range(64)
    }
    assert seen == {0, 1}


def test_mixed_rows_independent():
    """Greedy and sampled rows coexist in one call."""
    rng = np.random.default_rng(1)
    lg = _logits(rng.normal(size=(3, 16)))
    t, k, p = params_arrays(
        [None, SamplingParams(5.0), SamplingParams(temperature=1.0, top_k=1)]
    )
    greedy = np.argmax(np.asarray(lg), axis=-1)
    outs = set()
    for seed in range(32):
        out = np.asarray(sample_logits(lg, jax.random.key(seed), t, k, p))
        assert out[0] == greedy[0] and out[2] == greedy[2]
        outs.add(int(out[1]))
    assert len(outs) > 1  # the hot row really samples


def test_same_key_deterministic():
    rng = np.random.default_rng(2)
    lg = _logits(rng.normal(size=(2, 64)))
    t, k, p = params_arrays([SamplingParams(1.0)] * 2)
    a = sample_logits(lg, jax.random.key(7), t, k, p)
    b = sample_logits(lg, jax.random.key(7), t, k, p)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sample_generate_greedy_params_matches_greedy():
    params = init_params(CFG, jax.random.key(0))
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    ref = greedy_generate(params, CFG, prompt, max_new_tokens=6, max_seq=32)
    out = sample_generate(
        params, CFG, prompt, max_new_tokens=6, sampling=None, max_seq=32
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_sample_generate_seeded_reproducible():
    params = init_params(CFG, jax.random.key(0))
    prompt = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    sp = SamplingParams(temperature=1.0, top_k=50, seed=3)
    a = sample_generate(params, CFG, prompt, 8, sampling=sp, max_seq=32)
    b = sample_generate(params, CFG, prompt, 8, sampling=sp, max_seq=32)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    hot = SamplingParams(temperature=8.0, seed=4)
    c = sample_generate(params, CFG, prompt, 8, sampling=hot, max_seq=32)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_decode_loop_sampling_requires_key():
    from qllm_tpu.models.decode_loop import decode_loop
    from qllm_tpu.models.generate import make_cache

    params = init_params(CFG, jax.random.key(0))
    cache = make_cache(CFG, 1, 16)
    t, k, p = params_arrays([SamplingParams(1.0)])
    with pytest.raises(ValueError, match="PRNG key"):
        decode_loop(
            params,
            CFG,
            jnp.ones((1, 1), jnp.int32),
            cache,
            jnp.int32(4),
            4,
            sampling=(t, k, p),
        )


def test_engine_mixed_sampling_keeps_greedy_rows_exact():
    """A sampled request in the batch must not perturb a greedy one."""
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(3)
    p_greedy = rng.integers(1, CFG.vocab_size, size=5).astype(np.int32)
    p_hot = rng.integers(1, CFG.vocab_size, size=7).astype(np.int32)
    engine = ContinuousBatchingEngine(
        params, CFG, ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(16,))
    )
    rg = engine.submit(p_greedy, max_new_tokens=6)
    rh = engine.submit(
        p_hot, max_new_tokens=6, sampling=SamplingParams(temperature=2.0)
    )
    engine.run()
    ref = greedy_generate(
        params, CFG, jnp.asarray(p_greedy[None]), 6, max_seq=64
    )
    assert rg.output == np.asarray(ref)[0, len(p_greedy):].tolist()
    assert len(rh.output) == 6


def test_engine_top_k1_sampled_equals_greedy():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(4)
    p = rng.integers(1, CFG.vocab_size, size=6).astype(np.int32)
    engine = ContinuousBatchingEngine(
        params, CFG, ServeConfig(max_batch=1, max_seq=64, prefill_buckets=(16,))
    )
    r = engine.submit(
        p, max_new_tokens=5, sampling=SamplingParams(temperature=1.0, top_k=1)
    )
    engine.run()
    ref = greedy_generate(params, CFG, jnp.asarray(p[None]), 5, max_seq=64)
    assert r.output == np.asarray(ref)[0, len(p):].tolist()


def test_engine_chunked_sampled_deterministic_by_seed():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(5)
    p = rng.integers(1, CFG.vocab_size, size=6).astype(np.int32)

    def run(seed):
        engine = ContinuousBatchingEngine(
            params,
            CFG,
            ServeConfig(
                max_batch=2, max_seq=64, prefill_buckets=(16,),
                decode_chunk=4, seed=seed,
            ),
        )
        r = engine.submit(
            p, max_new_tokens=8, sampling=SamplingParams(temperature=1.5)
        )
        engine.run()
        return r.output

    assert run(11) == run(11)
    assert run(11) != run(12)
