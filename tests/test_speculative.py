"""Speculative decoding: exact greedy equivalence + draft mechanics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, greedy_generate, init_params
from qllm_tpu.models.speculative import (
    ngram_draft,
    speculative_decode_loop,
    speculative_generate,
)

CFG = TINY_LLAMA_TEST_CONFIG


def test_ngram_draft_continues_last_match():
    #            0  1  2  3  4  5  6  7
    hist = jnp.asarray([[5, 9, 7, 3, 5, 9, 4, 0]], jnp.int32)
    # trailing bigram key (ngram=2) is "9" at index 5; the earlier 9 is
    # at index 1 -> draft continues with history[2:5] = 7, 3, 5
    d = ngram_draft(hist, jnp.asarray([6]), gamma=3, ngram=2)
    np.testing.assert_array_equal(np.asarray(d), [[7, 3, 5]])


def test_ngram_draft_trigram_key():
    #            0  1  2  3  4  5  6  7  8
    hist = jnp.asarray([[1, 2, 3, 8, 9, 1, 2, 3, 0]], jnp.int32)
    # ngram=3 key = (2, 3) ending at index 7; earlier occurrence ends at
    # index 2 -> draft = history[3:5] = 8, 9
    d = ngram_draft(hist, jnp.asarray([8]), gamma=2, ngram=3)
    np.testing.assert_array_equal(np.asarray(d), [[8, 9]])


def test_ngram_draft_no_match_repeats_last():
    hist = jnp.asarray([[1, 2, 3, 4, 0, 0]], jnp.int32)
    d = ngram_draft(hist, jnp.asarray([4]), gamma=3, ngram=2)
    np.testing.assert_array_equal(np.asarray(d), [[4, 4, 4]])


@pytest.mark.parametrize("gamma,ngram", [(4, 2), (2, 3)])
def test_speculative_equals_greedy(gamma, ngram):
    """THE contract: speculative greedy output == plain greedy output."""
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(0)
    for trial in range(3):
        T = int(rng.integers(4, 10))
        prompt = jnp.asarray(
            rng.integers(1, CFG.vocab_size, (1, T)), jnp.int32
        )
        n = 12
        ref = greedy_generate(params, CFG, prompt, n, max_seq=64)
        out, rounds = speculative_generate(
            params, CFG, prompt, n, max_seq=64, gamma=gamma, ngram=ngram
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
        assert 1 <= rounds <= n


def test_speculative_batched_rows_independent():
    params = init_params(CFG, jax.random.key(1))
    rng = np.random.default_rng(1)
    prompts = jnp.asarray(rng.integers(1, CFG.vocab_size, (3, 6)), jnp.int32)
    n = 10
    out, _ = speculative_generate(params, CFG, prompts, n, max_seq=64)
    for b in range(3):
        ref = greedy_generate(params, CFG, prompts[b : b + 1], n, max_seq=64)
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(ref)[0])


def test_speculative_accepts_on_repetitive_prompt():
    """A looping greedy stream must be accelerated: rounds << steps."""
    params = init_params(CFG, jax.random.key(0))
    prompt = jnp.asarray([[7, 8, 7, 8, 7, 8, 7, 8]], jnp.int32)
    n = 16
    ref = greedy_generate(params, CFG, prompt, n, max_seq=64)
    out, rounds = speculative_generate(
        params, CFG, prompt, n, max_seq=64, gamma=4
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # random tiny models often fall into cycles; only assert the hard
    # bound (every round emits >= 1) plus the exactness above
    assert rounds <= n


def test_speculative_rejects_ring_cache():
    from qllm_tpu.models.generate import make_cache

    params = init_params(CFG, jax.random.key(0))
    cache = make_cache(CFG, 1, 32, ring=True)
    hist = jnp.zeros((1, 32), jnp.int32)
    with pytest.raises(ValueError, match="ring"):
        speculative_decode_loop(
            params,
            CFG,
            jnp.ones((1, 1), jnp.int32),
            cache,
            jnp.asarray([4], jnp.int32),
            8,
            hist,
            jnp.asarray([5], jnp.int32),
        )


def _engine_outputs(params, prompts, n, scfg_kwargs):
    from qllm_tpu.serve import ContinuousBatchingEngine, ServeConfig

    engine = ContinuousBatchingEngine(
        params, CFG, ServeConfig(max_seq=64, prefill_buckets=(16,), **scfg_kwargs)
    )
    reqs = [engine.submit(p, max_new_tokens=n) for p in prompts]
    engine.run()
    if scfg_kwargs.get("speculative"):
        # acceptance telemetry: every spec-served request reports its
        # verify-forward count and mean tokens/forward (>= 1: each
        # verify emits at least the bonus token)
        for r in reqs:
            assert r.spec_forwards > 0
            assert r.spec_tokens_per_forward >= 1.0
    return [r.output for r in reqs]


def test_engine_speculative_matches_greedy():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(7)
    prompts = [
        rng.integers(1, CFG.vocab_size, size=t).astype(np.int32)
        for t in (5, 9, 3)
    ]
    n = 10
    spec = _engine_outputs(
        params, prompts, n, dict(max_batch=2, speculative=True, spec_gamma=3)
    )
    plain = _engine_outputs(params, prompts, n, dict(max_batch=2))
    assert spec == plain
    for p, out in zip(prompts, spec):
        ref = greedy_generate(
            params, CFG, jnp.asarray(p[None]), n, max_seq=64
        )
        assert out == np.asarray(ref)[0, len(p):].tolist()


def test_engine_speculative_eos_stops():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(8)
    p = rng.integers(1, CFG.vocab_size, size=6).astype(np.int32)
    # find the greedy stream's 3rd token and use it as eos
    ref = np.asarray(
        greedy_generate(params, CFG, jnp.asarray(p[None]), 12, max_seq=64)
    )[0, len(p):]
    eos = int(ref[2])
    from qllm_tpu.serve import ContinuousBatchingEngine, ServeConfig

    engine = ContinuousBatchingEngine(
        params,
        CFG,
        ServeConfig(
            max_batch=1, max_seq=64, prefill_buckets=(16,),
            eos_token_id=eos, speculative=True,
        ),
    )
    r = engine.submit(p, max_new_tokens=12)
    engine.run()
    # stream must stop at (and include) the eos token
    assert r.output == ref[: r.output.index(eos) + 1].tolist()
    assert r.output[-1] == eos and len(r.output) <= 4


def test_engine_speculative_sampled_request_falls_back():
    """A sampled request in the batch disables spec for those steps but
    everything still completes and greedy rows stay exact."""
    from qllm_tpu.models.sampling import SamplingParams
    from qllm_tpu.serve import ContinuousBatchingEngine, ServeConfig

    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(9)
    pg = rng.integers(1, CFG.vocab_size, size=5).astype(np.int32)
    ph = rng.integers(1, CFG.vocab_size, size=4).astype(np.int32)
    engine = ContinuousBatchingEngine(
        params,
        CFG,
        ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(16,),
                    speculative=True),
    )
    rg = engine.submit(pg, max_new_tokens=6)
    rh = engine.submit(
        ph, max_new_tokens=6, sampling=SamplingParams(temperature=2.0)
    )
    engine.run()
    ref = greedy_generate(params, CFG, jnp.asarray(pg[None]), 6, max_seq=64)
    assert rg.output == np.asarray(ref)[0, len(pg):].tolist()
    assert len(rh.output) == 6


def test_draft_model_speculative_equals_greedy():
    """Draft-model speculation: exact target greedy stream, with both an
    unrelated draft (poor acceptance) and the target itself as draft
    (high acceptance — exercises the full-accept KV-consistency cap)."""
    from qllm_tpu.models.speculative import draft_speculative_generate

    params = init_params(CFG, jax.random.key(0))
    draft_same = params
    draft_other = init_params(CFG, jax.random.key(5))
    rng = np.random.default_rng(10)
    for draft in (draft_same, draft_other):
        for trial in range(2):
            T = int(rng.integers(4, 9))
            prompt = jnp.asarray(
                rng.integers(1, CFG.vocab_size, (1, T)), jnp.int32
            )
            n = 12
            ref = greedy_generate(params, CFG, prompt, n, max_seq=64)
            out, rounds = draft_speculative_generate(
                params, CFG, draft, CFG, prompt, n, max_seq=64, gamma=3
            )
            np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
            assert 1 <= rounds <= n
    # self-draft must accept nearly everything: gamma=3, cap at 2
    # accepted + 1 bonus = 3 tokens/round -> ~ceil((n-1)/3) + 1 rounds
    out, rounds = draft_speculative_generate(
        params, CFG, draft_same, CFG,
        jnp.asarray(rng.integers(1, CFG.vocab_size, (1, 6)), jnp.int32),
        12, max_seq=64, gamma=3,
    )
    assert rounds <= 6  # vs 12 without speculation


def test_draft_model_speculative_batched():
    from qllm_tpu.models.speculative import draft_speculative_generate

    params = init_params(CFG, jax.random.key(0))
    draft = init_params(CFG, jax.random.key(6))
    rng = np.random.default_rng(11)
    prompts = jnp.asarray(rng.integers(1, CFG.vocab_size, (2, 5)), jnp.int32)
    n = 9
    out, _ = draft_speculative_generate(
        params, CFG, draft, CFG, prompts, n, max_seq=64, gamma=4
    )
    for b in range(2):
        ref = greedy_generate(params, CFG, prompts[b : b + 1], n, max_seq=64)
        np.testing.assert_array_equal(np.asarray(out[b]), np.asarray(ref)[0])
