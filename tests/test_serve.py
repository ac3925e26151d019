"""Continuous-batching engine: parity with single-request greedy decode."""

import jax
import jax.numpy as jnp
import numpy as np

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, greedy_generate, init_params
from qllm_tpu.serve import ContinuousBatchingEngine, ServeConfig

CFG = TINY_LLAMA_TEST_CONFIG


def test_engine_matches_greedy_generate():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(1, CFG.vocab_size, size=n).astype(np.int32)
        for n in (5, 9, 3)
    ]
    engine = ContinuousBatchingEngine(
        params, CFG, ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(16,))
    )
    reqs = [engine.submit(p, max_new_tokens=6) for p in prompts]
    done = engine.run()
    assert len(done) == 3
    for p, r in zip(prompts, reqs):
        ref = greedy_generate(
            params,
            CFG,
            jnp.asarray(p[None, :]),
            max_new_tokens=6,
            max_seq=64,
            quantized_kv=True,
        )
        ref_new = np.asarray(ref)[0, len(p) :]
        assert r.output == ref_new.tolist(), (r.output, ref_new.tolist())


def test_engine_slot_reuse_more_requests_than_slots():
    params = init_params(CFG, jax.random.key(1))
    rng = np.random.default_rng(1)
    engine = ContinuousBatchingEngine(
        params, CFG, ServeConfig(max_batch=2, max_seq=32, prefill_buckets=(8,))
    )
    reqs = [
        engine.submit(rng.integers(1, CFG.vocab_size, size=4), max_new_tokens=3)
        for _ in range(5)
    ]
    done = engine.run()
    assert len(done) == 5
    assert all(len(r.output) == 3 for r in reqs)
    assert all(r.finished_at is not None for r in reqs)


def test_engine_eos_stops_early():
    params = init_params(CFG, jax.random.key(2))
    rng = np.random.default_rng(2)
    prompt = rng.integers(1, CFG.vocab_size, size=4)
    # find what the model generates first, then set THAT as eos
    ref = greedy_generate(
        params, CFG, jnp.asarray(prompt[None, :]), max_new_tokens=3
    )
    first = int(np.asarray(ref)[0, len(prompt)])
    engine = ContinuousBatchingEngine(
        params,
        CFG,
        ServeConfig(
            max_batch=2, max_seq=32, prefill_buckets=(8,), eos_token_id=first
        ),
    )
    r = engine.submit(prompt, max_new_tokens=10)
    engine.run()
    assert r.finished and len(r.output) == 1 and r.output[0] == first


def test_engine_chunked_decode_matches_greedy():
    params = init_params(CFG, jax.random.key(3))
    rng = np.random.default_rng(3)
    prompts = [
        rng.integers(1, CFG.vocab_size, size=n).astype(np.int32)
        for n in (5, 9, 3)
    ]
    engine = ContinuousBatchingEngine(
        params,
        CFG,
        ServeConfig(
            max_batch=2, max_seq=64, prefill_buckets=(16,), decode_chunk=4
        ),
    )
    reqs = [engine.submit(p, max_new_tokens=7) for p in prompts]
    done = engine.run()
    assert len(done) == 3
    for p, r in zip(prompts, reqs):
        ref = greedy_generate(
            params,
            CFG,
            jnp.asarray(p[None, :]),
            max_new_tokens=7,
            max_seq=64,
            quantized_kv=True,
        )
        ref_new = np.asarray(ref)[0, len(p) :]
        assert r.output == ref_new.tolist(), (r.output, ref_new.tolist())


def test_engine_chunked_eos():
    params = init_params(CFG, jax.random.key(4))
    rng = np.random.default_rng(4)
    prompt = rng.integers(1, CFG.vocab_size, size=4)
    ref = greedy_generate(
        params, CFG, jnp.asarray(prompt[None, :]), max_new_tokens=3
    )
    second = int(np.asarray(ref)[0, len(prompt) + 1])
    engine = ContinuousBatchingEngine(
        params,
        CFG,
        ServeConfig(
            max_batch=1,
            max_seq=32,
            prefill_buckets=(8,),
            eos_token_id=second,
            decode_chunk=8,
        ),
    )
    r = engine.submit(prompt, max_new_tokens=10)
    engine.run()
    assert r.finished
    assert r.output[-1] == second and len(r.output) == 2


def test_engine_chunked_prefill_matches_one_shot():
    """Long prompts admit in prefill_chunk pieces interleaved with
    decode steps; outputs must be identical to one-shot admission."""
    params = init_params(CFG, jax.random.key(5))
    rng = np.random.default_rng(5)
    long_prompt = rng.integers(0, CFG.vocab_size, 40).astype(np.int32)
    short_prompt = rng.integers(0, CFG.vocab_size, 6).astype(np.int32)

    def run(prefill_chunk):
        eng = ContinuousBatchingEngine(
            params,
            CFG,
            ServeConfig(
                max_batch=2,
                max_seq=128,
                quantized_kv=True,
                prefill_chunk=prefill_chunk,
            ),
        )
        a = eng.submit(short_prompt, max_new_tokens=6)
        b = eng.submit(long_prompt, max_new_tokens=6)
        eng.run()
        return a.output, b.output

    a1, b1 = run(prefill_chunk=1024)  # one-shot (prompt < chunk)
    a2, b2 = run(prefill_chunk=16)  # 40-token prompt -> 3 chunks
    assert a1 == a2
    assert b1 == b2
    assert len(b1) == 6


def test_engine_chunked_prefill_does_not_stall_active():
    """While a long prompt admits chunk-by-chunk, already-active slots
    keep producing tokens between chunks."""
    params = init_params(CFG, jax.random.key(6))
    rng = np.random.default_rng(6)
    eng = ContinuousBatchingEngine(
        params,
        CFG,
        ServeConfig(
            max_batch=2, max_seq=128, quantized_kv=True, prefill_chunk=8
        ),
    )
    a = eng.submit(rng.integers(0, CFG.vocab_size, 4).astype(np.int32), 32)
    eng.step()  # admit + first decode for a
    assert len(a.output) >= 1
    b = eng.submit(rng.integers(0, CFG.vocab_size, 40).astype(np.int32), 4)
    tokens_during_admission = 0
    # 40-token prompt at chunk 8 -> 5 admission iterations
    for _ in range(5):
        before = len(a.output)
        eng.step()
        tokens_during_admission += len(a.output) - before
    assert tokens_during_admission >= 4, (
        "active stream stalled during chunked admission"
    )
    eng.run()
    assert len(b.output) == 4


def test_prefix_caching_matches_plain_admission():
    """register_prefix + suffix-only admission == full-prompt admission,
    for several requests sharing one system prefix."""
    params = init_params(CFG, jax.random.key(5))
    rng = np.random.default_rng(12)
    prefix = rng.integers(1, CFG.vocab_size, size=7).astype(np.int32)
    suffixes = [
        rng.integers(1, CFG.vocab_size, size=t).astype(np.int32)
        for t in (3, 5, 2)
    ]
    scfg = ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(16, 32))

    eng = ContinuousBatchingEngine(params, CFG, scfg)
    pid = eng.register_prefix(prefix)
    reqs = [
        eng.submit(np.concatenate([prefix, sfx]), 6, prefix_id=pid)
        for sfx in suffixes
    ]
    eng.run()

    ref_eng = ContinuousBatchingEngine(params, CFG, scfg)
    ref_reqs = [
        ref_eng.submit(np.concatenate([prefix, sfx]), 6) for sfx in suffixes
    ]
    ref_eng.run()
    assert [r.output for r in reqs] == [r.output for r in ref_reqs]


def test_prefix_caching_rejects_mismatched_prompt():
    import pytest

    params = init_params(CFG, jax.random.key(5))
    eng = ContinuousBatchingEngine(
        params, CFG, ServeConfig(max_batch=1, max_seq=64)
    )
    pid = eng.register_prefix(np.asarray([3, 4, 5], np.int32))
    with pytest.raises(ValueError, match="extend the registered prefix"):
        eng.submit(np.asarray([3, 9, 5, 6], np.int32), 4, prefix_id=pid)
    with pytest.raises(ValueError, match="extend the registered prefix"):
        eng.submit(np.asarray([3, 4, 5], np.int32), 4, prefix_id=pid)


def test_prefix_caching_with_small_chunks_and_long_suffix():
    params = init_params(CFG, jax.random.key(6))
    rng = np.random.default_rng(13)
    prefix = rng.integers(1, CFG.vocab_size, size=5).astype(np.int32)
    suffix = rng.integers(1, CFG.vocab_size, size=11).astype(np.int32)
    prompt = np.concatenate([prefix, suffix])
    scfg = ServeConfig(
        max_batch=1, max_seq=64, prefill_buckets=(16, 32), prefill_chunk=4
    )
    eng = ContinuousBatchingEngine(params, CFG, scfg)
    pid = eng.register_prefix(prefix)
    r = eng.submit(prompt, 6, prefix_id=pid)
    eng.run()
    ref = greedy_generate(
        params, CFG, jnp.asarray(prompt[None]), 6, max_seq=64
    )
    assert r.output == np.asarray(ref)[0, len(prompt):].tolist()


def test_engine_w4a8_serves_within_int8_tolerance(monkeypatch):
    """ServeConfig(w4a8=True): the engine serves through the int8-
    activation kernel; a single stacked forward's logits stay within
    int8-activation tolerance of the W4A16 path, and the engine
    completes requests end to end."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    # monkeypatch-register the flag so teardown removes what the engine
    # sets process-wide
    monkeypatch.setenv("QLLM_TPU_W4A8", "0")
    import qllm_tpu.ops.pallas_qmm as pq
    from qllm_tpu.models.generate import make_cache
    from qllm_tpu.models.llama import ModelConfig, forward
    from qllm_tpu.models.stacked import stack_layer_params
    from qllm_tpu.utils.testing import random_quantized_params

    cfg = ModelConfig(
        vocab_size=256,
        hidden_size=256,
        intermediate_size=512,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    params = random_quantized_params(
        cfg, jax.random.key(3), bits=4, group_size=64
    )
    params = stack_layer_params(params, scale_store_dtype=jnp.bfloat16)

    # numerics: one decode forward, W4A16 vs W4A8
    cache = make_cache(cfg, 1, 16, quantized_kv=True)
    tok = jnp.ones((1, 1), jnp.int32)
    monkeypatch.delenv("QLLM_TPU_W4A8")
    l16, _ = forward(params, cfg, tok, cache, pos=jnp.int32(0))
    monkeypatch.setenv("QLLM_TPU_W4A8", "1")
    pq._qmm_2d_stacked.clear_cache()
    try:
        l8, _ = forward(params, cfg, tok, cache, pos=jnp.int32(0))
        l16n = np.asarray(l16, np.float32)
        l8n = np.asarray(l8, np.float32)
        rel = np.linalg.norm(l8n - l16n) / max(np.linalg.norm(l16n), 1e-9)
        # per-matmul int8 noise is ~1-3% (pinned in test_pallas_qmm);
        # RANDOM-weight logits amplify it through the residual stream —
        # this model-level bound only guards against gross breakage
        assert rel < 0.15, f"w4a8 logits rel err {rel}"

        # end-to-end: the engine flag routes through the same env knob
        engine = ContinuousBatchingEngine(
            params,
            cfg,
            ServeConfig(
                max_batch=2, max_seq=32, prefill_buckets=(8,), w4a8=True
            ),
        )
        import os

        assert os.environ.get("QLLM_TPU_W4A8") == "1"
        rng = np.random.default_rng(7)
        reqs = [
            engine.submit(
                rng.integers(1, cfg.vocab_size, size=5).astype(np.int32),
                max_new_tokens=4,
            )
            for _ in range(2)
        ]
        done = engine.run()
        assert len(done) == 2
        assert all(len(r.output) == 4 for r in reqs)
    finally:
        pq._qmm_2d_stacked.clear_cache()
