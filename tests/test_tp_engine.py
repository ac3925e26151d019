"""TPEngine: the continuous-batching engine under shard_map TP must be
output-identical to the single-device engine (greedy, sampled,
speculative, chunked)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, greedy_generate, init_params
from qllm_tpu.serve import (
    ContinuousBatchingEngine,
    SamplingParams,
    ServeConfig,
    TPEngine,
)

CFG = TINY_LLAMA_TEST_CONFIG  # H=4, Hkv=2 -> tp=2 max


def _mesh(tp=2):
    devs = np.asarray(jax.devices()[: tp])
    return Mesh(devs.reshape(1, tp), ("dp", "tp"))


def _prompts(seed, sizes):
    rng = np.random.default_rng(seed)
    return [
        rng.integers(1, CFG.vocab_size, size=t).astype(np.int32)
        for t in sizes
    ]


def _run(engine_cls, params, prompts, n, scfg, **kw):
    eng = engine_cls(params, CFG, scfg, **kw)
    reqs = [eng.submit(p, max_new_tokens=n) for p in prompts]
    eng.run()
    return [r.output for r in reqs]


def test_tp_engine_greedy_matches_single_device():
    params = init_params(CFG, jax.random.key(0))
    prompts = _prompts(0, (5, 9, 3))
    scfg = ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(16,))
    tp_out = _run(TPEngine, params, prompts, 8, scfg, mesh=_mesh())
    ref_out = _run(ContinuousBatchingEngine, params, prompts, 8, scfg)
    assert tp_out == ref_out
    ref = greedy_generate(
        params, CFG, jnp.asarray(prompts[0][None]), 8, max_seq=64
    )
    assert tp_out[0] == np.asarray(ref)[0, len(prompts[0]):].tolist()


def test_tp_engine_multi_step_matches():
    params = init_params(CFG, jax.random.key(1))
    prompts = _prompts(1, (4, 7))
    scfg = ServeConfig(
        max_batch=2, max_seq=64, prefill_buckets=(16,), decode_chunk=4
    )
    tp_out = _run(TPEngine, params, prompts, 9, scfg, mesh=_mesh())
    ref_out = _run(ContinuousBatchingEngine, params, prompts, 9, scfg)
    assert tp_out == ref_out


def test_tp_engine_speculative_matches():
    params = init_params(CFG, jax.random.key(2))
    prompts = _prompts(2, (5, 6))
    scfg = ServeConfig(
        max_batch=2, max_seq=64, prefill_buckets=(16,),
        speculative=True, spec_gamma=3,
    )
    tp_out = _run(TPEngine, params, prompts, 8, scfg, mesh=_mesh())
    plain = ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(16,))
    ref_out = _run(ContinuousBatchingEngine, params, prompts, 8, plain)
    assert tp_out == ref_out


def test_tp_engine_sampled_deterministic_and_greedy_rows_exact():
    params = init_params(CFG, jax.random.key(3))
    prompts = _prompts(3, (5, 4))

    def run_once(cls, **kw):
        eng = cls(
            params,
            CFG,
            ServeConfig(
                max_batch=2, max_seq=64, prefill_buckets=(16,), seed=5
            ),
            **kw,
        )
        rg = eng.submit(prompts[0], max_new_tokens=6)
        rh = eng.submit(
            prompts[1],
            max_new_tokens=6,
            sampling=SamplingParams(temperature=1.5),
        )
        eng.run()
        return rg.output, rh.output

    g1, h1 = run_once(TPEngine, mesh=_mesh())
    g2, h2 = run_once(TPEngine, mesh=_mesh())
    assert (g1, h1) == (g2, h2)  # engine-seed determinism under TP
    ref = greedy_generate(
        params, CFG, jnp.asarray(prompts[0][None]), 6, max_seq=64
    )
    assert g1 == np.asarray(ref)[0, len(prompts[0]):].tolist()
    assert len(h1) == 6


def test_tp_engine_eos_and_slot_reuse():
    params = init_params(CFG, jax.random.key(4))
    prompts = _prompts(4, (5, 6, 4, 7))  # 4 requests, 2 slots
    scfg = ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(16,))
    tp_out = _run(TPEngine, params, prompts, 6, scfg, mesh=_mesh())
    ref_out = _run(ContinuousBatchingEngine, params, prompts, 6, scfg)
    assert tp_out == ref_out


def test_tp_engine_prefix_caching_matches():
    params = init_params(CFG, jax.random.key(5))
    rng = np.random.default_rng(14)
    prefix = rng.integers(1, CFG.vocab_size, size=6).astype(np.int32)
    suffixes = [
        rng.integers(1, CFG.vocab_size, size=t).astype(np.int32)
        for t in (3, 4)
    ]
    scfg = ServeConfig(max_batch=2, max_seq=64, prefill_buckets=(16, 32))
    eng = TPEngine(params, CFG, scfg, mesh=_mesh())
    pid = eng.register_prefix(prefix)
    reqs = [
        eng.submit(np.concatenate([prefix, s]), 6, prefix_id=pid)
        for s in suffixes
    ]
    eng.run()
    ref = ContinuousBatchingEngine(params, CFG, scfg)
    rr = [ref.submit(np.concatenate([prefix, s]), 6) for s in suffixes]
    ref.run()
    assert [r.output for r in reqs] == [r.output for r in rr]
