"""Crash-resume quantization cache (reference idempotent-cache parity,
SURVEY.md §5 failure detection / recovery)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.quant.config import GPTQConfig
from qllm_tpu.quant.gptq import GPTQQuantizer

CFG = TINY_LLAMA_TEST_CONFIG


def test_gptq_resume_from_layer_cache(tmp_path):
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)
    cache = str(tmp_path / "qcache")

    q1 = GPTQQuantizer(GPTQConfig(wbits=4, groupsize=32))
    p1 = q1.quantize(params, CFG, calib, progress=False, cache_dir=cache)
    files = sorted(os.listdir(cache))
    assert files == ["layer_0.pkl", "layer_1.pkl"]

    # simulate a crashed second run: layer 1 cache missing
    os.remove(os.path.join(cache, "layer_1.pkl"))
    q2 = GPTQQuantizer(GPTQConfig(wbits=4, groupsize=32))
    p2 = q2.quantize(params, CFG, calib, progress=False, cache_dir=cache)
    # layer 0 loaded from cache (its observer entries are absent)
    assert all(not n.startswith("model.layers.0.") for n, *_ in q2.observer)
    assert any(n.startswith("model.layers.1.") for n, *_ in q2.observer)

    tok = jnp.asarray([[1, 2, 3]], jnp.int32)
    l1, _ = forward(p1, CFG, tok)
    l2, _ = forward(p2, CFG, tok)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=2e-2, rtol=2e-2
    )
    # identical packed bits for the cached layer
    np.testing.assert_array_equal(
        np.asarray(p1["layers"][0]["q_proj"].qweight),
        np.asarray(p2["layers"][0]["q_proj"].qweight),
    )


def test_cli_quant_cache_flag(tmp_path):
    from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ
    from qllm_tpu.run import main

    params = init_params(CFG, jax.random.key(1))
    src = str(tmp_path / "float")
    AutoQ.save_pretrained(params, CFG, src, pack_mode="GPTQ")
    for n in ("quant_config.json", "quantize_config.json"):
        p = os.path.join(src, n)
        if os.path.exists(p):
            os.remove(p)
    out = str(tmp_path / "q")
    cache = str(tmp_path / "cache")
    main(
        [
            "--model",
            src,
            "--quant_method",
            "gptq",
            "--wbits",
            "4",
            "--groupsize",
            "32",
            "--nsamples",
            "2",
            "--seqlen",
            "16",
            "--dataset",
            "synthetic",
            "--save",
            out,
            "--quant_cache_dir",
            cache,
        ]
    )
    assert sorted(os.listdir(cache)) == ["layer_0.pkl", "layer_1.pkl"]
