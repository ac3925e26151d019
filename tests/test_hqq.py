"""HQQ quantizer: proximal solver improves on RTN; end-to-end model PPL."""

import jax
import jax.numpy as jnp
import numpy as np

from qllm_tpu.eval.perplexity import perplexity_from_ids
from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.quant.config import HQQConfig
from qllm_tpu.quant.hqq import HQQQuantizer, hqq_quantize_weight
from qllm_tpu.quant.qtensor import dequantize_tensor, quantize_tensor

CFG = TINY_LLAMA_TEST_CONFIG


def test_hqq_beats_rtn():
    # heavy-tailed weights: the proximal solver's home turf
    rng = np.random.default_rng(0)
    w = rng.standard_t(df=3, size=(256, 128)).astype(np.float32) * 0.05
    w = jnp.asarray(w)
    rtn = quantize_tensor(w, bits=3, group_size=64)
    hqq = hqq_quantize_weight(w, bits=3, group_size=64)
    err_rtn = float(jnp.mean(jnp.abs(dequantize_tensor(rtn) - w)))
    err_hqq = float(jnp.mean(jnp.abs(dequantize_tensor(hqq) - w)))
    assert err_hqq <= err_rtn * 1.001, (err_hqq, err_rtn)


def test_hqq_fractional_zeros_survive():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    qt = hqq_quantize_weight(w, bits=4, group_size=64)
    zeros = np.asarray(qt.zeros.astype(jnp.float32))
    assert not np.allclose(zeros, np.round(zeros))  # proximal => fractional


def test_hqq_model_quantize_and_ppl():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(2)
    # synthetic "text" with learnable structure: random walk over vocab
    ids = rng.integers(0, CFG.vocab_size, size=2 * 64)

    qparams = HQQQuantizer(HQQConfig(wbits=8, groupsize=64)).quantize(
        params, CFG
    )
    from qllm_tpu.quant.qtensor import QuantizedTensor

    assert isinstance(qparams["layers"][0]["q_proj"], QuantizedTensor)
    # embed/norm untouched
    assert qparams["embed_tokens"] is params["embed_tokens"]

    ppl_f = perplexity_from_ids(params, CFG, ids, n_ctx=64)
    ppl_q = perplexity_from_ids(qparams, CFG, ids, n_ctx=64)
    # 8-bit HQQ on a random-init model: ppl within 2% of float
    assert abs(ppl_q - ppl_f) / ppl_f < 0.02, (ppl_f, ppl_q)


def test_layer_override_mixed_bits():
    params = init_params(CFG, jax.random.key(0))
    qparams = HQQQuantizer(HQQConfig(wbits=4, groupsize=64)).quantize(
        params,
        CFG,
        layer_overrides={"model.layers.0.q_proj": {"wbits": 8, "groupsize": 32}},
    )
    assert qparams["layers"][0]["q_proj"].bits == 8
    assert qparams["layers"][0]["q_proj"].group_size == 32
    assert qparams["layers"][1]["q_proj"].bits == 4
