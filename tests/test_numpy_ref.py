"""Pure-numpy reference forward vs the JAX model (cross-engine oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from qllm_tpu.eval.numpy_ref import np_dequantize, np_forward_logits
from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.quant.qtensor import dequantize_tensor, quantize_tensor

CFG = TINY_LLAMA_TEST_CONFIG


def test_np_dequantize_matches_jax():
    rng = np.random.default_rng(0)
    for bits, g in ((4, 32), (3, 32), (8, -1), (5, 64)):
        w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
        qt = quantize_tensor(w, bits=bits, group_size=g)
        np.testing.assert_allclose(
            np_dequantize(qt), np.asarray(dequantize_tensor(qt)), rtol=1e-6
        )


def test_np_forward_matches_jax_float():
    params = init_params(CFG, jax.random.key(2), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(0, CFG.vocab_size, (1, 12))
    ref, _ = forward(params, CFG, jnp.asarray(ids, jnp.int32))
    got = np_forward_logits(params, CFG, ids)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(
        got, np.asarray(ref, np.float32), atol=2e-2 * scale, rtol=5e-2
    )


def test_np_forward_matches_jax_quantized():
    from qllm_tpu.quant.config import HQQConfig
    from qllm_tpu.quant.hqq import HQQQuantizer

    params = init_params(CFG, jax.random.key(3), dtype=jnp.float32)
    q = HQQQuantizer(HQQConfig(wbits=4, groupsize=32))
    qparams = q.quantize(params, CFG, None, progress=False)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, CFG.vocab_size, (1, 10))
    ref, _ = forward(qparams, CFG, jnp.asarray(ids, jnp.int32))
    got = np_forward_logits(qparams, CFG, ids)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(
        got, np.asarray(ref, np.float32), atol=3e-2 * scale, rtol=8e-2
    )
