"""AWQ: scale-fold invariance, clip improves, end-to-end driver."""

import jax
import jax.numpy as jnp
import numpy as np

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.quant.awq import (
    AWQQuantizer,
    awq_auto_clip,
    awq_search_scale,
    _pseudo_quantize,
)
from qllm_tpu.quant.config import AWQConfig

CFG = TINY_LLAMA_TEST_CONFIG


def test_search_scale_shape_and_norm():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(128, 96)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    s = awq_search_scale(x, (w1, w2), bits=4, group_size=32)
    assert s.shape == (128,)
    assert bool(jnp.all(s > 0))


def test_scale_improves_outlier_channels():
    # a channel with huge activations should get a scale > 1 (weights
    # scaled UP -> relatively finer quantization of the salient channel)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(256, 64)).astype(np.float32)
    x[:, 7] *= 50.0
    w = jnp.asarray(rng.normal(size=(64, 64)).astype(np.float32) * 0.1)
    s = np.asarray(awq_search_scale(jnp.asarray(x), (w,), 4, 32))
    assert s[7] > np.median(s) * 1.5

    # quantization error ON THE SALIENT OUTPUT should improve
    xj = jnp.asarray(x)
    sq = jnp.asarray(s)
    base = np.asarray(xj @ _pseudo_quantize(w, 4, 32))
    scaled = np.asarray(
        (xj / sq) @ _pseudo_quantize(w * sq[:, None], 4, 32)
    )
    ref = np.asarray(xj @ w)
    assert np.mean((scaled - ref) ** 2) < np.mean((base - ref) ** 2)


def test_auto_clip_reduces_matmul_error():
    rng = np.random.default_rng(2)
    K, N, g = 128, 64, 32
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    # heavy-tailed outliers in the weights
    w[rng.integers(0, K, 30), rng.integers(0, N, 30)] *= 20.0
    x = jnp.asarray(rng.normal(size=(300, K)).astype(np.float32))
    wj = jnp.asarray(w)
    wc = awq_auto_clip(x, wj, bits=3, group_size=g)
    err_base = float(
        jnp.mean((x @ _pseudo_quantize(wj, 3, g) - x @ wj) ** 2)
    )
    err_clip = float(
        jnp.mean((x @ _pseudo_quantize(wc, 3, g) - x @ wj) ** 2)
    )
    assert err_clip < err_base


def test_awq_driver_end_to_end():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(3)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 32)), jnp.int32)
    q = AWQQuantizer(AWQConfig(wbits=4, groupsize=32))
    qparams = q.quantize(params, CFG, calib, progress=False)
    from qllm_tpu.quant.qtensor import QuantizedTensor

    assert isinstance(qparams["layers"][0]["gate_proj"], QuantizedTensor)
    logits, _ = forward(qparams, CFG, calib[:1, :8])
    assert bool(jnp.all(jnp.isfinite(logits)))
    # LN weights were rescaled (scale folded)
    assert not np.allclose(
        np.asarray(qparams["layers"][0]["input_layernorm"]),
        np.asarray(params["layers"][0]["input_layernorm"]),
    )


def test_awq_nsamples_cap():
    q = AWQQuantizer(AWQConfig(wbits=4, groupsize=32, nsamples=64))
    assert q.config.nsamples == 64


def test_block_objective_used_and_finite(monkeypatch):
    """The module-level (attention/MLP) search objectives run by default
    and produce a working quantized model (reference module2inspect MSE,
    _awq_quantizer.py:292-361)."""
    import qllm_tpu.quant.awq as awq_mod

    calls = []
    orig = awq_mod.awq_search_scale

    def spy(x, ws, bits, gs, out_fn=None, extra=()):
        calls.append(getattr(out_fn, "func", out_fn))
        return orig(x, ws, bits, gs, out_fn=out_fn, extra=extra)

    monkeypatch.setattr(awq_mod, "awq_search_scale", spy)
    params = init_params(CFG, jax.random.key(11))
    rng = np.random.default_rng(11)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)
    q = awq_mod.AWQQuantizer(AWQConfig(wbits=4, groupsize=32))
    qparams = q.quantize(params, CFG, calib, progress=False)
    used = {getattr(f, "__name__", str(f)) for f in calls if f is not None}
    assert "_attn_block_out" in used
    assert "_mlp_block_out" in used
    logits, _ = forward(qparams, CFG, calib[:1, :8])
    assert bool(jnp.all(jnp.isfinite(logits)))
