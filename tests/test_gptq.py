"""GPTQ: Hessian accumulation, core solver vs RTN, act_order, model driver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.ops.ref_matmul import dequant_ref
from qllm_tpu.quant.config import GPTQConfig
from qllm_tpu.quant.gptq import GPTQQuantizer, gptq_quantize_weight
from qllm_tpu.quant.hessian import hessian_update
from qllm_tpu.quant.qtensor import dequantize_tensor, quantize_tensor

CFG = TINY_LLAMA_TEST_CONFIG


def _calib_data(rng, n, K):
    # correlated activations (low-rank + noise): GPTQ's advantage case
    basis = rng.normal(size=(K // 4, K)).astype(np.float32)
    z = rng.normal(size=(n, K // 4)).astype(np.float32)
    return z @ basis + 0.1 * rng.normal(size=(n, K)).astype(np.float32)


def test_hessian_update_matches_direct():
    rng = np.random.default_rng(0)
    K = 32
    x1 = rng.normal(size=(10, K)).astype(np.float32)
    x2 = rng.normal(size=(6, K)).astype(np.float32)
    H = jnp.zeros((K, K))
    n = jnp.zeros(())
    H, n = hessian_update(H, n, jnp.asarray(x1))
    H, n = hessian_update(H, n, jnp.asarray(x2))
    x = np.concatenate([x1, x2])
    H_direct = 2.0 / 16 * (x.T @ x)
    np.testing.assert_allclose(np.asarray(H), H_direct, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act_order", [False, True])
def test_gptq_beats_rtn(act_order):
    rng = np.random.default_rng(1)
    K, N, g = 128, 64, 32
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    X = _calib_data(rng, 256, K)
    H = jnp.asarray(2.0 / X.shape[0] * (X.T @ X))

    cfg = GPTQConfig(wbits=3, groupsize=g, act_order=act_order)
    qt, err = gptq_quantize_weight(jnp.asarray(w), H, 3, g, cfg)

    rtn = quantize_tensor(jnp.asarray(w), bits=3, group_size=g)

    # proxy loss: E||x(W - What)||^2 = tr((W-What)^T H (W-What)) / 2
    def loss(what):
        d = what - w
        return float(np.trace(d.T @ np.asarray(H) @ d))

    w_gptq = np.asarray(dequant_ref(qt, jnp.float32))
    if qt.perm is not None:
        inv = np.argsort(np.asarray(qt.perm))
        w_gptq = w_gptq[inv]
    w_rtn = np.asarray(dequantize_tensor(rtn))
    assert loss(w_gptq) < loss(w_rtn) * 0.9, (loss(w_gptq), loss(w_rtn))


def test_gptq_sym():
    rng = np.random.default_rng(2)
    K, N = 64, 32
    w = rng.normal(size=(K, N)).astype(np.float32)
    X = _calib_data(rng, 128, K)
    H = jnp.asarray(2.0 / X.shape[0] * (X.T @ X))
    cfg = GPTQConfig(wbits=4, groupsize=-1, sym=True)
    qt, _ = gptq_quantize_weight(jnp.asarray(w), H, 4, -1, cfg)
    assert qt.sym
    np.testing.assert_allclose(np.asarray(qt.zeros.astype(jnp.float32)), 8.0)


def test_gptq_static_groups():
    rng = np.random.default_rng(3)
    K, N, g = 128, 32, 32
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    X = _calib_data(rng, 128, K)
    H = jnp.asarray(2.0 / X.shape[0] * (X.T @ X))
    cfg = GPTQConfig(wbits=4, groupsize=g, static_groups=True)
    qt, _ = gptq_quantize_weight(jnp.asarray(w), H, 4, g, cfg)
    wd = np.asarray(dequant_ref(qt, jnp.float32))
    assert np.mean((wd - w) ** 2) < np.mean(w**2) * 0.05


def test_gptq_act_order_static_groups_contiguous():
    rng = np.random.default_rng(4)
    K, N, g = 128, 32, 32
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    X = _calib_data(rng, 128, K)
    H = jnp.asarray(2.0 / X.shape[0] * (X.T @ X))
    cfg = GPTQConfig(wbits=4, groupsize=g, act_order=True, static_groups=True)
    qt, _ = gptq_quantize_weight(jnp.asarray(w), H, 4, g, cfg)
    # rows must be group-contiguous: perm sorted by original group id
    perm = np.asarray(qt.perm)
    assert np.all(np.diff(perm // g) >= 0)


@pytest.mark.parametrize("static_groups", [False, True])
def test_gptq_mse_grid_search(static_groups):
    """MSE grid search (reference _gptq_quantizer.py:74-91) must not lose
    to plain min/max under the Hessian-weighted proxy loss, and should
    WIN on outlier-heavy weights (shrinking clips the tails)."""
    rng = np.random.default_rng(8)
    K, N, g = 128, 32, 32
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.1
    # heavy outliers: 1% of entries 20x larger
    mask = rng.random(size=w.shape) < 0.01
    w = np.where(mask, w * 20.0, w).astype(np.float32)
    X = _calib_data(rng, 128, K)
    H = jnp.asarray(2.0 / X.shape[0] * (X.T @ X))

    def dq(cfg):
        qt, _ = gptq_quantize_weight(jnp.asarray(w), H, 3, g, cfg)
        return np.asarray(dequant_ref(qt, jnp.float32))

    base = GPTQConfig(wbits=3, groupsize=g, static_groups=static_groups)
    w_plain = dq(base)
    w_mse = dq(GPTQConfig(wbits=3, groupsize=g, static_groups=static_groups, mse=True))

    def loss(what):
        d = what - w
        return float(np.trace(d.T @ np.asarray(H) @ d))

    assert loss(w_mse) < loss(w_plain), (loss(w_mse), loss(w_plain))


def test_gptq_model_driver():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 32)), jnp.int32)
    q = GPTQQuantizer(GPTQConfig(wbits=4, groupsize=32, nsamples=4))
    qparams = q.quantize(params, CFG, calib, progress=False)
    from qllm_tpu.quant.qtensor import QuantizedTensor

    assert isinstance(qparams["layers"][0]["down_proj"], QuantizedTensor)
    assert len(q.observer) == 2 * 7
    logits, _ = forward(qparams, CFG, calib[:1, :8])
    assert logits.shape == (1, 8, CFG.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_gptq_true_sequential():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(6)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)
    q = GPTQQuantizer(GPTQConfig(wbits=4, groupsize=32, true_sequential=True))
    qparams = q.quantize(params, CFG, calib, progress=False)
    logits, _ = forward(qparams, CFG, calib[:1, :8])
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_gptq_mixed_bits_promotes():
    params = init_params(CFG, jax.random.key(1))
    rng = np.random.default_rng(7)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)
    # 2-bit g128 is bad enough that promotion (to g64/g32/3-bit) should
    # halve the error for at least one layer on random weights
    q = GPTQQuantizer(
        GPTQConfig(wbits=2, groupsize=128, allow_mix_bits=True)
    )
    qparams = q.quantize(params, CFG, calib, progress=False)
    confs = q.quant_config_by_layer
    assert len(confs) == 14
    promoted = [k for k, v in confs.items() if (v["wbits"], v["groupsize"]) != (2, 128)]
    assert promoted, confs
    # promoted layers really carry the promoted width
    name = promoted[0]
    idx = int(name.split(".")[2])
    lname = name.split(".")[-1]
    qt = qparams["layers"][idx][lname]
    assert (qt.bits, qt.group_size) == (
        confs[name]["wbits"],
        confs[name]["groupsize"],
    )
