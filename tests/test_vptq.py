"""VPTQ: weighted k-means, codebook reconstruction, model driver."""

import jax
import jax.numpy as jnp
import numpy as np

from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, forward, init_params
from qllm_tpu.quant.config import VPTQConfig
from qllm_tpu.quant.vptq import (
    VPTQQuantizer,
    _weighted_kmeans,
    vptq_dequant,
    vptq_matmul,
    vptq_quantize_weight,
)

CFG = TINY_LLAMA_TEST_CONFIG


def test_weighted_kmeans_recovers_clusters():
    rng = np.random.default_rng(0)
    true = rng.normal(size=(8, 4)).astype(np.float32) * 3
    ids = rng.integers(0, 8, 2000)
    vecs = true[ids] + 0.05 * rng.normal(size=(2000, 4)).astype(np.float32)
    cents, assign = _weighted_kmeans(
        jnp.asarray(vecs), jnp.ones((2000, 4)), 8, iters=10
    )
    recon = np.asarray(cents)[np.asarray(assign)]
    assert np.mean((recon - vecs) ** 2) < 0.01


def _H(K, rng):
    X = rng.normal(size=(256, K)).astype(np.float32)
    return jnp.asarray(X.T @ X / 256)


def test_vptq_more_centroids_less_error():
    rng = np.random.default_rng(1)
    K, N = 64, 48
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    H = _H(K, rng)
    errs = []
    for C in (16, 256):
        cfg = VPTQConfig(
            vector_len=4,
            num_centroids=C,
            num_res_centroids=0,
            npercent=0,
            kmeans_iters=8,
            enable_perm=False,
        )
        vt = vptq_quantize_weight(w, H, cfg)
        errs.append(float(jnp.mean((vptq_dequant(vt, jnp.float32) - w) ** 2)))
    assert errs[1] < errs[0]


def test_vptq_residual_improves():
    rng = np.random.default_rng(2)
    K, N = 64, 32
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    H = _H(K, rng)
    base = VPTQConfig(
        vector_len=4,
        num_centroids=64,
        num_res_centroids=0,
        npercent=0,
        kmeans_iters=8,
        enable_perm=False,
    )
    import dataclasses

    with_res = dataclasses.replace(base, num_res_centroids=64)
    e0 = float(
        jnp.mean(
            (vptq_dequant(vptq_quantize_weight(w, H, base), jnp.float32) - w)
            ** 2
        )
    )
    e1 = float(
        jnp.mean(
            (
                vptq_dequant(vptq_quantize_weight(w, H, with_res), jnp.float32)
                - w
            )
            ** 2
        )
    )
    assert e1 < e0 * 0.8


def test_vptq_outliers_and_perm():
    rng = np.random.default_rng(3)
    K, N = 64, 32
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32))
    # importance concentrated on a few features
    X = rng.normal(size=(256, K)).astype(np.float32)
    X[:, 5] *= 20
    X[:, 17] *= 20
    H = jnp.asarray(X.T @ X / 256)
    cfg = VPTQConfig(
        vector_len=4,
        num_centroids=32,
        num_res_centroids=0,
        npercent=7,  # -> 4 outlier rows (vector aligned)
        kmeans_iters=6,
        enable_perm=True,
    )
    vt = vptq_quantize_weight(w, H, cfg)
    assert vt.n_outlier == 4
    assert vt.perm is not None
    # the most important features sit in the outlier (fp16, exact) region
    perm = np.asarray(vt.perm)
    assert 5 in perm[:4] and 17 in perm[:4]
    # matmul equivalence on the outlier part: y == x @ w for a vector
    # hitting only outlier features
    x = np.zeros((1, K), np.float32)
    x[0, 5] = 1.0
    y = np.asarray(vptq_matmul(jnp.asarray(x), vt))
    np.testing.assert_allclose(y[0], np.asarray(w)[5], atol=2e-3, rtol=2e-3)


def test_vptq_model_driver_and_checkpointing():
    params = init_params(CFG, jax.random.key(0))
    rng = np.random.default_rng(4)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)
    q = VPTQQuantizer(
        VPTQConfig(
            vector_len=4,
            num_centroids=256,
            num_res_centroids=16,
            npercent=0,
            kmeans_iters=3,
        )
    )
    qparams = q.quantize(params, CFG, calib, progress=False)
    from qllm_tpu.quant.vptq import VPTQTensor

    assert isinstance(qparams["layers"][0]["q_proj"], VPTQTensor)
    assert q.quant_config_by_layer["model.layers.0.q_proj"]["num_centroids"] == 256
    logits, _ = forward(qparams, CFG, calib[:1, :8])
    assert bool(jnp.all(jnp.isfinite(logits)))
    # ~2.5 bits/weight for v=4, C=256, Cr=16
    bpw = qparams["layers"][0]["q_proj"].bits_per_weight
    assert 2.0 <= bpw <= 3.5


def test_vptq_checkpoint_roundtrip(tmp_path):
    from qllm_tpu.modeling import AutoQuantizedModelForCausalLM as AutoQ

    params = init_params(CFG, jax.random.key(1))
    rng = np.random.default_rng(5)
    calib = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 16)), jnp.int32)
    q = VPTQQuantizer(
        VPTQConfig(
            vector_len=4,
            num_centroids=128,
            num_res_centroids=0,
            npercent=7,
            kmeans_iters=2,
            enable_perm=True,
        )
    )
    qparams = q.quantize(params, CFG, calib, progress=False)
    path = str(tmp_path / "vptq_ckpt")
    AutoQ.save_pretrained(
        qparams,
        CFG,
        path,
        pack_mode="VPTQ",
        quant_method="vptq",
        layer_configs=q.quant_config_by_layer,
    )
    params2, cfg2 = AutoQ.from_quantized(path)
    from qllm_tpu.quant.vptq import VPTQTensor

    vt = params2["layers"][0]["q_proj"]
    assert isinstance(vt, VPTQTensor)
    assert vt.n_outlier == qparams["layers"][0]["q_proj"].n_outlier
    tok = jnp.asarray([[1, 2, 3]], jnp.int32)
    l1, _ = forward(qparams, CFG, tok)
    l2, _ = forward(params2, cfg2, tok)
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), atol=5e-2, rtol=5e-2
    )
