"""XLA reference quantized matmul + KV-cache op tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.ops.kv_cache import QuantizedKVCache
from qllm_tpu.ops.ref_matmul import dequant_ref, qmatmul_ref
from qllm_tpu.quant.qtensor import quantize_tensor


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_qmatmul_ref_matches_dense(bits):
    rng = np.random.default_rng(0)
    M, K, N = 4, 256, 128
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(M, K)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), bits=bits, group_size=64)
    wd = np.asarray(dequant_ref(qt, dtype=jnp.float32))
    y = np.asarray(qmatmul_ref(jnp.asarray(x), qt))
    y_ref = x.astype(np.float32) @ wd
    # bf16 input-cast dominates the tolerance
    np.testing.assert_allclose(y, y_ref, atol=5e-2, rtol=5e-2)


def test_qmatmul_ref_with_perm():
    rng = np.random.default_rng(1)
    M, K, N = 3, 128, 64
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(M, K)).astype(np.float32)
    perm = rng.permutation(K).astype(np.int32)
    qt = quantize_tensor(
        jnp.asarray(w[perm]), bits=4, group_size=32, perm=jnp.asarray(perm)
    )
    y = np.asarray(qmatmul_ref(jnp.asarray(x), qt))
    # x[:, perm] @ w[perm] == x @ w for the dense equivalent
    wd = np.asarray(dequant_ref(qt, dtype=jnp.float32))
    y_ref = x[:, perm].astype(np.float32) @ wd
    np.testing.assert_allclose(y, y_ref, atol=5e-2, rtol=5e-2)


def test_kv_cache_roundtrip():
    rng = np.random.default_rng(2)
    L, B, S, H, D = 2, 2, 16, 4, 32
    cache = QuantizedKVCache.create(L, B, S, H, D, quantized=True)
    k = rng.normal(size=(B, 4, H, D)).astype(np.float32)
    v = rng.normal(size=(B, 4, H, D)).astype(np.float32)
    cache = cache.update(1, jnp.asarray(k), jnp.asarray(v), jnp.int32(8))
    kd, vd = cache.layer_kv(1, dtype=jnp.float32)
    kd, vd = np.asarray(kd), np.asarray(vd)
    # int8 symmetric round trip: ~1% relative error
    np.testing.assert_allclose(kd[:, 8:12], k, atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(vd[:, 8:12], v, atol=2e-2, rtol=2e-2)
    assert np.all(kd[:, :8] == 0) and np.all(kd[:, 12:] == 0)


def test_kv_cache_unquantized():
    L, B, S, H, D = 1, 1, 8, 2, 16
    cache = QuantizedKVCache.create(L, B, S, H, D, quantized=False)
    k = jnp.ones((B, 2, H, D))
    cache = cache.update(0, k, k * 2, jnp.int32(0))
    kd, vd = cache.layer_kv(0)
    assert float(kd[0, 0, 0, 0]) == 1.0
    assert float(vd[0, 1, 0, 0]) == 2.0


def test_planarize_pallas_matches_reference():
    """ops.pallas_repack.planarize_packed_pallas (one-pass word-level
    repack) must be bit-exact vs quant.qtensor.planarize_packed (the
    unpack/repack jnp reference) across stacked and 2-D shapes."""
    from qllm_tpu.ops.pallas_repack import planarize_packed_pallas
    from qllm_tpu.quant.qtensor import planarize_packed

    rng = np.random.default_rng(0)
    for shape, K in [
        ((3, 512 // 8, 384), 512),
        ((5, 2048 // 8, 1536), 2048),
        ((11008 // 8, 4096), 11008),
    ]:
        qw = jnp.asarray(rng.integers(0, 2**32, shape, dtype=np.uint32))
        out = planarize_packed_pallas(qw, K)
        assert out is not None
        np.testing.assert_array_equal(
            np.asarray(out), np.asarray(planarize_packed(qw, K))
        )
    # unservable shape (lane width not 128-aligned) falls back
    qw = jnp.asarray(rng.integers(0, 2**32, (64, 100), dtype=np.uint32))
    assert planarize_packed_pallas(qw, 512) is None
