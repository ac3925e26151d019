"""Pallas fused dequant+matmul vs the XLA reference oracle (interpret
mode on CPU; the same kernel compiles for TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.ops.pallas_qmm import qmatmul_pallas
from qllm_tpu.ops.ref_matmul import qmatmul_ref
from qllm_tpu.quant.qtensor import quantize_tensor


def _case(bits, K, N, g, M, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(K, N)).astype(np.float32) * 0.05
    x = rng.normal(size=(M, K)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), bits=bits, group_size=g)
    return jnp.asarray(x), qt


@pytest.mark.parametrize(
    "bits,K,N,g,M",
    [
        (4, 256, 256, 128, 1),  # decode
        (4, 256, 256, 128, 16),  # small prefill
        (4, 512, 384, 128, 8),  # multi k/n blocks
        (4, 256, 256, -1, 4),  # per-channel groups
        (8, 256, 256, 64, 8),
        (2, 512, 256, 128, 8),
        (4, 1024, 256, 512, 8),  # large group spanning multiple k-blocks
    ],
)
def test_pallas_matches_ref(bits, K, N, g, M):
    x, qt = _case(bits, K, N, g, M)
    y_ref = np.asarray(qmatmul_ref(x, qt))
    y_pal = np.asarray(qmatmul_pallas(x, qt))
    assert y_pal.shape == y_ref.shape
    np.testing.assert_allclose(y_pal, y_ref, atol=2e-2, rtol=2e-2)


def test_pallas_batched_input():
    x, qt = _case(4, 256, 128, 128, 6)
    x3 = x.reshape(2, 3, 256)
    y = np.asarray(qmatmul_pallas(x3, qt))
    y_ref = np.asarray(qmatmul_ref(x3, qt))
    assert y.shape == (2, 3, 128)
    np.testing.assert_allclose(y, y_ref, atol=2e-2, rtol=2e-2)


def test_pallas_rejects_odd_bits():
    x, qt = _case(3, 256, 128, 128, 4)
    with pytest.raises(NotImplementedError):
        qmatmul_pallas(x, qt)


def test_w4a8_path_close_to_ref(monkeypatch):
    monkeypatch.setenv("QLLM_TPU_W4A8", "1")
    x, qt = _case(4, 512, 384, 128, 8, seed=5)
    y = np.asarray(qmatmul_pallas(x, qt))
    monkeypatch.delenv("QLLM_TPU_W4A8")
    y_ref = np.asarray(qmatmul_ref(x, qt))
    # int8 activations add ~0.5-1% relative noise
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y, y_ref, atol=0.02 * scale, rtol=0.05)


def test_planar_stacked_matches_ref(monkeypatch):
    """Planar 4-bit stacked kernel (interpret mode) vs per-layer ref."""
    monkeypatch.setenv("QLLM_TPU_FORCE_STACKED_KERNEL", "1")
    import dataclasses

    import jax

    from qllm_tpu.ops.pallas_qmm import planar_bk, qmatmul_pallas_stacked
    from qllm_tpu.quant.qtensor import planarize_packed, unplanarize_packed

    K, N, g, L, M = 2048, 256, 128, 2, 4
    assert planar_bk(K, g) is not None
    rng = np.random.default_rng(11)
    qts = [
        quantize_tensor(
            jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05),
            bits=4,
            group_size=g,
        )
        for _ in range(L)
    ]
    import jax.tree_util as tu

    stacked = tu.tree_map(lambda *xs: jnp.stack(xs), *qts)
    pq = jnp.stack(
        [planarize_packed(stacked.qweight[i], K) for i in range(L)]
    )
    # planarize/unplanarize are exact inverses
    np.testing.assert_array_equal(
        np.asarray(unplanarize_packed(pq[0], K)),
        np.asarray(stacked.qweight[0]),
    )
    stacked = dataclasses.replace(
        stacked,
        qweight=pq,
        scales=stacked.scales.astype(jnp.float32),
        zeros=stacked.zeros.astype(jnp.float32),
        planar=True,
    )
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    for layer in range(L):
        y = np.asarray(
            qmatmul_pallas_stacked(x, stacked, jnp.int32(layer))
        )
        y_ref = np.asarray(qmatmul_ref(x, qts[layer]))
        np.testing.assert_allclose(y, y_ref, atol=2e-2, rtol=2e-2)
