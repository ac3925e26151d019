"""Layout converter round-trips: canonical ⇄ GPTQ/GEMM/GEMV/ORT/Marlin/HQQ.

The headline interchange feature (reference README.md:111-126: import
TheBloke GPTQ/AWQ checkpoints, repack to any mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.quant.hqq import hqq_quantize_weight
from qllm_tpu.quant.layouts import export_layout, import_layout
from qllm_tpu.quant.qtensor import dequantize_tensor, quantize_tensor


def _qt(bits=4, K=256, N=128, g=64, sym=False, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1)
    return quantize_tensor(w, bits=bits, group_size=g, sym=sym)


def _same(qt1, qt2):
    np.testing.assert_array_equal(
        np.asarray(qt1.qweight), np.asarray(qt2.qweight)
    )
    np.testing.assert_allclose(
        np.asarray(dequantize_tensor(qt1)),
        np.asarray(dequantize_tensor(qt2)),
        atol=1e-3,
    )


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 8])
def test_gptq_roundtrip(bits):
    qt = _qt(bits=bits)
    t = export_layout(qt, "GPTQ")
    assert t["qweight"].dtype == np.int32
    assert t["qweight"].shape == (256 * bits // 32, 128)
    assert t["scales"].shape == (4, 128)
    qt2 = import_layout(t, "GPTQ", bits, 64)
    _same(qt, qt2)


def test_gptq_autogptq_zero_offset():
    qt = _qt()
    t_qllm = export_layout(qt, "GPTQ", autogptq=False)
    t_auto = export_layout(qt, "GPTQ", autogptq=True)
    assert not np.array_equal(t_qllm["qzeros"], t_auto["qzeros"])
    qt2 = import_layout(t_auto, "GPTQ", 4, 64, autogptq=True)
    _same(qt, qt2)


def test_gptq_act_order_roundtrip():
    rng = np.random.default_rng(1)
    K, N, g = 128, 64, 32
    w = rng.normal(size=(K, N)).astype(np.float32)
    perm = rng.permutation(K).astype(np.int32)
    qt = quantize_tensor(
        jnp.asarray(w[perm]), bits=4, group_size=g, perm=jnp.asarray(perm)
    )
    t = export_layout(qt, "GPTQ")
    # exported g_idx must map original features to their act_order group
    assert np.array_equal(np.sort(t["g_idx"]), np.arange(K) // g)
    qt2 = import_layout(t, "GPTQ", 4, g)
    assert qt2.perm is not None
    # dequant in ORIGINAL feature order must match
    inv1 = np.argsort(np.asarray(qt.perm))
    inv2 = np.argsort(np.asarray(qt2.perm))
    np.testing.assert_allclose(
        np.asarray(dequantize_tensor(qt))[inv1],
        np.asarray(dequantize_tensor(qt2))[inv2],
        atol=1e-3,
    )


def test_awq_gemm_roundtrip():
    qt = _qt()
    t = export_layout(qt, "GEMM")
    assert t["qweight"].shape == (256, 128 // 8)
    assert t["qzeros"].shape == (4, 128 // 8)
    qt2 = import_layout(t, "GEMM", 4, 64)
    _same(qt, qt2)


def test_awq_gemv_roundtrip():
    qt = _qt(g=128)
    t = export_layout(qt, "GEMV")
    assert t["qweight"].shape == (128, 256 // 8)
    qt2 = import_layout(t, "GEMV", 4, 128)
    _same(qt, qt2)


def test_ort_roundtrip():
    qt = _qt()
    t = export_layout(qt, "ORT")
    assert t["qweight"].shape == (128, 4, 32)  # [N, G, g/2]
    assert t["qweight"].dtype == np.uint8
    qt2 = import_layout(t, "ORT", 4, 64)
    _same(qt, qt2)


def test_marlin_roundtrip():
    qt = _qt(K=256, N=256, g=128, sym=True)
    t = export_layout(qt, "MARLIN")
    assert t["qweight"].shape == (256 // 16, 256 * 16 // 8)
    qt2 = import_layout(t, "MARLIN", 4, 128)
    np.testing.assert_allclose(
        np.asarray(dequantize_tensor(qt)),
        np.asarray(dequantize_tensor(qt2)),
        atol=1e-3,
    )


def test_marlin_rejects_asym():
    qt = _qt(sym=False)
    with pytest.raises(ValueError):
        export_layout(qt, "MARLIN")


def test_hqq_roundtrip_fractional_zeros():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    qt = hqq_quantize_weight(w, bits=4, group_size=64)
    t = export_layout(qt, "HQQ")
    assert t["zeros"].dtype == np.float16
    qt2 = import_layout(t, "HQQ", 4, 64)
    _same(qt, qt2)


def test_hqq_fractional_zeros_rejected_by_int_layouts():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32))
    qt = hqq_quantize_weight(w, bits=4, group_size=64)
    with pytest.raises(ValueError):
        export_layout(qt, "GPTQ")


def test_cross_layout_chain():
    """GPTQ -> canonical -> GEMM -> canonical -> ORT -> canonical: the
    integer grid must survive every hop (repack_to_new_mode parity)."""
    qt = _qt()
    t1 = export_layout(qt, "GPTQ")
    a = import_layout(t1, "GPTQ", 4, 64)
    t2 = export_layout(a, "GEMM")
    b = import_layout(t2, "GEMM", 4, 64)
    t3 = export_layout(b, "ORT")
    c = import_layout(t3, "ORT", 4, 64)
    _same(qt, c)
