"""Format-layer tests: pack/unpack round trips and quantize/dequantize.

The reference guards this only with the optional ROUNDTRIP_CHECK env
assert (auto_model_quantization.py:17,99-104); here it is a real suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qllm_tpu.quant.qtensor import (
    QuantizedTensor,
    compute_scale_zero,
    dequantize_tensor,
    pack_rows,
    quantize_tensor,
    unpack_rows,
)

ALL_BITS = [2, 3, 4, 5, 6, 7, 8]


@pytest.mark.parametrize("bits", ALL_BITS)
def test_pack_unpack_roundtrip(bits):
    rng = np.random.default_rng(0)
    K, N = 128, 64
    q = rng.integers(0, 2**bits, size=(K, N), dtype=np.int32)
    packed = pack_rows(jnp.asarray(q), bits)
    assert packed.dtype == jnp.uint32
    out = np.asarray(unpack_rows(packed, bits, K))
    np.testing.assert_array_equal(out, q)


@pytest.mark.parametrize("bits", [2, 4, 8])
def test_packed_shape_248(bits):
    q = jnp.zeros((128, 32), jnp.int32)
    assert pack_rows(q, bits).shape == (128 // (32 // bits), 32)


def test_packed_shape_anybit():
    q = jnp.zeros((128, 32), jnp.int32)
    assert pack_rows(q, 3).shape == (3 * 128 // 32, 32)


def test_pack_bit_order_matches_gptq_convention():
    # value k of a word sits at bit offset (k % pf) * bits — the GPTQ
    # row-pack order (reference compress_weight.py:10-24).
    K = 8
    q = np.arange(K, dtype=np.int32).reshape(K, 1)
    packed = np.asarray(pack_rows(jnp.asarray(q), 4))
    expect = 0
    for k in range(8):
        expect |= k << (4 * k)
    assert packed.shape == (1, 1)
    assert int(packed[0, 0]) == expect


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
@pytest.mark.parametrize("group_size", [32, 128, -1])
def test_quantize_dequantize_error(bits, group_size):
    rng = np.random.default_rng(1)
    K, N = 256, 96
    w = rng.normal(size=(K, N)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), bits=bits, group_size=group_size)
    wd = np.asarray(dequantize_tensor(qt))
    g = K if group_size == -1 else group_size
    scales = np.asarray(qt.scales.astype(jnp.float32))
    zeros = np.asarray(qt.zeros.astype(jnp.float32))
    # exact match vs an independent numpy reference of the quant map
    maxq = 2**bits - 1
    q_np = np.clip(
        np.round(w.reshape(K // g, g, N) / scales[:, None, :] + zeros[:, None, :]),
        0,
        maxq,
    ).reshape(K, N)
    from qllm_tpu.quant.qtensor import unpack_rows as _unpack

    np.testing.assert_array_equal(
        np.asarray(_unpack(qt.qweight, bits, K)), q_np.astype(np.int32)
    )
    # error bounded by 1 LSB (0.5 interior, up to 1.0 at clip boundary)
    step = np.repeat(scales, g, axis=0)
    assert np.all(np.abs(wd - w) <= 1.0001 * step + 1e-6)


def test_symmetric_quantization():
    rng = np.random.default_rng(2)
    w = rng.normal(size=(128, 64)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), bits=4, group_size=64, sym=True)
    assert qt.sym
    zeros = np.asarray(qt.zeros.astype(jnp.float32))
    np.testing.assert_allclose(zeros, 8.0)
    wd = np.asarray(dequantize_tensor(qt))
    assert np.abs(wd - w).max() < 0.3


def test_fractional_zeros_hqq_style():
    # HQQ stores fractional zero-points; dequant must not round them.
    rng = np.random.default_rng(3)
    K, N, g = 64, 32, 32
    w = rng.normal(size=(K, N)).astype(np.float32)
    scales, zeros = compute_scale_zero(jnp.asarray(w), 4, g)
    zeros = zeros + 0.37  # make fractional
    qt = quantize_tensor(jnp.asarray(w), 4, g, scales=scales, zeros=zeros)
    wd = np.asarray(dequantize_tensor(qt))
    # shifted zero moves the representable window: 0.5 LSB interior
    # rounding + up to ~0.87+0.5 LSB clip at the window edge
    s = np.repeat(np.asarray(qt.scales.astype(jnp.float32)), g, axis=0)
    assert np.all(np.abs(wd - w) <= 1.5 * s + 1e-6)


def test_pytree_registration():
    qt = quantize_tensor(jnp.ones((64, 32)), bits=4, group_size=32)
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 3  # qweight, scales, zeros (perm is None)
    qt2 = jax.tree_util.tree_map(lambda x: x, qt)
    assert qt2.bits == 4 and qt2.group_size == 32

    # must be jittable as an argument
    @jax.jit
    def f(q):
        return dequantize_tensor(q)

    f(qt)


def test_quantize_under_jit():
    w = jnp.asarray(np.random.default_rng(4).normal(size=(128, 64)), jnp.float32)
    jitted = jax.jit(lambda w: quantize_tensor(w, 4, 64))
    qt = jitted(w)
    np.testing.assert_allclose(
        np.asarray(dequantize_tensor(qt)),
        np.asarray(dequantize_tensor(quantize_tensor(w, 4, 64))),
    )


@pytest.mark.parametrize("bits,target", [(3, 4), (5, 8), (6, 8), (7, 8), (4, 4)])
def test_promote_bits_preserves_values(bits, target):
    from qllm_tpu.quant.qtensor import promote_bits

    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.normal(size=(128, 64)).astype(np.float32) * 0.05)
    qt = quantize_tensor(w, bits=bits, group_size=32)
    pt = promote_bits(qt)
    assert pt.bits == target
    np.testing.assert_allclose(
        np.asarray(dequantize_tensor(qt)),
        np.asarray(dequantize_tensor(pt)),
        atol=1e-6,
    )
    if bits != target:
        # promoted tensors take the fused kernel path
        from qllm_tpu.ops.pallas_qmm import qmatmul_pallas
        from qllm_tpu.ops.ref_matmul import qmatmul_ref

        x = jnp.asarray(rng.normal(size=(4, 128)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(qmatmul_pallas(x, pt)),
            np.asarray(qmatmul_ref(x, qt)),
            atol=3e-2,
            rtol=3e-2,
        )
