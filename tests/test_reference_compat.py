"""Bit-exact compatibility with the upstream pack code.

Loads the reference's own torch pack/unpack implementation
(qllm/modeling/q_layers/compress_weight.py) from the read-only mount
and checks our layout converters produce identical buffers. Skipped
when the reference checkout is absent.
"""

import importlib.util
import os

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/qllm/modeling/q_layers/compress_weight.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_cw():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_compress_weight", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod, torch


@pytest.mark.parametrize("bits", [2, 3, 4, 5, 6, 7, 8])
def test_qweight_pack_matches_reference(ref_cw, bits):
    mod, torch = ref_cw
    rng = np.random.default_rng(0)
    K, N = 128, 64
    q = rng.integers(0, 2**bits, size=(K, N), dtype=np.int64)

    ref_pack = torch.zeros((K * bits // 32, N), dtype=torch.int32)
    mod.general_pack_on_row(ref_pack, torch.from_numpy(q).int(), bits)

    from qllm_tpu.quant.layouts import _pack_rows_ref

    ours = _pack_rows_ref(q.astype(np.int32), bits)
    np.testing.assert_array_equal(ours.astype(np.int64) & 0xFFFFFFFF,
                                  ref_pack.numpy().astype(np.int64) & 0xFFFFFFFF)


@pytest.mark.parametrize("bits", [2, 3, 4, 8])
def test_qweight_unpack_matches_reference(ref_cw, bits):
    mod, torch = ref_cw
    rng = np.random.default_rng(1)
    K, N = 128, 64
    packed = rng.integers(0, 2**31, size=(K * bits // 32, N), dtype=np.int64)

    ref_out = torch.zeros((K, N), dtype=torch.int32)
    mod.general_unpack_on_row(torch.from_numpy(packed).int(), ref_out, bits)

    from qllm_tpu.quant.layouts import _unpack_rows_ref

    ours = _unpack_rows_ref(packed.astype(np.int32), bits, K)
    np.testing.assert_array_equal(ours, ref_out.numpy())


def test_gptq_export_loadable_by_reference_unpack(ref_cw):
    """Full-layer check: export GPTQ layout, dequantize with the
    REFERENCE _dequant_weight, compare to our dequant."""
    mod, torch = ref_cw
    from qllm_tpu.quant.layouts import export_layout
    from qllm_tpu.quant.qtensor import dequantize_tensor, quantize_tensor

    rng = np.random.default_rng(2)
    K, N, g = 128, 64, 32
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1)
    qt = quantize_tensor(w, bits=4, group_size=g)
    t = export_layout(qt, "GPTQ")

    qweight = torch.zeros((K, N), dtype=torch.int32)
    mod.general_unpack_on_row(torch.from_numpy(t["qweight"]), qweight, 4)
    zeros = torch.zeros((K // g, N), dtype=torch.int32)
    mod.general_unpack_on_row(torch.from_numpy(t["qzeros"]).T, zeros.T, 4)

    class Dummy(mod.CompressWeight):
        pass

    d = Dummy()
    scales = torch.from_numpy(t["scales"]).float()
    g_idx = torch.from_numpy(t["g_idx"]).long()
    wd_ref = d._dequant_weight(qweight.float(), scales, zeros.float(), g_idx)
    np.testing.assert_allclose(
        wd_ref.numpy(),
        np.asarray(dequantize_tensor(qt)),
        atol=2e-3,
    )
