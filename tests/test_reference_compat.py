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


@pytest.fixture(scope="module")
def ref_ort(ref_cw):
    """Load the reference's QuantLinearORT with its relative imports
    satisfied via a synthetic package (no reference __init__ chain)."""
    _, torch = ref_cw
    import sys
    import types

    qdir = os.path.dirname(REF)
    pkg = types.ModuleType("ref_q_layers")
    pkg.__path__ = [qdir]
    sys.modules.setdefault("ref_q_layers", pkg)

    def load(name):
        full = f"ref_q_layers.{name}"
        if full in sys.modules:
            return sys.modules[full]
        spec = importlib.util.spec_from_file_location(
            full, os.path.join(qdir, f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[full] = mod
        spec.loader.exec_module(mod)
        return mod

    # ext_package_checker pulls the reference's full package tree
    # (...utils.logger); stub it — no native ort_ops in this env anyway
    stub = types.ModuleType("ref_q_layers.ext_package_checker")
    stub.has_ort_ops = lambda: False
    sys.modules["ref_q_layers.ext_package_checker"] = stub
    load("compress_weight")
    return load("quant_linear_onnxruntime"), torch


def test_ort_pack_matches_reference_bitexact(ref_ort):
    """Our ORT MatMulNBits buffers (qweight/qzeros/scales) must be
    byte-identical to the reference's QuantLinearORT.pack_on_device
    (quant_linear_onnxruntime.py:115-151) — the layout onnxruntime
    actually consumes."""
    mod, torch = ref_ort
    from qllm_tpu.quant.layouts import export_layout
    from qllm_tpu.quant.qtensor import quantize_tensor

    rng = np.random.default_rng(3)
    K, N, g = 256, 48, 64
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1)
    qt = quantize_tensor(w, bits=4, group_size=g)
    t = export_layout(qt, "ORT")

    # grid the reference packer expects: intweight [K, N], zeros [G, N]
    from qllm_tpu.quant.layouts import _to_grid

    q, scales, zeros, _ = _to_grid(qt)
    lin = mod.QuantLinearORT(4, g, K, N, bias=False, dtype=torch.float32)
    lin.scales = torch.from_numpy(np.ascontiguousarray(scales)).float()
    lin.pack_on_device(
        torch.from_numpy(np.ascontiguousarray(q)).int(),
        # pack_on_device's intzeros_T is zeros[N,G].T == [G, N]
        # (compress_weight.py accelerate_pack_on_device: qzeros=zeros.T)
        torch.from_numpy(np.ascontiguousarray(zeros)).int(),
    )
    np.testing.assert_array_equal(
        np.asarray(t["qweight"]), lin.qweight.numpy()
    )
    np.testing.assert_array_equal(np.asarray(t["qzeros"]), lin.qzeros.numpy())
    np.testing.assert_allclose(
        np.asarray(t["scales"], np.float32),
        lin.scales.numpy().reshape(-1),
        rtol=1e-6,
    )


def test_ort_export_dequants_via_reference_kernel(ref_ort):
    """End check: the reference's own dequantize_blockwise_4bits applied
    to OUR exported ORT buffers reproduces our dequantized weights."""
    mod, torch = ref_ort
    from qllm_tpu.quant.layouts import export_layout
    from qllm_tpu.quant.qtensor import dequantize_tensor, quantize_tensor

    rng = np.random.default_rng(4)
    K, N, g = 128, 40, 32
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.1)
    qt = quantize_tensor(w, bits=4, group_size=g)
    t = export_layout(qt, "ORT")
    fv, _, _ = mod.dequantize_blockwise_4bits(
        torch.from_numpy(np.asarray(t["qweight"])),
        torch.from_numpy(np.asarray(t["scales"], np.float32)).reshape(N, -1),
        torch.from_numpy(np.asarray(t["qzeros"])),
        torch.from_numpy(np.asarray(t["g_idx"])).long(),
        K,
        N,
    )
    np.testing.assert_allclose(
        fv.numpy().T, np.asarray(dequantize_tensor(qt)), atol=2e-3
    )
