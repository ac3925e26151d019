"""MatMulNBits ONNX export: wire-format round-trip + structure checks.

The env has no `onnx` package; export/onnx_proto.py writes the protobuf
itself and these tests parse it back (plus onnx.checker when the
package exists)."""

import numpy as np
import jax.numpy as jnp
import pytest

from qllm_tpu.export.onnx_matmulnbits import (
    build_matmulnbits_model,
    export_linears_onnx,
    matmulnbits_node,
)
from qllm_tpu.export.onnx_proto import DT, parse_model
from qllm_tpu.quant.qtensor import quantize_tensor


def _qt(K=128, N=64, g=32, seed=0):
    rng = np.random.default_rng(seed)
    w = jnp.asarray(rng.normal(size=(K, N)).astype(np.float32) * 0.05)
    return quantize_tensor(w, bits=4, group_size=g)


def test_matmulnbits_node_structure():
    qt = _qt()
    node, inits = matmulnbits_node(qt, "l0.q_proj", "x", "y")
    assert node.op_type == "MatMulNBits"
    assert node.domain == "com.microsoft"
    attrs = {a.name: a.i for a in node.attributes}
    assert attrs == {"K": 128, "N": 64, "bits": 4, "block_size": 32}
    names = [t.name for t in inits]
    assert names == ["l0.q_proj.qweight", "l0.q_proj.scales", "l0.q_proj.qzeros"]
    # ORT MatMulNBits layout: qweight [N, K/g, g/2] uint8
    assert inits[0].array.shape == (64, 4, 16)
    assert inits[0].array.dtype == np.uint8
    assert inits[1].array.shape == (64 * 4,)  # n-major flat scales


def test_model_roundtrip_parse():
    qts = {"q_proj": _qt(seed=1), "k_proj": _qt(seed=2), "down": _qt(256, 128, 64, 3)}
    data = build_matmulnbits_model(qts)
    m = parse_model(data)
    assert {o["domain"]: o["version"] for o in m["opset_imports"]}[
        "com.microsoft"
    ] == 1
    g = m["graph"]
    assert len(g["nodes"]) == 3
    ops = {n["name"]: n for n in g["nodes"]}
    assert ops["q_proj"]["op_type"] == "MatMulNBits"
    assert ops["q_proj"]["attributes"]["K"]["i"] == 128
    assert ops["down"]["attributes"]["block_size"]["i"] == 64
    # q_proj and k_proj share the x_128 input; down gets x_256
    assert ops["q_proj"]["inputs"][0] == "x_128"
    assert ops["k_proj"]["inputs"][0] == "x_128"
    assert ops["down"]["inputs"][0] == "x_256"
    assert {v["name"] for v in g["inputs"]} == {"x_128", "x_256"}
    # initializers parse back bit-exact
    from qllm_tpu.quant.layouts import export_layout

    t = export_layout(qts["q_proj"], "ORT")
    np.testing.assert_array_equal(
        g["initializers"]["q_proj.qweight"]["array"], np.asarray(t["qweight"])
    )
    qz = g["initializers"]["q_proj.qzeros"]
    np.testing.assert_array_equal(
        qz["array"], np.asarray(t["qzeros"]).reshape(qz["dims"])
    )


def test_numeric_dequant_from_parsed_model():
    """Dequantizing the PARSED initializers reproduces the original
    quantized weight — the interchange actually carries the weights."""
    qt = _qt(K=128, N=64, g=32, seed=7)
    data = build_matmulnbits_model({"w": qt})
    g = parse_model(data)["graph"]
    from qllm_tpu.quant.layouts import import_layout
    from qllm_tpu.quant.qtensor import dequantize_tensor

    t = {
        "qweight": g["initializers"]["w.qweight"]["array"],
        "qzeros": g["initializers"]["w.qzeros"]["array"],
        "scales": g["initializers"]["w.scales"]["array"],
        "g_idx": None,
    }
    qt2 = import_layout(t, "ORT", 4, 32)
    np.testing.assert_allclose(
        np.asarray(dequantize_tensor(qt2)),
        np.asarray(dequantize_tensor(qt)),
        atol=2e-3,
        rtol=1e-2,
    )


def test_export_linears_onnx(tmp_path):
    import jax

    from qllm_tpu.models import TINY_LLAMA_TEST_CONFIG, init_params
    from qllm_tpu.models.llama import LINEAR_NAMES

    params = init_params(TINY_LLAMA_TEST_CONFIG, jax.random.key(0))
    qparams = dict(params)
    qparams["layers"] = [
        {
            n: (
                quantize_tensor(w.astype(jnp.float32), bits=4, group_size=32)
                if n in LINEAR_NAMES
                else w
            )
            for n, w in lp.items()
        }
        for lp in params["layers"]
    ]
    files = export_linears_onnx(qparams, str(tmp_path))
    assert len(files) == TINY_LLAMA_TEST_CONFIG.num_hidden_layers
    m = parse_model(open(files[0], "rb").read())
    ops = [n["op_type"] for n in m["graph"]["nodes"]]
    assert set(ops) == {"MatMulNBits"}
    assert len(ops) == 7  # q/k/v/o + gate/up/down


def test_onnx_checker_when_available():
    onnx = pytest.importorskip("onnx")
    data = build_matmulnbits_model({"w": _qt()})
    m = onnx.load_from_string(data)
    onnx.checker.check_model(m)
