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


# ---------------------------------------------------------------------------
# merge_decoders: If-node fusion of prefill + with-past graphs
# (reference: qllm/utils/onnx/merge_encoder_decoder.py merge_decoders)
# ---------------------------------------------------------------------------


def _two_phase_graphs():
    """Prefill and with-past MatMulNBits graphs over the SAME weights,
    with an extra past input + a small int64 position initializer on the
    with-past side (shape of the reference's decoder pair)."""
    from qllm_tpu.export.onnx_matmulnbits import build_matmulnbits_graph
    from qllm_tpu.export.onnx_proto import NodeProto, TensorProto, ValueInfoProto

    qts = {"q_proj": _qt(seed=1), "k_proj": _qt(seed=2)}
    prefill = build_matmulnbits_graph(qts, graph_name="decoder")
    with_past = build_matmulnbits_graph(qts, graph_name="decoder_with_past")
    with_past.inputs.append(
        ValueInfoProto("past_key", DT.FLOAT16, ["batch", "past_len", 64])
    )
    with_past.initializers.append(
        TensorProto("pos_step", np.asarray([1], np.int64))
    )
    # consume the extras so they are live edges, matching real graphs
    with_past.nodes.append(
        NodeProto(
            op_type="Shape",
            name="past_shape",
            inputs=["past_key", "pos_step"],
            outputs=["unused_shape"],
        )
    )
    return prefill, with_past


def test_merge_decoders_structure():
    from qllm_tpu.export.onnx_merge import merge_decoders

    prefill, with_past = _two_phase_graphs()
    data = merge_decoders(prefill, with_past, graph_name="merged")
    m = parse_model(data)
    g = m["graph"]
    # parent graph: exactly one If node switching on use_cache_branch
    assert [n["op_type"] for n in g["nodes"]] == ["If"]
    if_node = g["nodes"][0]
    assert if_node["inputs"] == ["use_cache_branch"]
    assert sorted(if_node["outputs"]) == ["k_proj.out", "q_proj.out"]
    names = [v["name"] for v in g["inputs"]]
    assert names[-1] == "use_cache_branch"
    assert "past_key" in names and "x_128" in names
    assert names.count("x_128") == 1  # union, not concat

    then_b = if_node["attributes"]["then_branch"]["g"]
    else_b = if_node["attributes"]["else_branch"]["g"]
    assert {n["op_type"] for n in then_b["nodes"]} == {"MatMulNBits", "Shape"}
    assert {n["op_type"] for n in else_b["nodes"]} == {"MatMulNBits"}
    # branch subgraphs capture the parent scope: no own inputs
    assert then_b["inputs"] == [] and else_b["inputs"] == []


def test_merge_decoders_dedups_weights():
    from qllm_tpu.export.onnx_merge import merge_decoders

    from qllm_tpu.export.onnx_proto import ModelProto

    prefill, with_past = _two_phase_graphs()
    raw1 = len(prefill.initializers) + len(with_past.initializers)
    # sizes BEFORE the merge consumes the graphs (it hoists initializers)
    standalone = len(ModelProto(prefill).encode()) + len(
        ModelProto(with_past).encode()
    )
    data = merge_decoders(prefill, with_past)
    m = parse_model(data)
    g = m["graph"]
    if_node = g["nodes"][0]
    then_b = if_node["attributes"]["then_branch"]["g"]
    else_b = if_node["attributes"]["else_branch"]["g"]
    # the 6 shared weight tensors hoisted ONCE into the parent
    assert len(g["initializers"]) == 6
    assert raw1 == 6 * 2 + 1
    # small int64 control tensor stays in its branch (readability +
    # onnxruntime-optimizer rule the reference follows)
    assert list(then_b["initializers"]) == ["pos_step"]
    assert list(else_b["initializers"]) == []
    # merged bytes ~ half of two standalone models: dedup is real
    assert len(data) < standalone  # strictly smaller even with If wrapper


def test_merge_decoders_renames_colliding_initializers():
    """Same name, different content across branches -> the second gets a
    suffixed parent name and node inputs are rewritten."""
    from qllm_tpu.export.onnx_merge import merge_decoders
    from qllm_tpu.export.onnx_matmulnbits import build_matmulnbits_graph

    g1 = build_matmulnbits_graph({"w": _qt(seed=3)}, graph_name="a")
    g2 = build_matmulnbits_graph({"w": _qt(seed=4)}, graph_name="b")
    data = merge_decoders(g1, g2)
    g = parse_model(data)["graph"]
    names = set(g["initializers"])
    assert "w.qweight" in names
    assert any(n.startswith("w.qweight_merged_") for n in names)
    if_node = g["nodes"][0]
    then_b = if_node["attributes"]["then_branch"]["g"]
    mm = [n for n in then_b["nodes"] if n["op_type"] == "MatMulNBits"][0]
    assert mm["inputs"][1] in names  # rewritten to the parent name


def test_merge_decoders_checker_when_available():
    onnx = pytest.importorskip("onnx")
    from qllm_tpu.export.onnx_merge import merge_decoders

    prefill, with_past = _two_phase_graphs()
    # drop the fake Shape node (invalid arity) for the strict checker
    with_past.nodes = with_past.nodes[:-1]
    with_past.initializers = with_past.initializers[:-1]
    data = merge_decoders(prefill, with_past)
    onnx.checker.check_model(onnx.load_from_string(data))
