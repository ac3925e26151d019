"""com.microsoft::MatMulNBits graph export for quantized linears.

Reference behavior being matched: every QuantLinear symbolic() lowers to
a ``com.microsoft::MatMulNBits`` node with K/N/bits/block_size
attributes (quant_linear_gptq.py:57-68 with packing="gptq",
quant_linear_onnxruntime.py:17-29 with the MatMulNBits tensor layout),
exported through torch.onnx (utils/onnx/exporter.py). Here the node and
its initializers are built directly — the packed tensors come from the
ORT layout converter (quant/layouts.py `_export_ort`: qweight
[N, K/g, g/2] uint8, packed uint8 zeros, n-major flat scales), which is
bit-exact against onnxruntime's MatMulNBits expectations by
construction (tests/test_layouts.py round-trips).

No ``onnx`` package is required: export/onnx_proto.py writes the
protobuf wire format itself. When the package IS installed the
artifacts load with ``onnx.load`` / run under onnxruntime's CPU/CUDA
EPs unchanged.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from ..quant.qtensor import QuantizedTensor
from .onnx_proto import (
    DT,
    AttributeProto,
    GraphProto,
    ModelProto,
    NodeProto,
    TensorProto,
    ValueInfoProto,
)

__all__ = [
    "matmulnbits_node",
    "build_matmulnbits_model",
    "export_linears_onnx",
]


def _ort_tensors_float_zp(qt: QuantizedTensor) -> dict:
    """ORT MatMulNBits tensors with FLOAT zero_points (the layout
    onnxruntime's dequantize_blockwise_4bits takes when zero_point.dtype
    == scale.dtype, quant_linear_onnxruntime.py:58-60) — needed for
    HQQ-style fractional zeros that cannot integer-pack."""
    from ..quant.qtensor import unpack_rows

    K, N = qt.in_features, qt.out_features
    g = qt.effective_group_size
    G = K // g
    q = np.asarray(unpack_rows(qt.qweight, qt.bits, K))  # [K, N]
    if qt.perm is not None:
        perm = np.asarray(qt.perm)
        q_orig = np.empty_like(q)
        q_orig[perm] = q
        q = q_orig
    scales = np.asarray(qt.scales, np.float32)  # [G, N]
    zeros = np.asarray(qt.zeros, np.float32)
    if qt.zeros_prefolded:
        zeros = zeros / scales
    qT = q.T.astype(np.uint8)
    qw = (qT[:, 0::2] | (qT[:, 1::2] << 4)).reshape(N, G, g // 2)
    return {
        "qweight": qw,
        "qzeros": zeros.T.reshape(-1),  # n-major flat, float
        "scales": scales.T.reshape(-1),
        "g_idx": None,
    }


def matmulnbits_node(
    qt: QuantizedTensor,
    name: str,
    input_name: str,
    output_name: str,
    act_dtype: int = DT.FLOAT16,
):
    """One MatMulNBits node + its initializers for a quantized linear.

    Returns (node, initializers). Attribute set mirrors the reference
    symbolic: K, N, bits, block_size (quant_linear_gptq.py:57-68)."""
    from ..quant.layouts import export_layout

    if qt.bits != 4:
        raise ValueError("MatMulNBits export is 4-bit (ORT layout) only")
    try:
        t = export_layout(qt, "ORT")
        float_zp = False
    except ValueError:
        t = _ort_tensors_float_zp(qt)
        float_zp = True
    K, N = qt.in_features, qt.out_features
    g = qt.effective_group_size
    inits = [
        TensorProto(f"{name}.qweight", np.asarray(t["qweight"], np.uint8)),
        TensorProto(
            f"{name}.scales",
            np.asarray(t["scales"]).astype(
                np.float16 if act_dtype == DT.FLOAT16 else np.float32
            ),
        ),
        TensorProto(
            f"{name}.qzeros",
            np.asarray(t["qzeros"]).astype(
                (np.float16 if act_dtype == DT.FLOAT16 else np.float32)
                if float_zp
                else np.uint8
            ),
        ),
    ]
    inputs = [
        input_name,
        f"{name}.qweight",
        f"{name}.scales",
        f"{name}.qzeros",
    ]
    g_idx = t.get("g_idx")
    is_trivial = g_idx is None or bool(
        np.array_equal(np.asarray(g_idx), np.arange(K) // g)
    )
    if not is_trivial:
        inits.append(
            TensorProto(f"{name}.g_idx", np.asarray(g_idx, np.int32))
        )
        inputs.append(f"{name}.g_idx")
    node = NodeProto(
        op_type="MatMulNBits",
        domain="com.microsoft",
        name=name,
        inputs=inputs,
        outputs=[output_name],
        attributes=[
            AttributeProto("K", i=K),
            AttributeProto("N", i=N),
            AttributeProto("bits", i=qt.bits),
            AttributeProto("block_size", i=g),
        ],
    )
    return node, inits


def build_matmulnbits_graph(
    qts: Dict[str, QuantizedTensor],
    act_dtype: int = DT.FLOAT16,
    graph_name: str = "qllm_tpu_matmulnbits",
) -> GraphProto:
    """GraphProto with one MatMulNBits node per linear.

    All linears sharing an in_features get a shared graph input
    ``x_{K}`` with symbolic batch dim; each node writes its own output
    (the q/k/v-style fan-out the reference decoder graph contains)."""
    nodes: List[NodeProto] = []
    inits: List[TensorProto] = []
    inputs: Dict[int, ValueInfoProto] = {}
    outputs: List[ValueInfoProto] = []
    for name, qt in qts.items():
        xin = f"x_{qt.in_features}"
        if qt.in_features not in inputs:
            inputs[qt.in_features] = ValueInfoProto(
                xin, act_dtype, ["batch", qt.in_features]
            )
        node, ni = matmulnbits_node(qt, name, xin, f"{name}.out", act_dtype)
        nodes.append(node)
        inits.extend(ni)
        outputs.append(
            ValueInfoProto(
                f"{name}.out", act_dtype, ["batch", qt.out_features]
            )
        )
    return GraphProto(
        name=graph_name,
        nodes=nodes,
        inputs=list(inputs.values()),
        outputs=outputs,
        initializers=inits,
    )


def build_matmulnbits_model(
    qts: Dict[str, QuantizedTensor],
    act_dtype: int = DT.FLOAT16,
    graph_name: str = "qllm_tpu_matmulnbits",
) -> bytes:
    """ModelProto bytes form of build_matmulnbits_graph."""
    return ModelProto(
        build_matmulnbits_graph(qts, act_dtype, graph_name)
    ).encode()


def export_linears_onnx(
    params: Dict,
    out_dir: str,
    layer_filter: Optional[List[str]] = None,
    act_dtype: int = DT.FLOAT16,
) -> List[str]:
    """Write one .onnx per transformer block holding that block's
    quantized linears as MatMulNBits nodes (interchange artifacts for
    onnxruntime toolchains; the reference's merged-decoder role is
    filled natively by export/exporter.py's StableHLO path)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for i, lp in enumerate(params.get("layers", [])):
        qts = {
            f"model.layers.{i}.{n}": w
            for n, w in lp.items()
            if isinstance(w, QuantizedTensor)
            and w.bits == 4
            and (layer_filter is None or n in layer_filter)
        }
        if not qts:
            continue
        path = os.path.join(out_dir, f"layer_{i}.onnx")
        with open(path, "wb") as f:
            f.write(build_matmulnbits_model(qts, act_dtype))
        written.append(path)
    lm = params.get("lm_head")
    if isinstance(lm, QuantizedTensor) and lm.bits == 4:
        path = os.path.join(out_dir, "lm_head.onnx")
        with open(path, "wb") as f:
            f.write(build_matmulnbits_model({"lm_head": lm}, act_dtype))
        written.append(path)
    return written
