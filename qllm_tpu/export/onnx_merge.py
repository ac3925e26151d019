"""Merged-decoder ONNX export: fuse prefill + decode graphs with an If node.

Reference behavior matched: qllm/utils/onnx/merge_encoder_decoder.py
`merge_decoders` (:325-480) — the exported `decoder_model.onnx` and
`decoder_with_past_model.onnx` become ONE artifact whose single `If`
node switches on a `use_cache_branch` bool input, with weight
initializers deduplicated into the parent graph so the merged file does
not double the checkpoint bytes (:34-127).

Differences by design (TPU repo): the reference performs protobuf
surgery on torch-exported ModelProtos via the ``onnx`` package; here the
merge is a pure function over our own GraphProto dataclasses
(export/onnx_proto.py), so it needs no ``onnx`` install and composes
with the MatMulNBits builders (export/onnx_matmulnbits.py). ONNX `If`
scoping rules are the same: branch subgraphs have no inputs of their
own and capture parent-scope names; both branches must produce the same
output names/count.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np

from .onnx_proto import (
    DT,
    AttributeProto,
    GraphProto,
    ModelProto,
    NodeProto,
    TensorProto,
    ValueInfoProto,
)

__all__ = ["merge_decoders"]


def _tensor_digest(t: TensorProto) -> Tuple:
    a = np.ascontiguousarray(t.array)
    h = hashlib.sha512()
    h.update(a.tobytes())
    return (str(a.dtype), a.shape, h.hexdigest())


def _keep_in_branch(t: TensorProto) -> bool:
    """Small control tensors stay in their branch (reference keeps dim-0
    scalars and dim-1 int32/int64 index vectors in the subgraphs —
    merge_encoder_decoder.py:389-399 — both for readability and because
    onnxruntime's optimizer chokes on hoisted ones)."""
    a = t.array
    return a.ndim == 0 or (a.ndim == 1 and a.dtype in (np.int32, np.int64))


def _rewrite_node_inputs(nodes: List[NodeProto], ren: Dict[str, str]) -> None:
    for n in nodes:
        n.inputs = [ren.get(x, x) for x in n.inputs]
        # recurse into nested subgraphs (If inside a branch)
        for a in n.attributes:
            if a.g is not None:
                _rewrite_node_inputs(a.g.nodes, ren)


def merge_decoders(
    decoder: GraphProto,
    decoder_with_past: GraphProto,
    graph_name: str = "merged",
    producer_name: str = "qllm_tpu",
    opset_imports=None,
) -> bytes:
    """Fuse a no-past decoder graph and a with-past decoder graph into
    one ModelProto (bytes) gated by a ``use_cache_branch`` bool input.

    Both graphs are consumed (their node input names may be rewritten to
    the deduplicated initializer names). Outputs must match by name and
    order — our exporters emit identical output names for both phases,
    so no positional re-unification is needed (the reference's
    _unify_onnx_outputs handles torch-assigned mismatches instead).
    """
    g1, g2 = decoder, decoder_with_past
    out1 = [v.name for v in g1.outputs]
    out2 = [v.name for v in g2.outputs]
    if out1 != out2:
        raise ValueError(
            f"branch outputs differ: {out1} vs {out2} — emit both phases "
            "with identical output names before merging"
        )

    # --- deduplicate big initializers into the parent scope ------------
    by_digest: Dict[Tuple, List[Tuple[int, TensorProto]]] = {}
    for mi, g in enumerate((g1, g2)):
        for t in g.initializers:
            if _keep_in_branch(t):
                continue
            by_digest.setdefault(_tensor_digest(t), []).append((mi, t))

    parent_inits: List[TensorProto] = []
    renames: List[Dict[str, str]] = [{}, {}]
    used_names: Dict[str, int] = {}
    for group in by_digest.values():
        common = group[0][1].name
        # two distinct weights may carry the same name across branches
        # (torch exporters do this); disambiguate deterministically
        n_prior = used_names.get(common, 0)
        used_names[common] = n_prior + 1
        shared = common if n_prior == 0 else f"{common}_{graph_name}_{n_prior}"
        parent_inits.append(TensorProto(shared, group[0][1].array))
        for mi, t in group:
            if t.name != shared:
                renames[mi][t.name] = shared

    hoisted = {id(t) for group in by_digest.values() for _, t in group}
    for mi, g in enumerate((g1, g2)):
        g.initializers = [t for t in g.initializers if id(t) not in hoisted]
        if renames[mi]:
            _rewrite_node_inputs(g.nodes, renames[mi])

    # --- branch subgraphs: no inputs (capture parent scope) ------------
    no_past = GraphProto(
        name="no_past",
        nodes=g1.nodes,
        inputs=[],
        outputs=g1.outputs,
        initializers=g1.initializers,
    )
    with_past = GraphProto(
        name="with_past",
        nodes=g2.nodes,
        inputs=[],
        outputs=g2.outputs,
        initializers=g2.initializers,
    )

    if_node = NodeProto(
        op_type="If",
        name=f"{producer_name}::if",
        inputs=["use_cache_branch"],
        outputs=out1,
        attributes=[
            AttributeProto("then_branch", g=with_past),
            AttributeProto("else_branch", g=no_past),
        ],
    )

    # parent inputs: union by name, decoder order first, then the
    # with-past extras (past KV tensors), then the branch selector
    seen = set()
    all_inputs: List[ValueInfoProto] = []
    for v in list(g1.inputs) + list(g2.inputs):
        if v.name not in seen:
            seen.add(v.name)
            all_inputs.append(v)
    all_inputs.append(ValueInfoProto("use_cache_branch", DT.BOOL, [1]))

    merged = GraphProto(
        name=graph_name,
        nodes=[if_node],
        inputs=all_inputs,
        outputs=g1.outputs,
        initializers=parent_inits,
    )
    kwargs = {} if opset_imports is None else {"opset_imports": opset_imports}
    return ModelProto(
        merged, producer_name=producer_name, **kwargs
    ).encode()
