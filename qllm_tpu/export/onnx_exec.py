"""Pure-numpy ONNX graph evaluator (the offline onnxruntime stand-in).

The reference verifies its exported decoder by running it under
onnxruntime and comparing to torch (qllm/utils/onnx/exporter.py:68-128).
This environment ships no ``onnx``/``onnxruntime``, so verification is
done by EXECUTING the exported graph with this evaluator — an
independent interpretation of the serialized bytes (parsed back via
export/onnx_proto.parse_model), compared against eval/numpy_ref.py.

Covers exactly the opset-17 subset the decoder builder emits plus
``com.microsoft::MatMulNBits`` with onnxruntime's packed-tensor
semantics (quant_linear_onnxruntime.py:52-85 dequantize_blockwise_4bits:
qweight [N,G,g/2] low-nibble-first along K, zero_points n-major
G-pairs, scales n-major flat, optional g_idx for act_order).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .onnx_proto import DT, DT_TO_NP, parse_model

__all__ = ["run_model", "run_graph"]


def _attr(node, name, default=None):
    a = node["attributes"].get(name)
    if a is None:
        return default
    for k in ("i", "f", "s", "g", "t"):
        if k in a:
            return a[k]
    return a.get("ints", default)


def _matmul_nbits(env, node):
    a = env[node["inputs"][0]]
    qw = env[node["inputs"][1]]  # [N, G, blob] uint8
    scales = np.asarray(env[node["inputs"][2]])
    zp = env[node["inputs"][3]] if len(node["inputs"]) > 3 else None
    g_idx = (
        env[node["inputs"][4]]
        if len(node["inputs"]) > 4 and node["inputs"][4]
        else None
    )
    K = _attr(node, "K")
    N = _attr(node, "N")
    bits = _attr(node, "bits")
    bs = _attr(node, "block_size")
    if bits != 4:
        raise NotImplementedError("numpy MatMulNBits supports 4 bits")
    G = qw.shape[1]
    flat = qw.reshape(N, -1)
    q = np.empty((N, flat.shape[1] * 2), np.float32)
    q[:, 0::2] = flat & 0xF
    q[:, 1::2] = (flat >> 4) & 0xF
    q = q[:, :K]
    s = scales.reshape(N, G).astype(np.float32)
    if zp is None:
        z = np.full((N, G), 8.0, np.float32)
    elif zp.dtype in (np.float32, np.float16):
        z = zp.reshape(N, G).astype(np.float32)
    else:
        zflat = np.asarray(zp).reshape(N, -1)
        z = np.empty((N, zflat.shape[1] * 2), np.float32)
        z[:, 0::2] = zflat & 0xF
        z[:, 1::2] = (zflat >> 4) & 0xF
        z = z[:, :G]
    if g_idx is not None and not np.array_equal(
        np.asarray(g_idx), np.arange(K) // bs
    ):
        gi = np.asarray(g_idx)
    else:
        gi = np.arange(K) // bs
    w = (q - z[:, gi]) * s[:, gi]  # [N, K]
    return (np.asarray(a, np.float32) @ w.T).astype(a.dtype)


def _reshape(x, shape, allowzero=0):
    shape = [int(v) for v in shape]
    out = []
    for i, v in enumerate(shape):
        if v == 0 and not allowzero:
            out.append(x.shape[i])
        else:
            out.append(v)
    return x.reshape(out)


def _slice(env, node):
    x = env[node["inputs"][0]]
    starts = env[node["inputs"][1]].tolist()
    ends = env[node["inputs"][2]].tolist()
    axes = (
        env[node["inputs"][3]].tolist()
        if len(node["inputs"]) > 3
        else list(range(len(starts)))
    )
    steps = (
        env[node["inputs"][4]].tolist()
        if len(node["inputs"]) > 4
        else [1] * len(starts)
    )
    sl = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        en = min(en, np.iinfo(np.int32).max)
        sl[ax] = slice(st, en, sp)
    return x[tuple(sl)]


def _softmax(x, axis):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp((x - m).astype(np.float32))
    return (e / e.sum(axis=axis, keepdims=True)).astype(x.dtype)


def run_graph(g: Dict, env: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Execute a parsed GraphProto dict. ``env`` supplies feeds and
    (for If branches) captured parent scope; mutated in place."""
    for name, t in g["initializers"].items():
        if "array" in t and name not in env:
            env[name] = t["array"]
    for node in g["nodes"]:
        op = node["op_type"]
        ins = [env[n] if n else None for n in node["inputs"]]
        o = node["outputs"][0]
        if op == "MatMulNBits":
            env[o] = _matmul_nbits(env, node)
        elif op == "MatMul":
            env[o] = np.matmul(
                ins[0].astype(np.float32), ins[1].astype(np.float32)
            ).astype(ins[0].dtype)
        elif op == "Gather":
            env[o] = np.take(ins[0], ins[1], axis=_attr(node, "axis", 0))
        elif op == "Add":
            env[o] = ins[0] + ins[1]
        elif op == "Sub":
            env[o] = ins[0] - ins[1]
        elif op == "Mul":
            env[o] = ins[0] * ins[1]
        elif op == "Div":
            env[o] = ins[0] / ins[1]
        elif op == "Neg":
            env[o] = -ins[0]
        elif op == "Sqrt":
            env[o] = np.sqrt(ins[0])
        elif op == "Pow":
            env[o] = ins[0] ** ins[1]
        elif op == "Cos":
            env[o] = np.cos(ins[0])
        elif op == "Sin":
            env[o] = np.sin(ins[0])
        elif op == "Sigmoid":
            env[o] = (1.0 / (1.0 + np.exp(-ins[0].astype(np.float32)))).astype(
                ins[0].dtype
            )
        elif op == "Tanh":
            env[o] = np.tanh(ins[0])
        elif op == "Relu":
            env[o] = np.maximum(ins[0], 0)
        elif op == "Softmax":
            env[o] = _softmax(ins[0], _attr(node, "axis", -1))
        elif op == "ReduceMean":
            axes = tuple(_attr(node, "axes"))
            env[o] = ins[0].mean(
                axis=axes, keepdims=bool(_attr(node, "keepdims", 1))
            )
        elif op == "Reshape":
            env[o] = _reshape(ins[0], ins[1], _attr(node, "allowzero", 0))
        elif op == "Transpose":
            env[o] = np.transpose(ins[0], _attr(node, "perm"))
        elif op == "Concat":
            env[o] = np.concatenate(ins, axis=_attr(node, "axis"))
        elif op == "Unsqueeze":
            env[o] = np.expand_dims(ins[0], tuple(ins[1].tolist()))
        elif op == "Squeeze":
            env[o] = np.squeeze(ins[0], tuple(ins[1].tolist()))
        elif op == "Slice":
            env[o] = _slice(env, node)
        elif op == "Shape":
            env[o] = np.asarray(ins[0].shape, np.int64)
        elif op == "ConstantOfShape":
            t = _attr(node, "value")
            fill = t["array"] if t is not None else np.zeros(1, np.float32)
            env[o] = np.full(
                tuple(int(v) for v in ins[0]), fill.reshape(-1)[0], fill.dtype
            )
        elif op == "Trilu":
            k = int(ins[1]) if len(ins) > 1 and ins[1] is not None else 0
            if _attr(node, "upper", 1):
                env[o] = np.triu(ins[0], k)
            else:
                env[o] = np.tril(ins[0], k)
        elif op == "Cast":
            env[o] = ins[0].astype(DT_TO_NP[_attr(node, "to")])
        elif op == "Identity":
            env[o] = ins[0]
        elif op == "Where":
            env[o] = np.where(ins[0], ins[1], ins[2])
        elif op == "Range":
            env[o] = np.arange(
                int(np.asarray(ins[0]).reshape(-1)[0]),
                int(np.asarray(ins[1]).reshape(-1)[0]),
                int(np.asarray(ins[2]).reshape(-1)[0]),
            )
        elif op == "Expand":
            env[o] = np.broadcast_to(
                ins[0], np.broadcast_shapes(ins[0].shape, tuple(ins[1]))
            )
        elif op == "TopK":
            ax = _attr(node, "axis", -1)
            kk = int(np.asarray(ins[1]).reshape(-1)[0])
            # largest, sorted (the defaults the exporter emits); stable
            # lowest-index tie order matches lax.top_k / torch.topk
            idx = np.argsort(-ins[0], axis=ax, kind="stable")
            idx = np.take(idx, np.arange(kk), axis=ax)
            vals = np.take_along_axis(ins[0], idx, axis=ax)
            env[o] = vals
            if len(node["outputs"]) > 1:
                env[node["outputs"][1]] = idx.astype(np.int64)
        elif op == "ScatterElements":
            ax = _attr(node, "axis", 0)
            out = np.copy(ins[0])
            np.put_along_axis(out, ins[1].astype(np.int64), ins[2], ax)
            env[o] = out
        elif op == "ReduceSum":
            axes = (
                tuple(int(a) for a in np.asarray(ins[1]).reshape(-1))
                if len(ins) > 1 and ins[1] is not None
                else None
            )
            env[o] = ins[0].sum(
                axis=axes, keepdims=bool(_attr(node, "keepdims", 1))
            ).astype(ins[0].dtype)
        elif op == "ReduceMax":
            axes = (
                tuple(int(a) for a in np.asarray(ins[1]).reshape(-1))
                if len(ins) > 1 and ins[1] is not None
                else None
            )
            env[o] = ins[0].max(
                axis=axes, keepdims=bool(_attr(node, "keepdims", 1))
            )
        elif op == "If":
            branch = (
                _attr(node, "then_branch")
                if bool(np.asarray(ins[0]).reshape(-1)[0])
                else _attr(node, "else_branch")
            )
            run_graph(branch, env)
            for bo, no in zip(
                [v["name"] for v in branch["outputs"]], node["outputs"]
            ):
                env[no] = env[bo]
            continue
        else:
            raise NotImplementedError(f"numpy evaluator: op {op}")
    return env


def run_model(
    model_bytes: bytes, feeds: Dict[str, np.ndarray]
) -> Dict[str, np.ndarray]:
    """Parse serialized ModelProto bytes and return its graph outputs."""
    m = parse_model(model_bytes)
    g = m["graph"]
    env: Dict[str, np.ndarray] = {
        k: np.asarray(v) for k, v in feeds.items()
    }
    run_graph(g, env)
    return {v["name"]: env[v["name"]] for v in g["outputs"]}
