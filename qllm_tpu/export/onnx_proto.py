"""Minimal ONNX protobuf wire-format writer/reader (no deps).

The environment has no ``onnx`` package, but ONNX files are plain
protobuf — this module encodes exactly the message subset needed to
emit ``com.microsoft::MatMulNBits`` graphs (export/onnx_matmulnbits.py)
and to parse them back for verification. Field numbers follow
onnx/onnx.proto (IR). Only non-negative varint ints are needed.

This is the TPU-repo replacement for the reference's dependence on
torch.onnx + onnxruntime's large_model_exporter
(qllm/utils/onnx/exporter.py:11-65): the quantized-weight graph nodes
themselves (quant_linear_gptq.py:57-68, quant_linear_onnxruntime.py:
17-29) are fully specified and need no torch tracer.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = [
    "TensorProto",
    "AttributeProto",
    "NodeProto",
    "ValueInfoProto",
    "GraphProto",
    "ModelProto",
    "DT",
    "parse_model",
]


class DT:
    """onnx.TensorProto.DataType values."""

    FLOAT = 1
    UINT8 = 2
    INT8 = 3
    UINT16 = 4
    INT16 = 5
    INT32 = 6
    INT64 = 7
    BOOL = 9
    FLOAT16 = 10
    DOUBLE = 11
    UINT32 = 12
    BFLOAT16 = 16


_NP_TO_DT = {
    np.dtype(np.float32): DT.FLOAT,
    np.dtype(np.uint8): DT.UINT8,
    np.dtype(np.int8): DT.INT8,
    np.dtype(np.uint16): DT.UINT16,
    np.dtype(np.int16): DT.INT16,
    np.dtype(np.int32): DT.INT32,
    np.dtype(np.int64): DT.INT64,
    np.dtype(np.bool_): DT.BOOL,
    np.dtype(np.float16): DT.FLOAT16,
    np.dtype(np.float64): DT.DOUBLE,
    np.dtype(np.uint32): DT.UINT32,
}
DT_TO_NP = {v: k for k, v in _NP_TO_DT.items()}


def _varint(n: int) -> bytes:
    out = bytearray()
    n = int(n)
    if n < 0:
        # protobuf int64: negative values use 64-bit two's complement
        # (10-byte varint) — needed for axis=-1 style attributes
        n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field_num: int, wire: int) -> bytes:
    return _varint((field_num << 3) | wire)


def _f_varint(field_num: int, value: int) -> bytes:
    return _key(field_num, 0) + _varint(value)


def _f_bytes(field_num: int, data: bytes) -> bytes:
    return _key(field_num, 2) + _varint(len(data)) + data


def _f_str(field_num: int, s: str) -> bytes:
    return _f_bytes(field_num, s.encode("utf-8"))


def _f_float(field_num: int, v: float) -> bytes:
    return _key(field_num, 5) + struct.pack("<f", v)


@dataclass
class TensorProto:
    name: str
    array: np.ndarray

    def encode(self) -> bytes:
        a = np.ascontiguousarray(self.array)
        dt = _NP_TO_DT[a.dtype]
        out = b""
        for d in a.shape:
            out += _f_varint(1, d)  # dims
        out += _f_varint(2, dt)  # data_type
        out += _f_str(8, self.name)  # name
        out += _f_bytes(9, a.tobytes())  # raw_data
        return out


@dataclass
class AttributeProto:
    name: str
    i: Optional[int] = None
    f: Optional[float] = None
    s: Optional[str] = None
    ints: Optional[List[int]] = None
    g: Optional["GraphProto"] = None  # subgraph (If branches)
    t: Optional["TensorProto"] = None  # tensor (ConstantOfShape value)

    def encode(self) -> bytes:
        out = _f_str(1, self.name)
        if self.i is not None:
            out += _f_varint(3, self.i) + _f_varint(20, 2)  # INT
        elif self.f is not None:
            out += _f_float(2, self.f) + _f_varint(20, 1)  # FLOAT
        elif self.s is not None:
            out += _f_bytes(4, self.s.encode()) + _f_varint(20, 3)  # STRING
        elif self.ints is not None:
            for v in self.ints:
                out += _f_varint(8, v)
            out += _f_varint(20, 7)  # INTS
        elif self.g is not None:
            out += _f_bytes(6, self.g.encode()) + _f_varint(20, 5)  # GRAPH
        elif self.t is not None:
            out += _f_bytes(5, self.t.encode()) + _f_varint(20, 4)  # TENSOR
        else:
            raise ValueError(f"empty attribute {self.name}")
        return out


@dataclass
class NodeProto:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    name: str = ""
    domain: str = ""
    attributes: List[AttributeProto] = field(default_factory=list)

    def encode(self) -> bytes:
        out = b""
        for s in self.inputs:
            out += _f_str(1, s)
        for s in self.outputs:
            out += _f_str(2, s)
        if self.name:
            out += _f_str(3, self.name)
        out += _f_str(4, self.op_type)
        for a in self.attributes:
            out += _f_bytes(5, a.encode())
        if self.domain:
            out += _f_str(7, self.domain)
        return out


@dataclass
class ValueInfoProto:
    name: str
    elem_type: int
    shape: List  # ints or strings (symbolic dims)

    def encode(self) -> bytes:
        dims = b""
        for d in self.shape:
            if isinstance(d, str):
                dim = _f_str(2, d)  # dim_param
            else:
                dim = _f_varint(1, d)  # dim_value
            dims += _f_bytes(1, dim)
        tensor_type = _f_varint(1, self.elem_type) + _f_bytes(2, dims)
        type_proto = _f_bytes(1, tensor_type)
        return _f_str(1, self.name) + _f_bytes(2, type_proto)


@dataclass
class GraphProto:
    name: str
    nodes: List[NodeProto]
    inputs: List[ValueInfoProto]
    outputs: List[ValueInfoProto]
    initializers: List[TensorProto] = field(default_factory=list)

    def encode(self) -> bytes:
        out = b""
        for n in self.nodes:
            out += _f_bytes(1, n.encode())
        out += _f_str(2, self.name)
        for t in self.initializers:
            out += _f_bytes(5, t.encode())
        for v in self.inputs:
            out += _f_bytes(11, v.encode())
        for v in self.outputs:
            out += _f_bytes(12, v.encode())
        return out


@dataclass
class ModelProto:
    graph: GraphProto
    opset_imports: List[Tuple[str, int]] = field(
        default_factory=lambda: [("", 17), ("com.microsoft", 1)]
    )
    producer_name: str = "qllm_tpu"
    ir_version: int = 8

    def encode(self) -> bytes:
        out = _f_varint(1, self.ir_version)
        out += _f_str(2, self.producer_name)
        out += _f_bytes(7, self.graph.encode())
        for domain, version in self.opset_imports:
            opset = b""
            if domain:
                opset += _f_str(1, domain)
            opset += _f_varint(2, version)
            out += _f_bytes(8, opset)
        return out


# ---------------------------------------------------------------------------
# Reader (subset): enough to verify node/attribute/initializer structure
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        fnum, wire = key >> 3, key & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = struct.unpack("<f", buf[pos : pos + 4])[0]
            pos += 4
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"wire type {wire}")
        yield fnum, wire, val


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _parse_attr(buf: bytes) -> Dict:
    a: Dict = {"ints": []}
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            a["name"] = val.decode()
        elif fnum == 3:
            a["i"] = _signed(val)
        elif fnum == 2:
            a["f"] = val
        elif fnum == 4:
            a["s"] = val.decode()
        elif fnum == 5:
            a["t"] = _parse_tensor(val)
        elif fnum == 6:
            a["g"] = _parse_graph(val)
        elif fnum == 8:
            a["ints"].append(_signed(val))
        elif fnum == 20:
            a["type"] = val
    return a


def _parse_node(buf: bytes) -> Dict:
    n: Dict = {"inputs": [], "outputs": [], "attributes": {}, "domain": ""}
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            n["inputs"].append(val.decode())
        elif fnum == 2:
            n["outputs"].append(val.decode())
        elif fnum == 3:
            n["name"] = val.decode()
        elif fnum == 4:
            n["op_type"] = val.decode()
        elif fnum == 5:
            a = _parse_attr(val)
            n["attributes"][a["name"]] = a
        elif fnum == 7:
            n["domain"] = val.decode()
    return n


def _parse_tensor(buf: bytes) -> Dict:
    t: Dict = {"dims": []}
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            t["dims"].append(val)
        elif fnum == 2:
            t["data_type"] = val
        elif fnum == 8:
            t["name"] = val.decode()
        elif fnum == 9:
            t["raw_data"] = val
    if "raw_data" in t and t.get("data_type") in DT_TO_NP:
        t["array"] = np.frombuffer(
            t["raw_data"], DT_TO_NP[t["data_type"]]
        ).reshape(t["dims"])
    return t


def _parse_graph(buf: bytes) -> Dict:
    g: Dict = {"nodes": [], "initializers": {}, "inputs": [], "outputs": []}
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            g["nodes"].append(_parse_node(val))
        elif fnum == 2:
            g["name"] = val.decode()
        elif fnum == 5:
            t = _parse_tensor(val)
            g["initializers"][t["name"]] = t
        elif fnum == 11:
            g["inputs"].append(_parse_vi(val))
        elif fnum == 12:
            g["outputs"].append(_parse_vi(val))
    return g


def _parse_vi(buf: bytes) -> Dict:
    v: Dict = {"shape": []}
    for fnum, _, val in _fields(buf):
        if fnum == 1:
            v["name"] = val.decode()
        elif fnum == 2:  # TypeProto
            for f2, _, v2 in _fields(val):
                if f2 != 1:  # tensor_type
                    continue
                for f3, _, v3 in _fields(v2):
                    if f3 == 1:
                        v["elem_type"] = v3
                    elif f3 == 2:  # TensorShapeProto
                        for f4, _, v4 in _fields(v3):
                            if f4 != 1:  # Dimension
                                continue
                            for f5, _, v5 in _fields(v4):
                                if f5 == 1:
                                    v["shape"].append(v5)
                                elif f5 == 2:
                                    v["shape"].append(v5.decode())
    return v


def parse_model(data: bytes) -> Dict:
    """Parse a ModelProto (subset) back into dicts for verification."""
    m: Dict = {"opset_imports": []}
    for fnum, _, val in _fields(data):
        if fnum == 1:
            m["ir_version"] = val
        elif fnum == 2:
            m["producer_name"] = val.decode()
        elif fnum == 7:
            m["graph"] = _parse_graph(val)
        elif fnum == 8:
            opset = {"domain": "", "version": 0}
            for f2, _, v2 in _fields(val):
                if f2 == 1:
                    opset["domain"] = v2.decode()
                elif f2 == 2:
                    opset["version"] = v2
            m["opset_imports"].append(opset)
    return m
