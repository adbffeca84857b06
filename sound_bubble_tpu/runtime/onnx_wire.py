"""Minimal ONNX protobuf wire-format writer/reader (no `onnx` dependency).

The reference's primary interchange artifact is a `model.onnx` produced by
`torch.onnx.export` (/root/reference/edge/to_onnx.py:116-136). This image has
no ONNX toolchain, so the serializer is built from first principles: ONNX
files are protobuf messages with a small, stable public schema (onnx.proto,
IR version 8). This module implements the protobuf wire format (varint /
length-delimited records) and just the message subset an inference graph
needs: ModelProto, GraphProto, NodeProto, AttributeProto, TensorProto,
ValueInfoProto. The reader exists so the in-image numpy evaluator
(runtime/onnx_eval.py) can execute exported artifacts — a full
export -> parse -> execute -> compare loop with zero external packages.

Field numbers follow the public ONNX IR spec (onnx/onnx.proto, Apache-2.0):
they are part of the serialized format and cannot differ.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# --------------------------- protobuf wire ---------------------------

_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


def _varint(n: int) -> bytes:
    if n < 0:  # two's-complement 64-bit (proto int64)
        n += 1 << 64
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(fieldnum: int, wire: int) -> bytes:
    return _varint((fieldnum << 3) | wire)


def _f_varint(fieldnum: int, v: int) -> bytes:
    return _tag(fieldnum, _VARINT) + _varint(v)


def _f_bytes(fieldnum: int, v: bytes) -> bytes:
    return _tag(fieldnum, _LEN) + _varint(len(v)) + v


def _f_str(fieldnum: int, v: str) -> bytes:
    return _f_bytes(fieldnum, v.encode("utf-8"))


def _f_float(fieldnum: int, v: float) -> bytes:
    return _tag(fieldnum, _I32) + struct.pack("<f", v)


def _f_packed_i64(fieldnum: int, vals) -> bytes:
    body = b"".join(_varint(int(v)) for v in vals)
    return _f_bytes(fieldnum, body)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_num, wire_type, value) over a serialized message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        fieldnum, wire = key >> 3, key & 7
        if wire == _VARINT:
            v, pos = _read_varint(buf, pos)
        elif wire == _LEN:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos:pos + ln]
            pos += ln
        elif wire == _I32:
            v = buf[pos:pos + 4]
            pos += 4
        elif wire == _I64:
            v = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield fieldnum, wire, v


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


# ------------------------------ messages ------------------------------

# TensorProto.DataType (subset)
FLOAT, UINT8, INT8, INT32, INT64, BOOL, DOUBLE, BF16 = 1, 2, 3, 6, 7, 9, 11, 16

_NP2ONNX = {
    np.dtype(np.float32): FLOAT, np.dtype(np.int64): INT64,
    np.dtype(np.int32): INT32, np.dtype(np.bool_): BOOL,
    np.dtype(np.float64): DOUBLE, np.dtype(np.uint8): UINT8,
    np.dtype(np.int8): INT8,
}
_ONNX2NP = {v: k for k, v in _NP2ONNX.items()}


@dataclass
class Tensor:
    name: str
    array: np.ndarray

    def encode(self) -> bytes:
        a = np.ascontiguousarray(self.array)
        out = b"".join(_f_varint(1, d) for d in a.shape)
        out += _f_varint(2, _NP2ONNX[a.dtype])
        out += _f_str(8, self.name)
        out += _f_bytes(9, a.tobytes())                    # raw_data
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "Tensor":
        dims, dtype, name, raw = [], FLOAT, "", b""
        float_data, int64_data = [], []
        for fn, wire, v in _iter_fields(buf):
            if fn == 1:
                dims.append(_signed64(v) if wire == _VARINT
                            else None)
            elif fn == 2:
                dtype = v
            elif fn == 8:
                name = v.decode("utf-8")
            elif fn == 9:
                raw = v
            elif fn == 4:  # packed float_data
                float_data.extend(struct.unpack(f"<{len(v)//4}f", v))
            elif fn == 7:  # packed int64_data
                pos = 0
                while pos < len(v):
                    x, pos = _read_varint(v, pos)
                    int64_data.append(_signed64(x))
        np_dt = _ONNX2NP[dtype]
        if raw:
            arr = np.frombuffer(raw, np_dt).reshape(dims)
        elif float_data:
            arr = np.asarray(float_data, np_dt).reshape(dims)
        elif int64_data:
            arr = np.asarray(int64_data, np_dt).reshape(dims)
        else:
            arr = np.zeros(dims, np_dt)
        return cls(name, arr)


@dataclass
class ValueInfo:
    name: str
    elem_type: int = FLOAT
    shape: tuple = ()

    def encode(self) -> bytes:
        dims = b"".join(
            _f_bytes(1, _f_varint(1, d)) for d in self.shape)  # Dimension
        tensor_t = _f_varint(1, self.elem_type) + _f_bytes(2, dims)
        return _f_str(1, self.name) + _f_bytes(2, _f_bytes(1, tensor_t))

    @classmethod
    def decode(cls, buf: bytes) -> "ValueInfo":
        name, elem, shape = "", FLOAT, []
        for fn, _, v in _iter_fields(buf):
            if fn == 1:
                name = v.decode("utf-8")
            elif fn == 2:  # TypeProto
                for fn2, _, v2 in _iter_fields(v):
                    if fn2 == 1:  # tensor_type
                        for fn3, _, v3 in _iter_fields(v2):
                            if fn3 == 1:
                                elem = v3
                            elif fn3 == 2:  # TensorShapeProto
                                for fn4, _, v4 in _iter_fields(v3):
                                    if fn4 == 1:  # Dimension
                                        dv = 0
                                        for fn5, w5, v5 in _iter_fields(v4):
                                            if fn5 == 1:
                                                dv = _signed64(v5)
                                        shape.append(dv)
        return cls(name, elem, tuple(shape))


# AttributeProto.AttributeType
_AT_FLOAT, _AT_INT, _AT_STRING, _AT_TENSOR, _AT_GRAPH = 1, 2, 3, 4, 5
_AT_FLOATS, _AT_INTS, _AT_STRINGS = 6, 7, 8


@dataclass
class Attribute:
    name: str
    value: object  # float | int | str | Tensor | Graph | list thereof

    def encode(self) -> bytes:
        out = _f_str(1, self.name)
        v = self.value
        if isinstance(v, bool):
            v = int(v)
        if isinstance(v, float):
            out += _f_float(2, v) + _f_varint(20, _AT_FLOAT)
        elif isinstance(v, int):
            out += _f_varint(3, v) + _f_varint(20, _AT_INT)
        elif isinstance(v, str):
            out += _f_bytes(4, v.encode()) + _f_varint(20, _AT_STRING)
        elif isinstance(v, Tensor):
            out += _f_bytes(5, v.encode()) + _f_varint(20, _AT_TENSOR)
        elif isinstance(v, Graph):
            out += _f_bytes(6, v.encode()) + _f_varint(20, _AT_GRAPH)
        elif isinstance(v, (list, tuple)):
            if all(isinstance(x, (int, np.integer)) for x in v):
                out += b"".join(_f_varint(8, int(x)) for x in v)
                out += _f_varint(20, _AT_INTS)
            elif all(isinstance(x, float) for x in v):
                out += b"".join(_f_float(7, x) for x in v)
                out += _f_varint(20, _AT_FLOATS)
            elif all(isinstance(x, str) for x in v):
                out += b"".join(_f_bytes(9, x.encode()) for x in v)
                out += _f_varint(20, _AT_STRINGS)
            else:
                raise TypeError(f"attr list {self.name}: {v!r}")
        else:
            raise TypeError(f"attr {self.name}: {v!r}")
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "Attribute":
        name, atype = "", 0
        f = i = s = t = g = None
        floats, ints, strings = [], [], []
        for fn, wire, v in _iter_fields(buf):
            if fn == 1:
                name = v.decode("utf-8")
            elif fn == 2:
                f = struct.unpack("<f", v)[0]
            elif fn == 3:
                i = _signed64(v)
            elif fn == 4:
                s = v.decode("utf-8")
            elif fn == 5:
                t = Tensor.decode(v)
            elif fn == 6:
                g = Graph.decode(v)
            elif fn == 7:
                floats.append(struct.unpack("<f", v)[0])
            elif fn == 8:
                ints.append(_signed64(v))
            elif fn == 9:
                strings.append(v.decode("utf-8"))
            elif fn == 20:
                atype = v
        value = {_AT_FLOAT: f, _AT_INT: i, _AT_STRING: s, _AT_TENSOR: t,
                 _AT_GRAPH: g, _AT_FLOATS: floats, _AT_INTS: ints,
                 _AT_STRINGS: strings}.get(atype)
        if value is None:  # tolerate writers that omit the type field
            value = next(x for x in (f, i, s, t, g, ints or None,
                                     floats or None, strings or None)
                         if x is not None)
        return cls(name, value)


@dataclass
class Node:
    op_type: str
    inputs: list
    outputs: list
    attrs: dict = field(default_factory=dict)
    name: str = ""

    def encode(self) -> bytes:
        out = b"".join(_f_str(1, x) for x in self.inputs)
        out += b"".join(_f_str(2, x) for x in self.outputs)
        if self.name:
            out += _f_str(3, self.name)
        out += _f_str(4, self.op_type)
        out += b"".join(_f_bytes(5, Attribute(k, v).encode())
                        for k, v in self.attrs.items())
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "Node":
        inputs, outputs, attrs, name, op = [], [], {}, "", ""
        for fn, _, v in _iter_fields(buf):
            if fn == 1:
                inputs.append(v.decode("utf-8"))
            elif fn == 2:
                outputs.append(v.decode("utf-8"))
            elif fn == 3:
                name = v.decode("utf-8")
            elif fn == 4:
                op = v.decode("utf-8")
            elif fn == 5:
                a = Attribute.decode(v)
                attrs[a.name] = a.value
        return cls(op, inputs, outputs, attrs, name)


@dataclass
class Graph:
    name: str
    nodes: list = field(default_factory=list)
    inputs: list = field(default_factory=list)      # ValueInfo
    outputs: list = field(default_factory=list)     # ValueInfo
    initializers: list = field(default_factory=list)  # Tensor

    def encode(self) -> bytes:
        out = b"".join(_f_bytes(1, n.encode()) for n in self.nodes)
        out += _f_str(2, self.name)
        out += b"".join(_f_bytes(5, t.encode()) for t in self.initializers)
        out += b"".join(_f_bytes(11, vi.encode()) for vi in self.inputs)
        out += b"".join(_f_bytes(12, vi.encode()) for vi in self.outputs)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "Graph":
        g = cls("")
        for fn, _, v in _iter_fields(buf):
            if fn == 1:
                g.nodes.append(Node.decode(v))
            elif fn == 2:
                g.name = v.decode("utf-8")
            elif fn == 5:
                g.initializers.append(Tensor.decode(v))
            elif fn == 11:
                g.inputs.append(ValueInfo.decode(v))
            elif fn == 12:
                g.outputs.append(ValueInfo.decode(v))
        return g


@dataclass
class Model:
    graph: Graph
    opset: int = 17
    ir_version: int = 8
    producer_name: str = "sound_bubble_tpu"
    producer_version: str = "0.3"

    def encode(self) -> bytes:
        opset = _f_str(1, "") + _f_varint(2, self.opset)
        out = _f_varint(1, self.ir_version)
        out += _f_str(2, self.producer_name)
        out += _f_str(3, self.producer_version)
        out += _f_bytes(7, self.graph.encode())
        out += _f_bytes(8, opset)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "Model":
        graph, opset, irv, pn, pv = None, 17, 8, "", ""
        for fn, _, v in _iter_fields(buf):
            if fn == 1:
                irv = v
            elif fn == 2:
                pn = v.decode("utf-8")
            elif fn == 3:
                pv = v.decode("utf-8")
            elif fn == 7:
                graph = Graph.decode(v)
            elif fn == 8:
                for fn2, _, v2 in _iter_fields(v):
                    if fn2 == 2:
                        opset = _signed64(v2) if isinstance(v2, int) else v2
        if graph is None:
            raise ValueError("ModelProto without graph")
        return cls(graph, opset, irv, pn, pv)


def save(model: Model, path: str) -> None:
    with open(path, "wb") as f:
        f.write(model.encode())


def load(path: str) -> Model:
    with open(path, "rb") as f:
        return Model.decode(f.read())
