"""Pure-numpy executor for single-MatMul ONNX graphs.

The container has no ``onnxruntime``, so the real-backend code path in
:class:`fupi_ray.stages.similarity.FeatureHashEmbedder` (session →
``run`` → attach output) would otherwise never execute. This module
parses the ONNX protobuf wire format directly — the same PUBLIC
``onnx.proto`` field numbers the fixture generator
(``tools/make_onnx_fixture.py``) encodes with — and executes the one
graph shape the fixture uses: a single ``MatMul`` of the graph input
against one float32 initializer. Anything else raises
``UnsupportedOnnx`` and the caller falls back to its deterministic
kernel; when the real onnxruntime IS importable it always wins.

The point is NOT to reimplement ORT: it is that the load-once /
batch-run contract of the reference's embedding stage
(/root/reference/fupi/embedders.py:35-63) executes against a known
output even here, with the exact session API (``run(None, feeds) ->
[array]``) so swapping in onnxruntime changes nothing upstream.
"""

from __future__ import annotations

import numpy as np

_FLOAT = 1  # onnx.TensorProto.DataType.FLOAT


class UnsupportedOnnx(ValueError):
    """Model uses features beyond the single-MatMul subset."""


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) triples of one message.
    value is an int for varint fields, bytes for length-delimited."""
    i = 0
    n = len(buf)
    while i < n:
        tag, shift = 0, 0
        while True:
            b = buf[i]
            i += 1
            tag |= (b & 0x7F) << shift
            shift += 7
            if not (b & 0x80):
                break
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, shift = 0, 0
            while True:
                b = buf[i]
                i += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not (b & 0x80):
                    break
            yield field, wire, v
        elif wire == 2:
            ln, shift = 0, 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not (b & 0x80):
                    break
            yield field, wire, buf[i : i + ln]
            i += ln
        elif wire == 5:  # fixed32 (float fields in TensorProto)
            yield field, wire, buf[i : i + 4]
            i += 4
        elif wire == 1:  # fixed64
            yield field, wire, buf[i : i + 8]
            i += 8
        else:
            raise UnsupportedOnnx(f"wire type {wire} not handled")


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    """TensorProto: dims=1, data_type=2, name=8, raw_data=9."""
    dims: list[int] = []
    name = ""
    dtype = None
    raw = None
    for f, _, v in _fields(buf):
        if f == 1:
            dims.append(int(v))
        elif f == 2:
            dtype = int(v)
        elif f == 8:
            name = v.decode()
        elif f == 9:
            raw = v
    if dtype != _FLOAT or raw is None:
        raise UnsupportedOnnx("initializer must be float32 raw_data")
    arr = np.frombuffer(raw, dtype="<f4").reshape(dims)
    return name, arr


def _parse_node(buf: bytes) -> dict:
    """NodeProto: input=1, output=2, name=3, op_type=4."""
    node = {"input": [], "output": [], "op_type": ""}
    for f, _, v in _fields(buf):
        if f == 1:
            node["input"].append(v.decode())
        elif f == 2:
            node["output"].append(v.decode())
        elif f == 4:
            node["op_type"] = v.decode()
    return node


class MiniSession:
    """ORT-shaped session for a single-MatMul model: construct from a
    model path, call ``run(None, {input_name: X})`` → ``[X @ W]``."""

    def __init__(self, model_path: str):
        with open(model_path, "rb") as fh:
            blob = fh.read()
        graph = None
        for f, _, v in _fields(blob):
            if f == 7:  # ModelProto.graph
                graph = v
        if graph is None:
            raise UnsupportedOnnx("no graph in model")
        nodes: list[dict] = []
        inits: dict[str, np.ndarray] = {}
        for f, _, v in _fields(graph):
            if f == 1:  # GraphProto.node
                nodes.append(_parse_node(v))
            elif f == 5:  # GraphProto.initializer
                name, arr = _parse_tensor(v)
                inits[name] = arr
        if len(nodes) != 1 or nodes[0]["op_type"] != "MatMul":
            raise UnsupportedOnnx("only a single MatMul node is supported")
        a, b = nodes[0]["input"]
        if a in inits or b not in inits:
            raise UnsupportedOnnx("MatMul must be graph_input @ initializer")
        self.input_name = a
        self.weight = inits[b]

    def run(self, output_names, feeds: dict) -> list[np.ndarray]:
        if output_names is not None:
            raise UnsupportedOnnx("only output_names=None is supported")
        x = np.asarray(feeds[self.input_name], dtype=np.float32)
        return [x @ self.weight]
