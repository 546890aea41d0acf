"""Generate tests/fixtures/tiny_projection.onnx — a minimal ONNX model
(one MatMul against a fixed reversal matrix) used to exercise
FeatureHashEmbedder's real onnxruntime path on hosts that have the
runtime (this container does not, so the test skips here).

The file is authored by hand-encoding the protobuf wire format from the
PUBLIC onnx.proto schema (field numbers cited inline) — the `onnx`
python package is not required. Deterministic: same bytes every run.
The model computes ``proj = feats @ W`` with ``W`` the reversal
identity (W[i, D-1-j], ones on the anti-diagonal), so the expected
output is simply ``feats[:, ::-1]`` — trivially checkable in the test.

Run: ``python tools/make_onnx_fixture.py [dim]`` (default 64).
"""

from __future__ import annotations

import os
import sys

import numpy as np

DIM = 64
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "tiny_projection.onnx",
)


# -- protobuf wire-format primitives ----------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def vint(field: int, value: int) -> bytes:
    """Varint-typed field (int32/int64/enum)."""
    return _tag(field, 0) + _varint(value)


def ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (string/bytes/embedded message)."""
    return _tag(field, 2) + _varint(len(payload)) + payload


def s(field: int, text: str) -> bytes:
    return ld(field, text.encode("utf-8"))


# -- onnx.proto messages (field numbers from the public schema) -------------


def tensor_shape(dims: list) -> bytes:
    # TensorShapeProto { repeated Dimension dim = 1; }
    # Dimension { int64 dim_value = 1; string dim_param = 2; }
    out = b""
    for d in dims:
        dim = vint(1, d) if isinstance(d, int) else s(2, d)
        out += ld(1, dim)
    return out


def tensor_type(elem_type: int, dims: list) -> bytes:
    # TypeProto { Tensor tensor_type = 1; }
    # TypeProto.Tensor { int32 elem_type = 1; TensorShapeProto shape = 2; }
    return ld(1, vint(1, elem_type) + ld(2, tensor_shape(dims)))


def value_info(name: str, elem_type: int, dims: list) -> bytes:
    # ValueInfoProto { string name = 1; TypeProto type = 2; }
    return s(1, name) + ld(2, tensor_type(elem_type, dims))


def build_model(dim: int) -> bytes:
    FLOAT = 1  # TensorProto.DataType.FLOAT

    w = np.zeros((dim, dim), dtype=np.float32)
    w[np.arange(dim), dim - 1 - np.arange(dim)] = 1.0  # reversal matrix

    # TensorProto { repeated int64 dims = 1; int32 data_type = 2;
    #               bytes raw_data = 9; string name = 8; }
    w_tensor = (
        vint(1, dim) + vint(1, dim) + vint(2, FLOAT)
        + s(8, "W")
        + ld(9, w.tobytes())  # row-major little-endian float32
    )

    # NodeProto { repeated string input = 1; repeated string output = 2;
    #             string name = 3; string op_type = 4; }
    node = s(1, "feats") + s(1, "W") + s(2, "proj") + s(3, "matmul0") + s(4, "MatMul")

    # GraphProto { repeated NodeProto node = 1; string name = 2;
    #              repeated TensorProto initializer = 5;
    #              repeated ValueInfoProto input = 11, output = 12; }
    graph = (
        ld(1, node)
        + s(2, "tiny_projection")
        + ld(5, w_tensor)
        + ld(11, value_info("feats", FLOAT, ["N", dim]))
        + ld(12, value_info("proj", FLOAT, ["N", dim]))
    )

    # OperatorSetIdProto { string domain = 1; int64 version = 2; }
    opset = vint(2, 13)  # default domain "" omitted

    # ModelProto { int64 ir_version = 1; string producer_name = 2;
    #              GraphProto graph = 7; repeated OperatorSetIdProto
    #              opset_import = 8; }
    return vint(1, 8) + s(2, "fupi_ray") + ld(7, graph) + ld(8, opset)


# -- structural self-check (schema-blind wire-format walk) ------------------


def _walk(buf: bytes) -> list[tuple[int, int]]:
    """Parse top-level (field, wire) pairs; raises on malformed wire."""
    fields, i = [], 0
    while i < len(buf):
        tag_val, shift = 0, 0
        while True:
            b = buf[i]
            i += 1
            tag_val |= (b & 0x7F) << shift
            shift += 7
            if not (b & 0x80):
                break
        field, wire = tag_val >> 3, tag_val & 7
        if wire == 0:
            while buf[i] & 0x80:
                i += 1
            i += 1
        elif wire == 2:
            ln, shift = 0, 0
            while True:
                b = buf[i]
                i += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not (b & 0x80):
                    break
            i += ln
        else:
            raise ValueError(f"unexpected wire type {wire}")
        fields.append((field, wire))
    if i != len(buf):
        raise ValueError("trailing bytes")
    return fields


def main() -> None:
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else DIM
    blob = build_model(dim)
    assert [f for f, _ in _walk(blob)] == [1, 2, 7, 8], "ModelProto structure"
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        f.write(blob)
    print(f"wrote {OUT} ({len(blob)} bytes, dim={dim})")
    try:
        import onnxruntime as ort

        sess = ort.InferenceSession(OUT)
        x = np.arange(2 * dim, dtype=np.float32).reshape(2, dim)
        (y,) = sess.run(None, {"feats": x})
        assert np.allclose(y, x[:, ::-1]), "reversal semantics"
        print("onnxruntime check: OK")
    except ImportError:
        print("onnxruntime not installed — structural check only")


if __name__ == "__main__":
    main()
