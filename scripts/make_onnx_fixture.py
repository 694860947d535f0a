#!/usr/bin/env python3
"""Write tests/fixtures/tiny.onnx — a deterministic, dependency-free ONNX
ModelProto built byte-by-byte with the protobuf wire format (the encoder
twin of hive_reflex_spark/sources/onnx_source.py's decoder).

Graph "tinynet" (MatMul→Add→Relu→LSTM→Gemm): exercises every extraction
path the reference's parser has — fusable MatMul+Add adjacency
(`mlir_compiler/optimizer.py:126-171`), FC weight shapes from
initializers (`tools/model_parser.py:75-88`), LSTM hidden_size from a
node attribute (`codegen_cim.py:222-227`), and a no-weight activation.
"""

from __future__ import annotations

import os
import struct


def varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def tag(field: int, wtype: int) -> bytes:
    return varint((field << 3) | wtype)


def ld(field: int, payload: bytes) -> bytes:  # length-delimited
    return tag(field, 2) + varint(len(payload)) + payload


def s(field: int, text: str) -> bytes:
    return ld(field, text.encode())


def vi(field: int, n: int) -> bytes:  # varint field
    return tag(field, 0) + varint(n)


def tensor(name: str, dims: list[int], seed: int) -> bytes:
    """TensorProto: dims=1, data_type=2 (FLOAT), name=8, raw_data=9.
    raw_data is a deterministic byte ramp — content is irrelevant to the
    IR, size is what the layout passes consume."""
    n = 1
    for d in dims:
        n *= d
    raw = bytes((seed + i) % 251 for i in range(4 * n))
    out = b"".join(vi(1, d) for d in dims)
    return out + vi(2, 1) + s(8, name) + ld(9, raw)


def attr_int(name: str, value: int) -> bytes:
    """AttributeProto: name=1, i=3, type=20 (INT)."""
    return s(1, name) + vi(3, value) + vi(20, 2)


def node(
    name: str,
    op_type: str,
    inputs: list[str],
    outputs: list[str],
    attrs: bytes = b"",
) -> bytes:
    out = b"".join(s(1, i) for i in inputs)
    out += b"".join(s(2, o) for o in outputs)
    out += s(3, name) + s(4, op_type)
    if attrs:
        out += ld(5, attrs)
    return out


def main() -> None:
    nodes = [
        node("mm1", "MatMul", ["x", "W1"], ["h1"]),
        node("add1", "Add", ["h1", "b1"], ["h1b"]),
        node("relu1", "Relu", ["h1b"], ["a1"]),
        node("lstm1", "LSTM", ["a1", "Wl"], ["s1"], attr_int("hidden_size", 16)),
        node("fc2", "Gemm", ["s1", "W2", "b2"], ["y"]),
    ]
    inits = [
        tensor("W1", [64, 32], 3),
        tensor("b1", [32], 5),
        tensor("Wl", [128, 16], 7),
        tensor("W2", [16, 10], 11),
        tensor("b2", [10], 13),
    ]
    graph = (
        b"".join(ld(1, n) for n in nodes)
        + s(2, "tinynet")
        + b"".join(ld(5, t) for t in inits)
    )
    model = vi(1, 8) + ld(7, graph)  # ir_version=8, graph=7

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "fixtures",
        "tiny.onnx",
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(model)
    print(f"wrote {path} ({len(model)} bytes)")


if __name__ == "__main__":
    main()
