"""Real ONNX model ingest (S1) without the ``onnx`` package.

An ``.onnx`` file is a protobuf-serialized ModelProto. The reference's
single entry point for everything is parsing it into per-layer records
(`tools/model_parser.py:48-98` walks graph.node for Conv/Gemm/MatMul and
attaches initializer shapes; `mlir_compiler/codegen_cim.py:194-240` builds
layer dicts with op_type/inputs/outputs, FC shapes from initializers and
LSTM hidden_size from attributes). This module re-expresses that ingest
as a dependency-free protobuf **wire-format** walk — we only need field
tags, varints, and length-delimited submessages, so the ~20-line decoder
below covers the entire path from bytes to a Spark layer-IR DataFrame
(FIXTURES.md §4 schema: model, idx, name, op_type, rows, cols, inputs,
outputs, hidden_size) ready for the existing pass pipeline
(fuse → partition → liveness → flash layout).

Scale note: a model file is planner-scale (KB-MB); it is parsed on the
driver and becomes a small DataFrame that broadcasts through the passes.
The 100 TB side of the system is the data, never the model IR.
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import DataFrame, SparkSession

# --------------------------------------------------------------------------
# protobuf wire-format primitives
# --------------------------------------------------------------------------


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


def iter_fields(buf: bytes):
    """Yield (field_no, wire_type, value) for one serialized message.
    value: int for varint/fixed, bytes for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field_no, wtype = tag >> 3, tag & 0x7
        if wtype == 0:  # varint
            value, pos = _read_varint(buf, pos)
        elif wtype == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            value = buf[pos : pos + ln]
            pos += ln
        elif wtype == 5:  # 32-bit
            value = struct.unpack("<I", buf[pos : pos + 4])[0]
            pos += 4
        elif wtype == 1:  # 64-bit
            value = struct.unpack("<Q", buf[pos : pos + 8])[0]
            pos += 8
        else:  # groups (3/4) don't occur in onnx
            raise ValueError(f"unsupported wire type {wtype}")
        yield field_no, wtype, value


def _packed_varints(value, wtype) -> list[int]:
    """repeated int64 arrives packed (wtype 2) or one-per-tag (wtype 0)."""
    if wtype == 0:
        return [value]
    out, pos = [], 0
    while pos < len(value):
        v, pos = _read_varint(value, pos)
        out.append(v)
    return out


# --------------------------------------------------------------------------
# ONNX message walkers (field numbers from onnx.proto, public spec)
# --------------------------------------------------------------------------

# TensorProto element byte widths for the types we size (onnx.proto enum)
_DTYPE_BYTES = {1: 4, 2: 1, 3: 1, 4: 2, 5: 2, 6: 4, 7: 8, 10: 2, 11: 8}


def _parse_tensor(buf: bytes) -> dict:
    """TensorProto: dims=1, data_type=2, float_data=4, name=8, raw_data=9."""
    t = {"dims": [], "data_type": 1, "name": "", "n_bytes": 0}
    for fno, wt, val in iter_fields(buf):
        if fno == 1:
            t["dims"] += _packed_varints(val, wt)
        elif fno == 2:
            t["data_type"] = val
        elif fno == 4:
            t["n_bytes"] += len(val) if wt == 2 else 4
        elif fno == 8:
            t["name"] = val.decode()
        elif fno == 9:
            t["n_bytes"] += len(val)
    if not t["n_bytes"] and t["dims"]:
        n = 1
        for d in t["dims"]:
            n *= d
        t["n_bytes"] = n * _DTYPE_BYTES.get(t["data_type"], 4)
    return t


def _parse_attribute(buf: bytes) -> dict:
    """AttributeProto: name=1, f=2, i=3, s=4, ints=8."""
    a = {"name": "", "i": None, "f": None, "s": None, "ints": []}
    for fno, wt, val in iter_fields(buf):
        if fno == 1:
            a["name"] = val.decode()
        elif fno == 2:
            a["f"] = struct.unpack("<f", struct.pack("<I", val))[0]
        elif fno == 3:
            a["i"] = val
        elif fno == 4:
            a["s"] = val.decode(errors="replace")
        elif fno == 8:
            a["ints"] += _packed_varints(val, wt)
    return a


def _parse_node(buf: bytes) -> dict:
    """NodeProto: input=1, output=2, name=3, op_type=4, attribute=5."""
    n = {"inputs": [], "outputs": [], "name": "", "op_type": "", "attrs": {}}
    for fno, _wt, val in iter_fields(buf):
        if fno == 1:
            n["inputs"].append(val.decode())
        elif fno == 2:
            n["outputs"].append(val.decode())
        elif fno == 3:
            n["name"] = val.decode()
        elif fno == 4:
            n["op_type"] = val.decode()
        elif fno == 5:
            a = _parse_attribute(val)
            n["attrs"][a["name"]] = a
    return n


def _parse_graph(buf: bytes) -> dict:
    """GraphProto: node=1, name=2, initializer=5."""
    g = {"nodes": [], "name": "", "initializers": {}}
    for fno, _wt, val in iter_fields(buf):
        if fno == 1:
            g["nodes"].append(_parse_node(val))
        elif fno == 2:
            g["name"] = val.decode()
        elif fno == 5:
            t = _parse_tensor(val)
            g["initializers"][t["name"]] = t
    return g


def parse_onnx(path: str) -> dict:
    """ModelProto: ir_version=1, graph=7. Returns the parsed graph."""
    with open(path, "rb") as f:
        buf = f.read()
    graph = None
    for fno, _wt, val in iter_fields(buf):
        if fno == 7:
            graph = _parse_graph(val)
    if graph is None:
        raise ValueError(f"{path}: no GraphProto found (not an ONNX file?)")
    return graph


# --------------------------------------------------------------------------
# ONNX graph → layer-IR rows (the reference's extraction semantics)
# --------------------------------------------------------------------------


def onnx_to_ir_rows(path: str, model_name: str | None = None) -> list[dict]:
    """One IR row per graph node, in graph (topological) order.

    Mirrors `codegen_cim.py:_analyze_graph`: weight shape = dims of the
    first ≥2-D initializer among the node's inputs (rows, cols = last two
    dims, the contraction shape for FC/Conv); LSTM hidden_size from the
    node attribute; params/bytes summed over all initializer inputs."""
    graph = parse_onnx(path)
    model = model_name or graph["name"] or os.path.basename(path)
    rows = []
    for idx, node in enumerate(graph["nodes"]):
        weight_dims: list[int] = []
        n_params = 0
        n_bytes = 0
        for name in node["inputs"]:
            init = graph["initializers"].get(name)
            if init is None:
                continue
            n = 1
            for d in init["dims"]:
                n *= d
            n_params += n
            n_bytes += init["n_bytes"]
            if not weight_dims and len(init["dims"]) >= 2:
                weight_dims = list(init["dims"])
        hidden = node["attrs"].get("hidden_size")
        rows.append(
            {
                "model": model,
                "idx": idx,
                "name": node["name"] or f"layer_{idx}",
                "op_type": node["op_type"],
                "rows": int(weight_dims[-2]) if weight_dims else None,
                "cols": int(weight_dims[-1]) if weight_dims else None,
                "inputs": node["inputs"],
                "outputs": node["outputs"],
                "hidden_size": int(hidden["i"]) if hidden else None,
                "n_params": n_params,
                "n_bytes": n_bytes,
            }
        )
    return rows


IR_SCHEMA = (
    "model string, idx int, name string, op_type string, rows int, "
    "cols int, inputs array<string>, outputs array<string>, "
    "hidden_size int, n_params long, n_bytes long"
)


def read_onnx_model(
    spark: SparkSession, path: str, model_name: str | None = None
) -> DataFrame:
    """Load an .onnx file as a layer-IR DataFrame (FIXTURES.md §4 schema +
    parameter accounting), ready for plans.passes."""
    return spark.createDataFrame(onnx_to_ir_rows(path, model_name), IR_SCHEMA)
