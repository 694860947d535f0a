"""ONNX ingest (S1): protobuf wire-format parser + IR extraction +
end-to-end pass chain on the committed fixture."""

from __future__ import annotations

import os
import struct

from hive_reflex_spark.sources.onnx_source import (
    _parse_tensor,
    iter_fields,
    onnx_to_ir_rows,
    read_onnx_model,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "tiny.onnx")


class TestWireFormat:
    def test_multibyte_varint_roundtrip(self):
        # field 1, varint 300 (0xAC 0x02): tag byte 0x08
        buf = bytes([0x08, 0xAC, 0x02])
        fields = list(iter_fields(buf))
        assert fields == [(1, 0, 300)]

    def test_packed_and_unpacked_dims(self):
        # TensorProto.dims (field 1): packed [300, 2] then unpacked 64
        packed = bytes([0x0A, 0x03, 0xAC, 0x02, 0x02])  # tag(1,2) len=3
        unpacked = bytes([0x08, 0x40])  # tag(1,0) 64
        name = bytes([0x42, 0x01]) + b"w"  # tag(8,2) len=1 'w'
        t = _parse_tensor(packed + unpacked + name)
        assert t["dims"] == [300, 2, 64]
        assert t["name"] == "w"

    def test_fixed32_field(self):
        # AttributeProto-style float field: tag(2,5) + little-endian float
        buf = bytes([0x15]) + struct.pack("<f", 1.5)
        (fno, wt, val) = next(iter(iter_fields(buf)))
        assert (fno, wt) == (2, 5)
        assert struct.unpack("<f", struct.pack("<I", val))[0] == 1.5


class TestIRExtraction:
    def test_fixture_parses_to_expected_ir(self):
        rows = onnx_to_ir_rows(FIXTURE)
        assert [r["op_type"] for r in rows] == [
            "MatMul", "Add", "Relu", "LSTM", "Gemm",
        ]
        mm = rows[0]
        assert (mm["rows"], mm["cols"], mm["n_params"]) == (64, 32, 2048)
        add = rows[1]  # 1-D bias: no weight shape, params still counted
        assert (add["rows"], add["cols"], add["n_params"]) == (None, None, 32)
        lstm = rows[3]
        assert lstm["hidden_size"] == 16
        fc = rows[4]  # weight + bias initializers both counted
        assert fc["n_params"] == 16 * 10 + 10
        # raw_data sizes: float32
        assert mm["n_bytes"] == 2048 * 4

    def test_pass_chain_end_to_end(self, spark):
        from hive_reflex_spark.plans.passes import (
            flash_layout,
            fuse_matmul_add,
            partition_by_cost,
        )

        ir = read_onnx_model(spark, FIXTURE)
        out = flash_layout(partition_by_cost(fuse_matmul_add(ir)))
        got = {r["idx"]: r.asDict() for r in out.collect()}
        # MatMul+Add fused into Gemm at idx 0; the Add (idx 1) is dropped
        assert sorted(got) == [0, 2, 3, 4]
        assert got[0]["op_type"] == "Gemm"
        assert got[0]["target"] == "cim"
        assert got[2]["target"] == "cpu"
        # flash layout: 2048 | 0 | 2048 | 160->256-aligned, exclusive sums
        assert [got[i]["flash_addr"] for i in (0, 2, 3, 4)] == [
            0, 2048, 2048, 4096,
        ]


class TestBertTiny:
    def test_parse_matches_spec(self):
        """The wire-format walker must recover every node and weight
        shape of the 17-node transformer graph."""
        from hive_reflex_spark.sources.model_zoo import (
            BERT_TINY_NODES,
            bert_tiny_onnx_path,
        )
        from hive_reflex_spark.sources.onnx_source import onnx_to_ir_rows

        rows = onnx_to_ir_rows(bert_tiny_onnx_path())
        assert len(rows) == len(BERT_TINY_NODES) == 17
        by_name = {r["name"]: r for r in rows}
        assert by_name["qkv"]["rows"] == 64
        assert by_name["qkv"]["cols"] == 192
        assert by_name["embed"]["n_params"] == 128 * 64
        assert by_name["norm1"]["rows"] is None  # 1-D inits only
        assert by_name["norm1"]["n_params"] == 128
        assert by_name["softmax"]["op_type"] == "Softmax"
        assert by_name["fc"]["n_params"] == 64 * 64 + 64

    def test_compile_shape(self, spark):
        """Both MatMul+Add sites fuse; Transpose/Softmax are cpu-forced;
        weightless attention MatMuls still go to the CIM core."""
        from hive_reflex_spark.operators.compiler import q80a_onnx_bert

        got = {r["name"]: r.asDict() for r in q80a_onnx_bert(spark, "").collect()}
        assert len(got) == 15  # 17 nodes - 2 consumed Adds
        assert got["qkv"]["op_type"] == "Gemm"
        assert got["out_proj"]["op_type"] == "Gemm"
        assert "qkv_bias" not in got and "out_bias" not in got
        assert got["transpose_k"]["target"] == "cpu"
        assert got["softmax"]["target"] == "cpu"
        assert got["scores"]["target"] == "cim"
        # flash addresses are exclusive running sums of aligned sizes
        laid = sorted(got.values(), key=lambda r: r["idx"])
        addr = 0
        for r in laid:
            assert r["flash_addr"] == addr
            addr += r["aligned_bytes"]


class TestMobileNet:
    def test_compile_shape(self, spark):
        """Conv is cim-eligible, BN/ReLU/GAP/Reshape are cpu; the
        alternating blocks produce a long island sequence."""
        from hive_reflex_spark.operators.compiler import q80b_onnx_mobilenet

        got = {r["name"]: r.asDict()
               for r in q80b_onnx_mobilenet(spark, "").collect()}
        assert len(got) == 48  # no MatMul+Add adjacency -> nothing fused
        assert got["conv0"]["target"] == "cim"
        assert got["dw3"]["target"] == "cim"
        assert got["dw3_bn"]["target"] == "cpu"
        assert got["flatten"]["target"] == "cpu"  # Reshape cpu-forced
        assert got["cls"]["target"] == "cim"
        # 4-D weight shape extraction: last two dims
        assert (got["dw0"]["size_bytes"], got["pw0"]["size_bytes"]) == (9, 1)
        assert got["pw0"]["n_params"] == 64 * 32
        n_islands = len({r["partition_id"] for r in got.values()})
        assert n_islands >= 15, n_islands
