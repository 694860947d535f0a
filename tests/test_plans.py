"""Compiler-pass library tests on the FIXTURES.md §4 layer-IR shapes:
a residual topology (liveness) and a mixed CIM/CPU sequence (islands)."""

from __future__ import annotations

from hive_reflex_spark.plans import (
    flash_layout,
    fuse_matmul_add,
    liveness,
    partition_by_cost,
)

LAYER_SCHEMA = (
    "model string, idx int, name string, op_type string, rows int, cols int, "
    "inputs array<string>, outputs array<string>"
)


def _mixed_model(spark):
    # Gemm, Softmax, Gemm, ReduceMean, Gemm — partitioner.py:13-24 fixture
    rows = [
        ("m", 0, "fc1", "Gemm", 64, 64, ["x"], ["t1"]),
        ("m", 1, "sm", "Softmax", None, None, ["t1"], ["t2"]),
        ("m", 2, "fc2", "Gemm", 64, 64, ["t2"], ["t3"]),
        ("m", 3, "rm", "ReduceMean", None, None, ["t3"], ["t4"]),
        ("m", 4, "fc3", "Gemm", 64, 64, ["t4"], ["y"]),
    ]
    return spark.createDataFrame(rows, LAYER_SCHEMA)


def _residual_model(spark):
    # L3 reads L1 and L2 outputs — memory_planner.py:9-26 residual fixture
    rows = [
        ("r", 0, "l1", "Gemm", 8, 8, ["x"], ["a"]),
        ("r", 1, "l2", "Gemm", 8, 8, ["a"], ["b"]),
        ("r", 2, "l3", "Add", None, None, ["a", "b"], ["y"]),
    ]
    return spark.createDataFrame(rows, LAYER_SCHEMA)


def test_partitioner_islands(spark):
    got = {
        r.idx: (r.target, r.partition_id)
        for r in partition_by_cost(_mixed_model(spark)).collect()
    }
    # alternating cim/cpu → 5 islands, matching the greedy run-length
    # grouping of partitioner.py:63-107
    assert got == {
        0: ("cim", 1),
        1: ("cpu", 2),
        2: ("cim", 3),
        3: ("cpu", 4),
        4: ("cim", 5),
    }


def test_partitioner_per_layer_overrides(spark):
    """U3: an overrides table pins named layers regardless of the cost
    rule, and islands re-form around the pinned targets."""
    overrides = spark.createDataFrame(
        [("m", "fc2", "cpu")], "model string, name string, forced_target string"
    )
    got = {
        r.idx: (r.target, r.partition_id)
        for r in partition_by_cost(
            _mixed_model(spark), overrides=overrides
        ).collect()
    }
    # fc2 forced cpu → sm/fc2/rm merge into one cpu island
    assert got == {
        0: ("cim", 1),
        1: ("cpu", 2),
        2: ("cpu", 2),
        3: ("cpu", 2),
        4: ("cim", 3),
    }
    assert "forced_target" not in partition_by_cost(
        _mixed_model(spark), overrides=overrides
    ).columns


def test_liveness_residual(spark):
    got = {
        r.tensor: (r.first_def, r.last_use)
        for r in liveness(_residual_model(spark)).collect()
    }
    # 'a' is produced at 0 and still consumed at 2 (the residual edge):
    # its buffer cannot be reused for 'b' — the exact case of
    # memory_planner.py:9-26.
    assert got["a"] == (0, 2)
    assert got["b"] == (1, 2)
    assert got["x"] == (None, 0)  # graph input: consumed only


def test_flash_layout_alignment(spark):
    got = {
        r.idx: (r.size_bytes, r.aligned_bytes, r.flash_addr)
        for r in flash_layout(_residual_model(spark)).collect()
    }
    # 8*8 = 64 B → aligned 256; addresses accumulate exclusively
    assert got[0] == (64, 256, 0)
    assert got[1] == (64, 256, 256)
    assert got[2] == (0, 0, 512)


def test_fuse_matmul_add(spark):
    rows = [
        ("f", 0, "mm", "MatMul", 4, 4, ["x"], ["t"]),
        ("f", 1, "add", "Add", None, None, ["t", "bias"], ["y"]),
        ("f", 2, "relu", "Relu", None, None, ["y"], ["z"]),
    ]
    layers = spark.createDataFrame(rows, LAYER_SCHEMA)
    got = {r.idx: (r.op_type, list(r.outputs)) for r in fuse_matmul_add(layers).collect()}
    # MatMul+Add collapse to Gemm producing the Add's output; Add is gone
    assert got == {0: ("Gemm", ["y"]), 2: ("Relu", ["z"])}


def test_cancel_quant_dequant_peephole(spark):
    """SURVEY §4.2's deferred peephole: a Quantize whose output feeds
    only the adjacent Dequantize cancels, and downstream consumers are
    rewired to the original float tensor; a pair whose quantized tensor
    has a second consumer is load-bearing and must survive intact."""
    from hive_reflex_spark.plans.passes import cancel_quant_dequant

    rows = [
        # model "f": pure round-trip — must cancel, relu rewires x
        ("f", 0, "q", "QuantizeLinear", None, None, ["x"], ["xq"]),
        ("f", 1, "dq", "DequantizeLinear", None, None, ["xq"], ["xf"]),
        ("f", 2, "relu", "Relu", None, None, ["xf"], ["y"]),
        # model "g": the quantized tensor ALSO feeds an int8 matmul —
        # the pair is load-bearing, nothing may change
        ("g", 0, "q", "QuantizeLinear", None, None, ["x"], ["xq"]),
        ("g", 1, "dq", "DequantizeLinear", None, None, ["xq"], ["xf"]),
        ("g", 2, "mm", "MatMul", 4, 4, ["xq", "w"], ["z"]),
        ("g", 3, "add", "Add", None, None, ["xf", "z"], ["y"]),
    ]
    layers = spark.createDataFrame(rows, LAYER_SCHEMA)
    out = cancel_quant_dequant(layers)
    got = {
        (r.model, r.idx): (r.op_type, list(r.inputs), list(r.outputs))
        for r in out.collect()
    }
    # f: both q/dq gone, relu reads the original float input
    assert ("f", 0) not in got and ("f", 1) not in got
    assert got[("f", 2)] == ("Relu", ["x"], ["y"])
    # g: untouched, byte for byte
    assert got[("g", 0)] == ("QuantizeLinear", ["x"], ["xq"])
    assert got[("g", 1)] == ("DequantizeLinear", ["xq"], ["xf"])
    assert got[("g", 2)] == ("MatMul", ["xq", "w"], ["z"])
    assert got[("g", 3)] == ("Add", ["xf", "z"], ["y"])
