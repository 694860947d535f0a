"""Compiler-pass pipeline as DataFrame transforms (SURVEY §3.2, Phase 3).

The reference compiles an ONNX graph through analyze → fuse → partition →
memory-plan → layout (`mlir_compiler/codegen_cim.py:109-192`). Here the
layer graph is a table ``(model, idx, name, op_type, rows, cols, inputs,
outputs)`` and every pass is a pure DataFrame transform, so a million-model
compilation farm is just a groupBy("model") over the same code.
"""

from hive_reflex_spark.plans.passes import (
    flash_layout,
    fuse_matmul_add,
    liveness,
    partition_by_cost,
)

__all__ = ["flash_layout", "fuse_matmul_add", "liveness", "partition_by_cost"]
