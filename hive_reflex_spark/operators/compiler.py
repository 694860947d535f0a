"""Compiler-pass query shapes on the driver fixtures (SURVEY §3.1-3.2).

The pass *library* (plans/passes.py) operates on layer-IR tables; these
queries register the same algorithmic shapes — cost-partitioned islands,
aligned layout accumulation, liveness intervals — over the driver's
TPC-H-ish tables so the driver's DuckDB harness can hash-check them.
q80 closes the top of the funnel: a real .onnx file (parsed without the
onnx package) through the full fuse → partition → flash-layout chain.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_reflex_spark.io import read_table
from hive_reflex_spark.registry import query

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
TINY_ONNX = os.path.join(_REPO_ROOT, "tests", "fixtures", "tiny.onnx")


@query(
    "q59_cost_partition_islands",
    oracle="""
    SELECT l_orderkey, partition_id, target,
           COUNT(*) AS n_layers,
           CAST(SUM(CAST(cost_cpu AS BIGINT)) AS BIGINT) AS total_cost
    FROM (
        SELECT l_orderkey, target, cost_cpu,
               CAST(SUM(CASE WHEN target IS DISTINCT FROM prev_target
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_partkey, l_suppkey,
                                   l_extendedprice
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS partition_id
        FROM (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                   l_extendedprice,
                   CAST(ROUND(l_quantity * l_extendedprice) AS BIGINT)
                       AS cost_cpu,
                   CASE WHEN l_quantity >= 2 * (l_quantity / 32.0)
                             AND l_quantity > 25
                        THEN 'cim' ELSE 'cpu' END AS target,
                   lag(CASE WHEN l_quantity >= 2 * (l_quantity / 32.0)
                                 AND l_quantity > 25
                            THEN 'cim' ELSE 'cpu' END)
                       OVER (PARTITION BY l_orderkey
                             ORDER BY l_linenumber, l_partkey, l_suppkey,
                                      l_extendedprice)
                       AS prev_target
            FROM lineitem))
    GROUP BY l_orderkey, partition_id, target
    """,
)
def q59_cost_partition_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partitioner's 2x-speedup rule + greedy run-length grouping
    (`mlir_compiler/partitioner.py:63-107`, T4) with lineitems standing in
    for layers (order = model, linenumber = topological idx): assign a
    target per row by a cost comparison, then island consecutive
    same-target rows and roll up per-island cost."""
    li = read_table(spark, sf_dir, "lineitem")
    target = F.when(
        (F.col("l_quantity") >= 2 * (F.col("l_quantity") / 32.0))
        & (F.col("l_quantity") > 25),
        "cim",
    ).otherwise("cpu")
    # l_linenumber alone is NOT unique per order in this fixture — extend
    # the ordering to a unique key or island assignment is ambiguous.
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_extendedprice",
        F.round(F.col("l_quantity") * F.col("l_extendedprice"))
        .cast("long")
        .alias("cost_cpu"),
        target.alias("target"),
    ).withColumn(
        "is_boundary",
        F.when(~F.col("target").eqNullSafe(F.lag("target").over(w)), 1).otherwise(
            0
        ),
    )
    islands = flagged.withColumn(
        "partition_id", F.sum("is_boundary").over(wcum).cast("long")
    )
    return islands.groupBy("l_orderkey", "partition_id", "target").agg(
        F.count("*").alias("n_layers"),
        F.sum("cost_cpu").alias("total_cost"),
    )


@query(
    "q80_onnx_compile",
    oracle="""
    WITH ir(model, idx, name, op_type, rows, cols, inputs, outputs,
            n_params) AS (
        VALUES
        ('tinynet', 0, 'mm1',   'MatMul', 64, 32,
         ['x','W1'],        ['h1'],  CAST(2048 AS BIGINT)),
        ('tinynet', 1, 'add1',  'Add',  CAST(NULL AS INTEGER),
         CAST(NULL AS INTEGER), ['h1','b1'], ['h1b'], CAST(32 AS BIGINT)),
        ('tinynet', 2, 'relu1', 'Relu', CAST(NULL AS INTEGER),
         CAST(NULL AS INTEGER), ['h1b'],     ['a1'],  CAST(0 AS BIGINT)),
        ('tinynet', 3, 'lstm1', 'LSTM', 128, 16,
         ['a1','Wl'],       ['s1'],  CAST(2048 AS BIGINT)),
        ('tinynet', 4, 'fc2',   'Gemm', 16, 10,
         ['s1','W2','b2'],  ['y'],   CAST(170 AS BIGINT))),
    pairs AS (
        SELECT a.model, a.idx, b.idx AS consumed_idx
        FROM ir a JOIN ir b
          ON a.model = b.model AND b.idx = a.idx + 1
         AND a.op_type = 'MatMul' AND b.op_type = 'Add'
         AND len(list_intersect(a.outputs, b.inputs)) > 0),
    fused AS (
        SELECT i.model, i.idx, i.name,
               CASE WHEN p.consumed_idx IS NOT NULL
                    THEN 'Gemm' ELSE i.op_type END AS op_type,
               i.rows, i.cols, i.n_params
        FROM ir i LEFT JOIN pairs p ON i.model = p.model AND i.idx = p.idx
        WHERE i.idx NOT IN (SELECT consumed_idx FROM pairs)),
    flagged AS (
        SELECT *,
               CASE WHEN op_type IN ('MatMul','Gemm','Conv','LSTM')
                         AND COALESCE(rows * cols, 0)
                             >= 2.0 * (COALESCE(rows * cols, 0) / 32.0)
                    THEN 'cim' ELSE 'cpu' END AS target,
               lag(CASE WHEN op_type IN ('MatMul','Gemm','Conv','LSTM')
                             AND COALESCE(rows * cols, 0)
                                 >= 2.0 * (COALESCE(rows * cols, 0) / 32.0)
                        THEN 'cim' ELSE 'cpu' END)
                   OVER (PARTITION BY model ORDER BY idx) AS prev_target
        FROM fused),
    islands AS (
        SELECT *,
               CAST(SUM(CASE WHEN target IS DISTINCT FROM prev_target
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY model ORDER BY idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS partition_id
        FROM flagged)
    SELECT model, idx, name, op_type, target, partition_id, n_params,
           CAST(COALESCE(rows * cols, 0) AS BIGINT) AS size_bytes,
           CAST(ceil(COALESCE(rows * cols, 0) / 256.0) * 256 AS BIGINT)
               AS aligned_bytes,
           CAST(COALESCE(SUM(CAST(ceil(COALESCE(rows * cols, 0) / 256.0) * 256
                             AS BIGINT))
                OVER (PARTITION BY model ORDER BY idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS flash_addr
    FROM islands
    """,
)
def q80_onnx_compile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end model compile (S1 → U4 → T4 → W11): a real ``.onnx``
    file — parsed from raw protobuf bytes, no onnx package
    (`tools/model_parser.py:48-98`, `codegen_cim.py:194-240`) — through
    fuse_matmul_add → partition_by_cost → flash_layout. The oracle pins
    the golden parse of the committed fixture as a VALUES table and
    re-implements the pass chain in independent SQL, so the driver
    hash-checks parser AND passes together. ``sf_dir`` is unused: the
    model is planner-scale input, not data-scale."""
    from hive_reflex_spark.plans.passes import (
        flash_layout,
        fuse_matmul_add,
        partition_by_cost,
    )
    from hive_reflex_spark.sources.onnx_source import read_onnx_model

    ir = read_onnx_model(spark, TINY_ONNX)
    laid = flash_layout(partition_by_cost(fuse_matmul_add(ir)))
    return laid.select(
        "model",
        "idx",
        "name",
        "op_type",
        "target",
        "partition_id",
        "n_params",
        "size_bytes",
        "aligned_bytes",
        "flash_addr",
    )


@query(
    "q60_flash_layout",
    oracle="""
    SELECT p_partkey, size_bytes, aligned_bytes,
           CAST(COALESCE(SUM(aligned_bytes)
                OVER (ORDER BY p_partkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS flash_addr
    FROM (SELECT p_partkey,
                 CAST(p_size AS BIGINT) * 1024 AS size_bytes,
                 CAST(ceil((p_size * 1024) / 256.0) * 256 AS BIGINT)
                     AS aligned_bytes
          FROM part)
    """,
)
def q60_flash_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative 256-B-aligned flash layout (W11, `tools/hive_compile.py:
    181-217`): aligned size + exclusive running sum as the base address,
    parts standing in for layer blobs."""
    part = read_table(spark, sf_dir, "part")
    size = F.col("p_size").cast("long") * 1024
    aligned = (F.ceil(size / 256.0) * 256).cast("long")
    w = Window.orderBy("p_partkey").rowsBetween(Window.unboundedPreceding, -1)
    return part.select(
        "p_partkey",
        size.alias("size_bytes"),
        aligned.alias("aligned_bytes"),
    ).withColumn(
        "flash_addr",
        F.coalesce(F.sum("aligned_bytes").over(w), F.lit(0)).cast("long"),
    )


@query(
    "q61_liveness",
    oracle="""
    SELECT user_id AS tensor_key,
           MIN(event_id) AS first_def,
           MAX(event_id) AS last_use,
           CAST(MAX(event_id) - MIN(event_id) AS BIGINT) AS live_range,
           COUNT(*) AS n_refs
    FROM events
    GROUP BY user_id
    """,
)
def q61_liveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Liveness intervals (W9, `mlir_compiler/memory_planner.py:48-72`):
    per key, [first def, last use] over a reference stream — min/max
    grouped aggregate, the input to linear-scan buffer allocation."""
    events = read_table(spark, sf_dir, "events")
    return events.groupBy(F.col("user_id").alias("tensor_key")).agg(
        F.min("event_id").alias("first_def"),
        F.max("event_id").alias("last_use"),
        (F.max("event_id") - F.min("event_id")).alias("live_range"),
        F.count("*").alias("n_refs"),
    )


def _compile_chain_oracle(values_sql: str) -> str:
    """fuse → partition (incl. cpu-forced ops) → flash-layout replayed in
    SQL over a pinned golden-parse VALUES table."""
    return f"""
    WITH ir(model, idx, name, op_type, rows, cols, inputs, outputs,
            n_params) AS (
        VALUES
        {values_sql}),
    pairs AS (
        SELECT a.model, a.idx, b.idx AS consumed_idx
        FROM ir a JOIN ir b
          ON a.model = b.model AND b.idx = a.idx + 1
         AND a.op_type = 'MatMul' AND b.op_type = 'Add'
         AND len(list_intersect(a.outputs, b.inputs)) > 0),
    fused AS (
        SELECT i.model, i.idx, i.name,
               CASE WHEN p.consumed_idx IS NOT NULL
                    THEN 'Gemm' ELSE i.op_type END AS op_type,
               i.rows, i.cols, i.n_params
        FROM ir i LEFT JOIN pairs p ON i.model = p.model AND i.idx = p.idx
        WHERE i.idx NOT IN (SELECT consumed_idx FROM pairs)),
    flagged AS (
        SELECT *,
               CASE WHEN op_type IN ('Softmax','ReduceMean','Reshape',
                                     'Transpose') THEN 'cpu'
                    WHEN op_type IN ('MatMul','Gemm','Conv','LSTM')
                         AND COALESCE(rows * cols, 0)
                             >= 2.0 * (COALESCE(rows * cols, 0) / 32.0)
                    THEN 'cim' ELSE 'cpu' END AS target
        FROM fused),
    lagged AS (
        SELECT *,
               lag(target) OVER (PARTITION BY model ORDER BY idx)
                   AS prev_target
        FROM flagged),
    islands AS (
        SELECT *,
               CAST(SUM(CASE WHEN target IS DISTINCT FROM prev_target
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY model ORDER BY idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS partition_id
        FROM lagged)
    SELECT model, idx, name, op_type, target, partition_id, n_params,
           CAST(COALESCE(rows * cols, 0) AS BIGINT) AS size_bytes,
           CAST(ceil(COALESCE(rows * cols, 0) / 256.0) * 256 AS BIGINT)
               AS aligned_bytes,
           CAST(COALESCE(SUM(CAST(ceil(COALESCE(rows * cols, 0) / 256.0) * 256
                             AS BIGINT))
                OVER (PARTITION BY model ORDER BY idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS flash_addr
    FROM islands
    """


def _bert_tiny_oracle() -> str:
    from hive_reflex_spark.sources.model_zoo import bert_tiny_ir_values

    return _compile_chain_oracle(bert_tiny_ir_values())


@query("q80a_onnx_bert", oracle=_bert_tiny_oracle())
def q80a_onnx_bert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q80 at transformer shape: a 17-node BERT-Tiny-like ONNX graph
    (structure per `model_zoo/export_bert_tiny.py:17-60` — embedding,
    two LayerNorms, full attention with transpose/scale/softmax, two
    MatMul+Add fusion sites, Gemm FFN, GELU, classifier) encoded to real
    protobuf bytes, parsed by the wire-format walker, and pushed through
    fuse_matmul_add → partition_by_cost → flash_layout. Exercises what
    the 5-node tinynet cannot: multiple fusion sites, cpu-forced ops
    (Transpose/Softmax), weightless MatMuls (attention scores/context),
    1-D-initializer-only layers (LayerNorm), and an embedding Gather."""
    from hive_reflex_spark.plans.passes import (
        flash_layout,
        fuse_matmul_add,
        partition_by_cost,
    )
    from hive_reflex_spark.sources.model_zoo import bert_tiny_onnx_path
    from hive_reflex_spark.sources.onnx_source import read_onnx_model

    ir = read_onnx_model(spark, bert_tiny_onnx_path())
    laid = flash_layout(partition_by_cost(fuse_matmul_add(ir)))
    return laid.select(
        "model",
        "idx",
        "name",
        "op_type",
        "target",
        "partition_id",
        "n_params",
        "size_bytes",
        "aligned_bytes",
        "flash_addr",
    )


def _mobilenet_oracle() -> str:
    from hive_reflex_spark.sources.model_zoo import mobilenet_ir_values

    return _compile_chain_oracle(mobilenet_ir_values())


@query("q80b_onnx_mobilenet", oracle=_mobilenet_oracle())
def q80b_onnx_mobilenet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q80 at CNN shape: a 48-node MobileNetV1-like graph (structure per
    `model_zoo/export_mobilenet.py:5-56` — strided initial Conv, seven
    depthwise-separable blocks of grouped Conv3x3 / BatchNorm / ReLU /
    pointwise Conv1x1 / BatchNorm / ReLU, GlobalAveragePool, Reshape,
    Gemm head) through the same parse → fuse → partition → layout
    chain. Exercises the CNN side the transformer fixture cannot: Conv
    as the cim-eligible op, 4-D initializer shape extraction, the long
    alternating cim/cpu island sequence (15 partitions), and a
    Reshape in cpu-forced position."""
    from hive_reflex_spark.plans.passes import (
        flash_layout,
        fuse_matmul_add,
        partition_by_cost,
    )
    from hive_reflex_spark.sources.model_zoo import mobilenet_onnx_path
    from hive_reflex_spark.sources.onnx_source import read_onnx_model

    ir = read_onnx_model(spark, mobilenet_onnx_path())
    laid = flash_layout(partition_by_cost(fuse_matmul_add(ir)))
    return laid.select(
        "model",
        "idx",
        "name",
        "op_type",
        "target",
        "partition_id",
        "n_params",
        "size_bytes",
        "aligned_bytes",
        "flash_addr",
    )
