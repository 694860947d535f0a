"""Compiler passes over the layer-IR table.

Schema (FIXTURES.md §4): (model, idx, name, op_type, rows, cols,
inputs array<string>, outputs array<string>, [hidden_size]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ALIGN = 256  # flash alignment, tools/hive_compile.py:181-187


def fuse_matmul_add(layers: DataFrame) -> DataFrame:
    """Operator fusion MatMul+Add → Gemm (`mlir_compiler/optimizer.py:
    126-171`): self-join idx↔idx+1 on producer/consumer adjacency, rewrite
    the pair, drop the consumed Add. Pattern matching over the IR table is
    an equi-join, not graph traversal."""
    a = layers.alias("a")
    b = layers.alias("b")
    # the IR is planner-scale (thousands of layers at most), so the
    # adjacency pattern-match broadcasts its probe side — Catalyst
    # otherwise sort-merge-joins the unsized local relation
    fused_pairs = (
        a.join(
            F.broadcast(b),
            (F.col("a.model") == F.col("b.model"))
            & (F.col("a.idx") + 1 == F.col("b.idx"))
            & (F.col("a.op_type").isin("MatMul"))
            & (F.col("b.op_type") == "Add")
            # the Add must actually consume the MatMul's output
            & F.arrays_overlap(F.col("a.outputs"), F.col("b.inputs")),
        )
        .select(
            F.col("a.model").alias("model"),
            F.col("a.idx").alias("idx"),
            F.col("b.idx").alias("consumed_idx"),
            F.col("b.outputs").alias("new_outputs"),
        )
    )
    fp = F.broadcast(fused_pairs)
    fused = (
        layers.join(fp, ["model", "idx"], "left")
        .withColumn(
            "op_type",
            F.when(F.col("consumed_idx").isNotNull(), "Gemm").otherwise(
                F.col("op_type")
            ),
        )
        .withColumn(
            "outputs",
            F.when(F.col("consumed_idx").isNotNull(), F.col("new_outputs")).otherwise(
                F.col("outputs")
            ),
        )
        .drop("new_outputs")
    )
    consumed = fused_pairs.select(
        "model", F.col("consumed_idx").alias("idx")
    )
    return (
        fused.join(F.broadcast(consumed), ["model", "idx"], "left_anti")
        .drop("consumed_idx")
    )


def cancel_quant_dequant(layers: DataFrame) -> DataFrame:
    """Quantize→Dequantize peephole (SURVEY §4.2's deferred rule; the
    reference's semantic-fusion tier `mlir_compiler/optimizer.py:126-218`
    rewrites its model graph the same way): a QuantizeLinear whose output
    feeds ONLY the adjacent DequantizeLinear is a round-trip no-op at
    the IR level — drop both nodes and rewire every consumer of the
    dequantized tensor to the original float input.

    Safety fence: if ANY other node consumes the quantized tensor (e.g.
    an int8 matmul reading q alongside a dequant branch), the pair is
    load-bearing and must survive — only sole-consumer pairs cancel.
    Same join-based pattern-match shape as fuse_matmul_add: adjacency
    equi-joins over the planner-scale IR table, broadcast probes, no
    graph traversal."""
    a = layers.alias("a")
    b = layers.alias("b")
    quant_out = F.col("a.outputs")[0]
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.model") == F.col("b.model"))
        & (F.col("a.idx") + 1 == F.col("b.idx"))
        & (F.col("a.op_type").isin("Quantize", "QuantizeLinear"))
        & (F.col("b.op_type").isin("Dequantize", "DequantizeLinear"))
        & F.arrays_overlap(F.col("a.outputs"), F.col("b.inputs")),
    ).select(
        F.col("a.model").alias("model"),
        F.col("a.idx").alias("q_idx"),
        F.col("b.idx").alias("dq_idx"),
        quant_out.alias("q_out"),
        F.col("a.inputs")[0].alias("orig_in"),
        F.col("b.outputs")[0].alias("dq_out"),
    )
    # sole-consumer fence: count consumers of the quantized tensor
    consumers = layers.select(
        "model", "idx", F.explode("inputs").alias("tensor")
    )
    uses = consumers.groupBy("model", "tensor").agg(
        F.count("*").alias("n_uses")
    )
    safe = (
        pairs.join(
            uses,
            (pairs.model == uses.model) & (pairs.q_out == uses.tensor),
            "left",
        )
        .filter(F.coalesce(F.col("n_uses"), F.lit(0)) <= 1)
        .select(pairs.model, "q_idx", "dq_idx", "orig_in", "dq_out")
    )
    dead = safe.select(
        "model", F.explode(F.array("q_idx", "dq_idx")).alias("idx")
    )
    rewires = F.broadcast(safe.select("model", "orig_in", "dq_out"))
    kept = layers.join(F.broadcast(dead), ["model", "idx"], "left_anti")
    # rewire consumers of each cancelled dequant output to the original
    # float tensor (collect_list is planner-scale: one map per model)
    rmap = rewires.groupBy("model").agg(
        F.map_from_arrays(
            F.collect_list("dq_out"), F.collect_list("orig_in")
        ).alias("rw")
    )
    return (
        kept.join(F.broadcast(rmap), "model", "left")
        .withColumn(
            "inputs",
            F.when(
                F.col("rw").isNotNull(),
                F.transform(
                    "inputs", lambda t: F.coalesce(F.col("rw")[t], t)
                ),
            ).otherwise(F.col("inputs")),
        )
        .drop("rw")
    )


CPU_FORCED_OPS = ("Softmax", "ReduceMean", "Reshape", "Transpose")


def partition_by_cost(
    layers: DataFrame,
    speedup_threshold: float = 2.0,
    overrides: DataFrame | None = None,
) -> DataFrame:
    """Cost-based CPU/CIM partitioning + greedy run-length grouping
    (`mlir_compiler/partitioner.py:4-107`, SURVEY T4): assign each layer a
    target by the 2x-speedup rule (matmul-family layers are CIM-eligible),
    then gaps-and-islands to group consecutive same-target layers.

    Per-layer overrides (U3): shape/data-movement ops are always forced
    to CPU (`partitioner.py:16-19` cpu_forced_ops), and ``overrides`` —
    a (model, name, forced_target) table, broadcast — pins specific
    layers regardless of the cost model (the user's per-layer override
    hook). Precedence: explicit override > cpu-forced op > cost rule."""
    cim_ops = ("MatMul", "Gemm", "Conv", "LSTM")
    # cost model: cycles_cpu = rows*cols, cycles_cim = rows*cols/32
    # (simulator/sim_reflex.py:91's 32-MACs-per-cycle assumption)
    cost_cpu = F.coalesce(F.col("rows") * F.col("cols"), F.lit(0)).cast("double")
    cost_cim = cost_cpu / 32.0
    cost_target = F.when(
        F.col("op_type").isin(*cim_ops)
        & (cost_cpu >= speedup_threshold * cost_cim),
        "cim",
    ).otherwise("cpu")
    base_target = F.when(
        F.col("op_type").isin(*CPU_FORCED_OPS), "cpu"
    ).otherwise(cost_target)
    if overrides is not None:
        layers = layers.join(
            F.broadcast(
                overrides.select("model", "name", "forced_target")
            ),
            ["model", "name"],
            "left",
        )
        target = F.coalesce(F.col("forced_target"), base_target)
    else:
        target = base_target
    w = Window.partitionBy("model").orderBy("idx")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = layers.withColumn("target", target).withColumn(
        "is_boundary",
        F.when(
            ~F.col("target").eqNullSafe(F.lag("target").over(w)), 1
        ).otherwise(0),
    )
    out = flagged.withColumn(
        "partition_id", F.sum("is_boundary").over(wcum).cast("long")
    ).drop("is_boundary")
    if overrides is not None:
        out = out.drop("forced_target")
    return out


def liveness(layers: DataFrame) -> DataFrame:
    """Tensor liveness (W9, `mlir_compiler/memory_planner.py:48-72`):
    explode inputs/outputs → per tensor [first producer idx, last consumer
    idx]. Buffer reuse is legal outside that interval."""
    produced = layers.select(
        "model", "idx", F.explode("outputs").alias("tensor")
    )
    consumed = layers.select(
        "model", "idx", F.explode("inputs").alias("tensor")
    )
    return (
        produced.withColumn("kind", F.lit("def"))
        .unionByName(consumed.withColumn("kind", F.lit("use")))
        .groupBy("model", "tensor")
        .agg(
            F.min(F.when(F.col("kind") == "def", F.col("idx"))).alias(
                "first_def"
            ),
            F.max("idx").alias("last_use"),
        )
    )


def flash_layout(layers: DataFrame, bytes_per_weight: int = 1) -> DataFrame:
    """Cumulative 256-B-aligned flash addresses (W11,
    `tools/hive_compile.py:181-187,206-217`): aligned size per layer,
    exclusive running sum = base address."""
    size = F.coalesce(F.col("rows") * F.col("cols"), F.lit(0)) * bytes_per_weight
    aligned = (F.ceil(size / ALIGN) * ALIGN).cast("long")
    w = (
        Window.partitionBy("model")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        layers.withColumn("size_bytes", size.cast("long"))
        .withColumn("aligned_bytes", aligned)
        .withColumn(
            "flash_addr",
            F.coalesce(F.sum("aligned_bytes").over(w), F.lit(0)).cast("long"),
        )
    )


def allocate_buffers(live: DataFrame, sizes: DataFrame) -> DataFrame:
    """Linear-scan first-fit buffer allocation (W10,
    `mlir_compiler/memory_planner.py:74-129`): tensors ordered by
    [first_def, last_use] get the lowest non-overlapping offset.

    Inherently sequential (each placement depends on all earlier ones) and
    planner-scale (thousands of tensors, not billions of rows), so it runs
    as a single-partition applyInPandas per model — models still
    parallelize across the cluster.
    """
    import pandas as pd  # local: only the planner path needs it

    joined = live.join(sizes, ["model", "tensor"])
    schema = (
        "model string, tensor string, first_def int, last_use int, "
        "size_bytes long, offset long"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # graph inputs have no producer: first_def NaN → -1 (live from entry)
        pdf = pdf.copy()
        pdf["first_def"] = pdf["first_def"].fillna(-1).astype("int64")
        pdf = pdf.sort_values(["first_def", "last_use", "tensor"]).reset_index(
            drop=True
        )
        placed: list[tuple[int, int, int, int]] = []  # (off, end, first, last)
        offsets = []
        for r in pdf.itertuples():
            first = int(r.first_def)
            candidate = 0
            # first-fit: bump past every live, overlapping allocation
            for off, end, p_first, p_last in sorted(placed):
                overlaps_lifetime = not (p_last < first or int(r.last_use) < p_first)
                if overlaps_lifetime and not (end <= candidate or off >= candidate + r.size_bytes):
                    candidate = end
            placed.append(
                (candidate, candidate + int(r.size_bytes), first, int(r.last_use))
            )
            offsets.append(candidate)
        out = pdf[["model", "tensor", "first_def", "last_use", "size_bytes"]].copy()
        out["offset"] = offsets
        return out

    return joined.groupBy("model").applyInPandas(fn, schema)
