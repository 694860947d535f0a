#!/usr/bin/env python3
"""End-to-end model-compile pipeline demo (the SURVEY §3.1 'batch ETL'
path re-expressed on Spark): weights table → calibration stats →
sparsity analysis → magnitude prune → cost partitioning → liveness →
buffer allocation → flash layout → packed binary + validated load.

Every stage before the final byte-pack is a distributed DataFrame
transform; run it to see the whole toolchain produce a loadable artifact.

Usage: python3 scripts/demo_compile_pipeline.py [out_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

from hive_reflex_spark.plans import (
    flash_layout,
    fuse_matmul_add,
    liveness,
    partition_by_cost,
)
from hive_reflex_spark.plans.passes import allocate_buffers
from hive_reflex_spark.session import get_spark
from hive_reflex_spark.sources.sinks import load_model_binary, pack_model_binary


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("compile-pipeline-demo")

    # --- the model: ReflexNet-shaped layer IR + seeded weights -----------
    rng = np.random.default_rng(42)
    layers = spark.createDataFrame(
        [
            ("reflex", 0, "fc1", "MatMul", 32, 12, ["x"], ["t1"]),
            ("reflex", 1, "bias1", "Add", None, None, ["t1", "b1"], ["a1"]),
            ("reflex", 2, "act1", "Relu", None, None, ["a1"], ["r1"]),
            ("reflex", 3, "lstm", "LSTM", 64, 32, ["r1"], ["h"]),
            ("reflex", 4, "fc2", "MatMul", 1, 16, ["h"], ["y"]),
        ],
        "model string, idx int, name string, op_type string, rows int, "
        "cols int, inputs array<string>, outputs array<string>",
    )
    weights = spark.createDataFrame(
        [
            (layer, int(i), int(j), float(v))
            for layer, (r, c) in [("fc1", (32, 12)), ("lstm", (64, 32)), ("fc2", (1, 16))]
            for (i, j), v in np.ndenumerate(
                np.where(
                    rng.random((r, c)) < 0.4, 0.0, rng.normal(scale=0.3, size=(r, c))
                )
            )
        ],
        "layer string, i int, j int, value double",
    )

    # --- compile passes (all distributed DataFrame transforms) ----------
    stats = weights.groupBy("layer").agg(
        F.count("*").alias("n"),
        F.round(F.max(F.abs("value")) / 127.0, 9).alias("scale"),
        F.round(
            F.sum(F.when(F.abs("value") < 0.01, 1).otherwise(0)) / F.count("*"), 4
        ).alias("sparsity"),
    )
    print("== calibration + sparsity ==")
    stats.orderBy("layer").show(truncate=False)

    fused = fuse_matmul_add(layers)
    print("== after MatMul+Add fusion ==")
    fused.orderBy("idx").select("idx", "name", "op_type", "outputs").show(truncate=False)

    parts = partition_by_cost(fused)
    print("== CPU/CIM partitioning ==")
    parts.orderBy("idx").select("idx", "name", "target", "partition_id").show()

    live = liveness(fused)
    sizes = fused.select(
        "model",
        F.explode("outputs").alias("tensor"),
    ).withColumn("size_bytes", F.lit(256))
    alloc = allocate_buffers(live, sizes)
    print("== liveness + linear-scan allocation ==")
    alloc.orderBy("first_def").show()

    layout = flash_layout(fused)
    print("== flash layout ==")
    layout.orderBy("idx").select("idx", "name", "size_bytes", "aligned_bytes", "flash_addr").show()

    # --- pack + validate -------------------------------------------------
    path = os.path.join(out_dir, "reflex.bin")
    manifest = pack_model_binary(weights, path)
    loaded = load_model_binary(path)
    print("== packed artifact ==")
    print(json.dumps(manifest, indent=2)[:400], "...")
    print(
        f"packed {manifest['n_layers']} layers -> {path} "
        f"({os.path.getsize(path)} bytes); CRC-validated load: "
        f"{loaded['n_layers'] == manifest['n_layers']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
