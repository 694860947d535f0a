"""Sinks (SURVEY §2A S2-S6): parquet/CSV/JSON writers and the model
artifact packer.

The reference's export path (`tools/hive_compile.py:143-220`) concatenates
quantized layer blobs behind a magic+CRC header and emits a flash address
map. Here the *weights stay distributed* until the final pack: stats,
quantization and layout all run as DataFrame ops; only the bounded
(≤512 KB) final blob is collected to the driver for byte-level packing —
the same driver-side boundary as S2/S4 in the survey.
"""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"HRS1"  # this engine's artifact magic (parity role of "CIM2"/"HIVE")
ALIGN = 256


def write_profile_csv(df: DataFrame, path: str) -> None:
    """Per-layer profiling CSV sink (S5, `simulator/profiler.py:160-166`)."""
    df.coalesce(1).write.mode("overwrite").csv(path, header=True)


def write_runtime_log_json(df: DataFrame, path: str) -> None:
    """Batched telemetry JSON sink (S6, `tools/ai_feedback.py:88-118`)."""
    df.write.mode("overwrite").json(path)


def write_partitioned_parquet(df: DataFrame, path: str, *part_cols: str) -> None:
    """The lake-layout sink: partition columns become directory pruning
    keys for every later scan (the engine's analog of the reference's
    layer-addressed flash reads, `flash_io_optimizer.c:73-133`)."""
    w = df.write.mode("overwrite")
    if part_cols:
        w = w.partitionBy(*part_cols)
    w.parquet(path)


def pack_model_binary(
    weights: DataFrame, out_path: str, scale: float = 1.0 / 127
) -> dict:
    """Quantize + pack a coordinate-table model into a flash image
    (S2/S3, `tools/hive_compile.py:143-220`; header fields per
    `imc22_sdk/model_loader.h:26-54`).

    weights: (layer, i, j, value). Per-layer int8 blobs are built
    distributed (quantize + per-layer byte aggregation); the driver only
    concatenates the bounded blobs, prepends MAGIC | n_layers | crc32,
    and writes the 256-B-aligned address map JSON. Returns the manifest.
    """
    q = weights.select(
        "layer",
        "i",
        "j",
        F.least(
            F.greatest(F.round(F.col("value") / scale), F.lit(-127.0)),
            F.lit(127.0),
        )
        .cast("int")
        .alias("q"),
    )
    per_layer = (
        q.groupBy("layer")
        .agg(
            F.count("*").alias("n_weights"),
            F.collect_list(F.struct("i", "j", "q")).alias("cells"),
        )
        .collect()
    )
    layers = []
    blobs = []
    addr = 0
    for row in sorted(per_layer, key=lambda r: r["layer"]):
        cells = sorted(row["cells"], key=lambda c: (c["i"], c["j"]))
        blob = bytes((c["q"] + 256) % 256 for c in cells)
        aligned = -(-len(blob) // ALIGN) * ALIGN
        layers.append(
            {
                "layer": row["layer"],
                "n_weights": row["n_weights"],
                "bytes": len(blob),
                "flash_addr": addr,
                "crc32": zlib.crc32(blob) & 0xFFFFFFFF,
            }
        )
        blobs.append(blob + b"\x00" * (aligned - len(blob)))
        addr += aligned
    body = b"".join(blobs)
    # header carries BOTH crc32 and the sha256 model hash, matching the
    # reference's ModelHeader_t crc32 + model_hash[64] pair
    # (`imc22_sdk/model_loader.h:39-41`): crc for fast integrity, sha for
    # identity/anti-rollback.
    sha = hashlib.sha256(body).hexdigest()
    header = (
        MAGIC
        + struct.pack("<II", len(layers), zlib.crc32(body) & 0xFFFFFFFF)
        + sha.encode("ascii")
    )
    with open(out_path, "wb") as f:
        f.write(header + body)
    manifest = {
        "magic": MAGIC.decode(),
        "n_layers": len(layers),
        "model_hash": sha,
        "layers": layers,
    }
    with open(out_path + ".map.json", "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_model_binary(path: str) -> dict:
    """Header parse + CRC validation (`imc22_sdk/model_loader.h`'s loader
    contract): returns the manifest and verifies body + per-layer CRCs."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == MAGIC, "bad magic"
    n_layers, body_crc = struct.unpack("<II", data[4:12])
    header_sha = data[12:76].decode("ascii")
    body = data[76:]
    assert zlib.crc32(body) & 0xFFFFFFFF == body_crc, "body CRC mismatch"
    assert hashlib.sha256(body).hexdigest() == header_sha, "model hash mismatch"
    with open(path + ".map.json") as f:
        manifest = json.load(f)
    assert manifest["n_layers"] == n_layers
    assert manifest["model_hash"] == header_sha
    for layer in manifest["layers"]:
        blob = body[layer["flash_addr"] : layer["flash_addr"] + layer["bytes"]]
        assert zlib.crc32(blob) & 0xFFFFFFFF == layer["crc32"], (
            f"layer CRC mismatch: {layer['layer']}"
        )
    return manifest


def export_c_header(weights: DataFrame, name: str = "model_weights") -> str:
    """C-header export (S4, `tools/train_adaptive_model.py:315-379`):
    quantized weights as a const int8 array — a driver-side template over
    the collected (bounded) weight blob."""
    rows = (
        weights.select("layer", "i", "j", "value")
        .orderBy("layer", "i", "j")
        .collect()
    )
    vals = ", ".join(str(int(max(-127, min(127, round(r.value * 127))))) for r in rows)
    return (
        f"// generated by hive-reflex-spark\n"
        f"#include <stdint.h>\n"
        f"static const int8_t {name}[{len(rows)}] = {{{vals}}};\n"
    )


def read_json_config(spark, path: str):
    """Single-row device-config JSON source (S7, `mlir_compiler/
    rtl_pruner.py:50-60`): `spark.read.json` with multiline support."""
    return spark.read.option("multiLine", "true").json(path)
