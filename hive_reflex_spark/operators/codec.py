"""Compression / encoding / integrity operators (SURVEY §2A C1-C4, P8,
P17, S3): RLE round-trip, int4 nibble packing, artifact checksums.

Scale notes: RLE encode is the gaps-and-islands aggregate (shuffle on the
key); decode is array_repeat+explode — pure projection, no shuffle.
Nibble packing pairs adjacent coordinates with integer arithmetic, not a
self-join. Checksums are scan-side expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_reflex_spark.io import read_table
from hive_reflex_spark.operators.tensor import _duck_coords, embedding_coords
from hive_reflex_spark.registry import query


@query(
    "q69_rle_roundtrip",
    oracle="""
    WITH islands AS (
        SELECT user_id, island, event_type, COUNT(*) AS run_length
        FROM (
            SELECT user_id, event_type,
                   CAST(SUM(CASE WHEN event_type IS DISTINCT FROM prev_type
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS island
            FROM (SELECT user_id, event_id, event_type, ts,
                         lag(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id)
                             AS prev_type
                  FROM events))
        GROUP BY user_id, island, event_type),
         decoded AS (SELECT user_id, event_type
                     FROM islands, unnest(range(run_length)) )
    SELECT user_id, event_type,
           COUNT(*) AS n_decoded,
           (SELECT COUNT(*) FROM islands i
            WHERE i.user_id = d.user_id AND i.event_type = d.event_type)
               AS n_runs
    FROM decoded d
    GROUP BY user_id, event_type
    """,
)
def q69_rle_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLE encode → decode round-trip (C1, `compression.c:23-58`):
    encode = gaps-and-islands run lengths; decode = explode(array_repeat)
    — the zero-optimized RLE of the reference as two plan fragments. The
    decoded multiset must equal the source (n_decoded per key = original
    row count)."""
    events = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        )
        .otherwise(0)
        .alias("b"),
    ).withColumn("island", F.sum("b").over(wcum).cast("long"))
    islands = flagged.groupBy("user_id", "island", "event_type").agg(
        F.count("*").alias("run_length")
    )
    decoded = islands.select(
        "user_id",
        F.explode(
            F.array_repeat(F.col("event_type"), F.col("run_length").cast("int"))
        ).alias("event_type"),
    )
    runs = islands.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_runs")
    )
    return (
        decoded.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_decoded"))
        .join(runs, ["user_id", "event_type"])
        .select("user_id", "event_type", "n_decoded", "n_runs")
    )


@query(
    "q70_int4_pack",
    oracle=f"""
    WITH q AS (
        SELECT vec_id, dim,
               CAST(least(greatest(ROUND((v - mn) / ((mx - mn) / 15.0)), 0), 15)
                    AS INTEGER) AS q4
        FROM (SELECT vec_id, dim, v,
                     MIN(v) OVER (PARTITION BY vec_id) AS mn,
                     MAX(v) OVER (PARTITION BY vec_id) AS mx
              FROM {_duck_coords(8)}))
    SELECT e.vec_id, e.dim // 2 AS pair_idx,
           CAST(e.q4 << 4 | o.q4 AS INTEGER) AS packed,
           CAST((e.q4 << 4 | o.q4) >> 4 & 15 AS INTEGER) AS unpacked_hi,
           CAST((e.q4 << 4 | o.q4) & 15 AS INTEGER) AS unpacked_lo
    FROM q e JOIN q o
      ON e.vec_id = o.vec_id AND o.dim = e.dim + 1 AND e.dim % 2 = 0
    """,
)
def q70_int4_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int4 quantize + 2-nibbles-per-byte packing (P8, `tools/quantizer.py:
    40-72`): asymmetric 0-15 quantization per tensor, adjacent dims paired
    by an equi-join on (dim, dim+1), packed with shift/or, then unpacked
    back — the unpack columns prove losslessness in-query."""
    coords = embedding_coords(spark, sf_dir, max_vec=8)
    wv = Window.partitionBy("vec_id")
    mn, mx = F.min("v").over(wv), F.max("v").over(wv)
    scale = (mx - mn) / 15.0
    q4 = F.least(
        F.greatest(F.round((F.col("v") - mn) / scale), F.lit(0.0)), F.lit(15.0)
    ).cast("int")
    qdf = coords.withColumn("q4", q4).select("vec_id", "dim", "q4")
    e = qdf.filter(F.col("dim") % 2 == 0).alias("e")
    o = qdf.alias("o")
    packed = F.shiftleft(F.col("e.q4"), 4).bitwiseOR(F.col("o.q4"))
    return (
        e.join(
            o,
            (F.col("e.vec_id") == F.col("o.vec_id"))
            & (F.col("o.dim") == F.col("e.dim") + 1),
        )
        .select(
            F.col("e.vec_id").alias("vec_id"),
            (F.col("e.dim") / 2).cast("int").alias("pair_idx"),
            packed.cast("int").alias("packed"),
            F.shiftright(packed, 4).bitwiseAND(F.lit(15)).cast("int").alias(
                "unpacked_hi"
            ),
            packed.bitwiseAND(F.lit(15)).cast("int").alias("unpacked_lo"),
        )
    )


@query(
    "q71_artifact_checksums",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           MIN(sha256(text)) AS min_sha,
           MAX(sha256(text)) AS max_sha,
           COUNT(DISTINCT md5(text)) AS n_distinct_md5,
           CAST(SUM(n_chars) AS BIGINT) AS payload_bytes
    FROM documents
    GROUP BY source
    """,
)
def q71_artifact_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Artifact integrity manifest (P17/S3, `imc22_sdk/model_loader.h:
    39-41`'s CRC/SHA fields): per-source sha256/md5 digests + payload
    accounting — the flash-pack header checksum block as a grouped query.
    """
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.min(F.sha2("text", 256)).alias("min_sha"),
        F.max(F.sha2("text", 256)).alias("max_sha"),
        F.countDistinct(F.md5("text")).alias("n_distinct_md5"),
        F.sum("n_chars").alias("payload_bytes"),
    )
