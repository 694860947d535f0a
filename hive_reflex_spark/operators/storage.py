"""Log-structured key-value compaction — the reference's NVS flash store
re-expressed as a relational MERGE/compaction plan.

The reference's NVS (`imc22_sdk/imc22_nvs.c`) is an append-only flash log
of packed items (`NVS_Item_t`: key, type, size, flags, crc32, data);
`NVS_Set` always appends a fresh record, `NVS_Delete` appends a tombstone
(`NVS_ITEM_FLAG_DELETED`), `NVS_Get` scans for the LAST valid record of a
key, and compaction rewrites the partition keeping only each key's latest
live value, reclaiming every superseded byte. That is exactly the
log-compaction / CDC-upsert shape a data platform runs constantly
(Kafka compacted topics, Delta/Hudi MERGE, RocksDB L0→L1): last-write-wins
per key with tombstone elimination.

Spark-first shape: ONE hash aggregate — ``groupBy(key).agg(max_by(...))``
— no window, no sort. ``max_by(struct, seq)`` gives the latest record
per key with map-side partial aggregation, so at 100 TB the log streams
through a single shuffle keyed by ``key`` and the reducers hold one
candidate record per key, not the key's whole history. (The window
``row_number() = 1`` formulation materializes and sorts every version of
a key on one task — strictly worse; it exists here only inside the
DuckDB oracle via ``arg_max``, which is the same aggregate.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_reflex_spark.io import read_table
from hive_reflex_spark.registry import query

# events-table mapping to an NVS write log:
#   key       = event_type '/' user_id % KEY_MOD   (bounded key space)
#   seq       = event_id                            (append order — unique)
#   tombstone = value < TOMBSTONE_BELOW             (NVS_Delete records)
#   size      = ITEM_HEADER + octet_length(props)   (NVS_Item_t header +
#               flexible data[] payload, imc22_nvs.c:17-25)
KEY_MOD = 32
TOMBSTONE_BELOW = 10.0
ITEM_HEADER = 44  # key[32] + type(2) + size(2) + flags(2) + crc32(4) + pad


@query(
    "q135_nvs_compaction",
    oracle=f"""
    WITH log AS (
        SELECT event_type || '/' || CAST(user_id % {KEY_MOD} AS VARCHAR)
                   AS key,
               event_id AS seq,
               value < {TOMBSTONE_BELOW!r} AS tombstone,
               {ITEM_HEADER} + strlen(props) AS item_bytes
        FROM events)
    SELECT key,
           COUNT(*) AS n_writes,
           CAST(SUM(CASE WHEN tombstone THEN 1 ELSE 0 END) AS BIGINT)
               AS n_tombstones,
           MAX(seq) AS last_seq,
           NOT arg_max(tombstone, seq) AS live,
           CAST(CASE WHEN arg_max(tombstone, seq) THEN 0
                     ELSE arg_max(item_bytes, seq) END AS BIGINT)
               AS live_bytes,
           CAST(SUM(item_bytes)
                - CASE WHEN arg_max(tombstone, seq) THEN 0
                       ELSE arg_max(item_bytes, seq) END AS BIGINT)
               AS reclaimed_bytes
    FROM log
    GROUP BY key
    """,
)
def q135_nvs_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NVS log compaction (`imc22_sdk/imc22_nvs.c` Get/compaction
    semantics): treat events as the append-only item log, then one
    ``max_by``-per-key aggregate yields the post-compaction state — the
    latest record wins, a latest-tombstone key is dead, and every
    superseded byte counts as reclaimed. Single shuffle on ``key`` with
    map-side combine; output cardinality = |key space|."""
    log = read_table(spark, sf_dir, "events").select(
        F.concat_ws(
            "/", F.col("event_type"), (F.col("user_id") % KEY_MOD)
        ).alias("key"),
        F.col("event_id").alias("seq"),
        (F.col("value") < TOMBSTONE_BELOW).alias("tombstone"),
        (F.lit(ITEM_HEADER) + F.octet_length("props")).alias("item_bytes"),
    )
    last_tomb = F.max_by("tombstone", "seq")
    last_bytes = F.when(last_tomb, F.lit(0)).otherwise(
        F.max_by("item_bytes", "seq")
    )
    return log.groupBy("key").agg(
        F.count("*").alias("n_writes"),
        F.sum(F.col("tombstone").cast("int")).cast("long")
        .alias("n_tombstones"),
        F.max("seq").alias("last_seq"),
        (~last_tomb).alias("live"),
        last_bytes.cast("long").alias("live_bytes"),
        (F.sum("item_bytes") - last_bytes).cast("long")
        .alias("reclaimed_bytes"),
    )
