"""Physical-layout utilities: bucketing for co-located (zero-shuffle)
joins.

At 100 TB the dominant cost of a repeated fact-fact join is the shuffle.
Bucketing pre-partitions both tables by the join key at write time, so
every later join/aggregation on that key reads co-located buckets and
skips the exchange entirely — the engine's analog of the reference's
banked scratchpad layout (`imc22_cim.c:174-193`): data placed where the
compute will consume it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucket_write(
    df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> None:
    """Persist ``df`` bucketed+sorted by ``key``: later equi-joins and
    aggregations on ``key`` between same-bucket-count tables need no
    shuffle (and no sort, thanks to sortBy)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a fresh session's catalog doesn't know about last session's managed
    # location — remove the orphan dir or saveAsTable refuses the name
    import shutil

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table}", ignore_errors=True)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket key — with matching bucket
    counts the plan contains no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def partitioned_write(df: DataFrame, path: str, *keys: str) -> None:
    """Persist ``df`` hive-partitioned by ``keys`` (one directory level
    per key value). Readers filtering on a partition key prune whole
    directories at planning time — at 100 TB this is the difference
    between scanning a day and scanning a decade. Repartition by the
    keys first so each partition directory is written by one task
    (avoiding the many-small-files explosion of per-task fan-out)."""
    df.repartition(*[df[k] for k in keys]).write.mode("overwrite").partitionBy(
        *keys
    ).parquet(path)
