"""Connected-components and salted-join tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_reflex_spark.functions.skew import salted_join
from hive_reflex_spark.operators.graph import (
    connected_components,
    q78_dedup_clusters,
)
from hive_reflex_spark.operators.dedup import q49_lsh_candidates


def test_connected_components_known_graph(spark):
    # two components: {1,2,3,4} (chain + cross edge) and {10,11}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (10, 11)], "src long, dst long"
    )
    got = {
        r.vertex: r.component for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_clusters_cover_all_candidates(spark, sf_smoke):
    """Every doc appearing in an LSH candidate pair lands in exactly one
    cluster, and each cluster keeps exactly one doc."""
    pairs = q49_lsh_candidates(spark, sf_smoke).collect()
    docs_in_pairs = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    clusters = q78_dedup_clusters(spark, sf_smoke).collect()
    assert sum(r.cluster_size for r in clusters) == len(docs_in_pairs)
    assert all(r.keep_doc == r.component for r in clusters)
    assert sum(r.n_dropped for r in clusters) == len(docs_in_pairs) - len(clusters)


def test_salted_join_matches_plain_join(spark):
    """Salting must not change the join result — only the task spread."""
    big = spark.createDataFrame(
        [(i % 3, i) for i in range(1000)], "k int, payload int"
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, v string")
    plain = {(r.k, r.payload, r.v) for r in big.join(small, "k").collect()}
    salted = {
        (r.k, r.payload, r.v)
        for r in salted_join(big, small, "k", n_salts=4).collect()
    }
    assert plain == salted
    # hot key spreads across salts: the salted big side uses >1 partition key
    spread = (
        big.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(F.col("k"), F.monotonically_increasing_id()),
                F.lit(4),
            ),
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert spread > 1
