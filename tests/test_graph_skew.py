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


def test_connected_components_large_star(spark):
    """10k-edge star (one hub, 10k spokes) + a disjoint chain: the worst
    case for label propagation fan-in. Converges with checkpointed lineage
    (no lineage blow-up) and labels everything with the hub's min id."""
    hub_edges = [(0, i) for i in range(1, 10_001)]
    chain = [(20_000 + i, 20_001 + i) for i in range(5)]
    edges = spark.createDataFrame(hub_edges + chain, "src long, dst long")
    comp = connected_components(edges)
    counts = {
        r.component: r.n
        for r in comp.groupBy("component").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {0: 10_001, 20_000: 6}


def test_salted_join_rejects_outer_hows(spark):
    """right/full joins would duplicate unmatched small-side rows."""
    import pytest

    df = spark.createDataFrame([(1, 1)], "k int, v int")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError):
            salted_join(df, df, "k", how=how)


def test_jaccard_skew_guard_bounds_hot_shingle(spark, tmp_path):
    """A shingle planted in every doc must NOT contribute O(n²) candidate
    pairs: with the doc-frequency cap, docs sharing only the hot shingle
    produce zero pairs."""
    import pyspark.sql.functions as SF

    from hive_reflex_spark.operators.dedup import q47_jaccard_pairs

    n = 200  # > MAX_SHINGLE_DF (128)
    hot = "common stop phrase"
    rows = [
        # each doc: the planted hot shingle + a unique 3-word tail
        (i, f"{hot} unique{i} tail{i} word{i}", "synthetic")
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    sf_dir = str(tmp_path / "skewfix")
    docs.write.parquet(f"{sf_dir}/documents.parquet")
    out = q47_jaccard_pairs(spark, sf_dir)
    # without the cap: C(200,2) = 19900 hot-shingle collisions; with it: 0
    assert out.count() == 0


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


def test_star_candidates_preserve_components(spark):
    """q49a's star-topology edges must induce EXACTLY the same connected
    components as q49's all-pairs edges — the losslessness claim that
    justifies the linear pair stream at scale."""
    from tests.conftest import SF_SMOKE

    from hive_reflex_spark.operators.dedup import q49a_lsh_candidates_star

    def comps(edges_df):
        e = edges_df.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        rows = connected_components(e).collect()
        return {r.vertex: r.component for r in rows}

    full = comps(q49_lsh_candidates(spark, SF_SMOKE))
    star = comps(q49a_lsh_candidates_star(spark, SF_SMOKE))
    assert full == star

    # and the star stream is never larger than the all-pairs stream
    n_full = q49_lsh_candidates(spark, SF_SMOKE).count()
    n_star = q49a_lsh_candidates_star(spark, SF_SMOKE).count()
    assert n_star <= n_full
