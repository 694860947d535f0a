"""Graph operators for dedup clustering: connected components over the
near-duplicate candidate pairs.

Pairwise dedup (q47/q49) finds *edges*; a training-data pipeline needs
*clusters* — "keep one doc per component, drop the rest". Components are
computed by iterative label propagation (each vertex takes the min label
in its neighborhood until fixpoint): a driver loop of join + min-aggregate
rounds, converging in O(log(diameter)) iterations. This is the standard
large-graph pattern on Spark (no GraphX dependency, pure DataFrames).

Scale notes: each round is one shuffle on vertex id over the edge list;
near-dup graphs are overwhelmingly tiny components (pairs/triples), so
convergence is 2-3 rounds. Checkpoint every few rounds at real scale to
truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_reflex_spark.operators.dedup import (
    BAND_SIZE,
    _DUCK_MINHASH,
    q49_lsh_candidates,
)
from hive_reflex_spark.registry import query


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Label propagation to fixpoint: returns (vertex, component) with
    component = min vertex id in the component.

    Scale discipline: the edge list is materialized once (localCheckpoint)
    instead of recomputing its upstream lineage every round; each round's
    labels are eagerly checkpointed, which truncates the join-on-join
    lineage AND doubles as the round's single action; convergence is a
    ``_changed`` flag folded into the label update (read off the already
    materialized round result) — no separate join+count job re-executing
    the DAG. Superseded round caches are unpersisted as soon as the next
    round is materialized."""
    verts = (
        edges.select(F.col(src).alias("vertex"))
        .union(edges.select(F.col(dst).alias("vertex")))
        .distinct()
    )
    labels = verts.withColumn("component", F.col("vertex")).localCheckpoint()
    prev_ck = labels
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # each vertex adopts min(own label, neighbors' labels)
        neighbor_min = (
            sym.join(labels, sym.b == labels.vertex)
            .groupBy(F.col("a").alias("vertex"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, "vertex", "left")
            .select(
                "vertex",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
                (
                    F.coalesce(
                        F.col("nbr_component") < F.col("component"),
                        F.lit(False),
                    )
                ).alias("_changed"),
            )
            .localCheckpoint()  # eager: materializes round + truncates lineage
        )
        changed = new_labels.agg(F.max("_changed")).first()[0]
        labels = new_labels.drop("_changed")
        prev_ck.unpersist()
        prev_ck = new_labels
        if not changed:
            break
    return labels


@query(
    "q78_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE mh AS (SELECT * FROM {_DUCK_MINHASH} m),
    bands AS (SELECT doc_id, seed // {BAND_SIZE} AS band,
                     MIN(CASE WHEN seed % {BAND_SIZE} = 0 THEN sig END)
                     || MIN(CASE WHEN seed % {BAND_SIZE} = 1 THEN sig END)
                         AS band_sig
              FROM mh GROUP BY doc_id, seed // {BAND_SIZE}),
    edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.band_sig = b.band_sig
                   AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
    sym AS (SELECT src AS a, dst AS b FROM edges
            UNION ALL SELECT dst, src FROM edges),
    verts AS (SELECT DISTINCT a AS v FROM sym),
    reach AS (
        SELECT v, v AS r FROM verts
        UNION
        SELECT reach.v, sym.b FROM reach JOIN sym ON reach.r = sym.a),
    comp AS (SELECT v, MIN(r) AS component FROM reach GROUP BY v)
    SELECT component, COUNT(*) AS cluster_size, MIN(v) AS keep_doc,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped
    FROM comp GROUP BY component ORDER BY component
    """,
)
def q78_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the LSH candidate pairs: connected
    components → per-cluster size + canonical keeper (min doc_id) + docs
    to drop. The iterative label-propagation fixpoint is hash-checked
    against a DuckDB recursive-CTE transitive closure (min reachable
    vertex == min label at fixpoint); cluster==pair equivalence is also
    asserted in tests."""
    edges = q49_lsh_candidates(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = connected_components(edges)
    return (
        comp.groupBy("component")
        .agg(
            F.count("*").alias("cluster_size"),
            F.min("vertex").alias("keep_doc"),
            (F.count("*") - 1).alias("n_dropped"),
        )
        .orderBy("component")
    )
