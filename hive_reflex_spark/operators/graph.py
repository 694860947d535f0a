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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hive_reflex_spark.operators.dedup import (
    BAND_SIZE,
    _DUCK_MINHASH,
    q49a_lsh_candidates_star,
)
from hive_reflex_spark.io import chain_checkpoint, corpus_checkpoint
from hive_reflex_spark.registry import query


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Label propagation to fixpoint: returns (vertex, component) with
    component = min vertex id in the component.

    Scale discipline: the edge list is materialized once (corpus-tier persist)
    instead of recomputing its upstream lineage every round; each round's
    labels are eagerly checkpointed, which truncates the join-on-join
    lineage AND doubles as the round's single action; convergence is a
    ``_changed`` flag folded into the label update (read off the already
    materialized round result) — no separate join+count job re-executing
    the DAG. Superseded round caches are unpersisted as soon as the next
    round is materialized."""
    # ONE pass over the edge upstream (r12): the r11 shape unioned raw
    # `edges` with itself twice (verts, then sym) before any checkpoint,
    # so Catalyst — which never shares unreferenced common subplans —
    # computed the edge lineage (LSH banding for q78) FOUR times in
    # setup. Checkpoint the projected edges first; symmetrize and
    # collect vertices from the materialized rows.
    # corpus tier (r13): edge volume grows with the corpus — lazy
    # persist keeps lineage (fault-tolerant) and is read by every round
    e = corpus_checkpoint(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    verts = sym.select(F.col("a").alias("vertex")).distinct()
    # chain tier (r13): per-round truncation is structural (the loop's
    # lineage compounds otherwise); reliable checkpoint when a dir is
    # configured — the production answer for iterative graph lineage
    labels = chain_checkpoint(verts.withColumn("component", F.col("vertex")))
    prev_ck = labels
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
            .transform(chain_checkpoint)  # eager: materializes round + truncates lineage
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
    WITH RECURSIVE mh AS MATERIALIZED (SELECT * FROM {_DUCK_MINHASH} m),
    bands AS MATERIALIZED (SELECT doc_id, seed // {BAND_SIZE} AS band,
                     MIN(CASE WHEN seed % {BAND_SIZE} = 0 THEN sig END)
                     || MIN(CASE WHEN seed % {BAND_SIZE} = 1 THEN sig END)
                         AS band_sig
              FROM mh GROUP BY doc_id, seed // {BAND_SIZE}),
    edges AS MATERIALIZED (SELECT a.doc_id AS src, b.doc_id AS dst
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.band_sig = b.band_sig
                   AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id),
    sym AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges
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
    to drop.

    The edge feed is q49a's STAR candidate stream (hub→member per band
    bucket): linear in corpus size where q49's all-pairs stream is
    quadratic in bucket size (11.1M vs 143k edges at sf1 — 78x less
    edge work, BASELINE.md r6/r7), and LOSSLESS for clustering because
    a bucket's star is connected. The oracle deliberately stays the
    all-pairs transitive closure, so every driver check independently
    re-proves the star==all-pairs component equivalence end-to-end
    (also asserted in tests). The DuckDB recursive closure itself stays
    quadratic in component size — infeasible on the sf1 dup-dense graph
    regardless of which edge stream feeds it (in-engine invariant
    evidence stands, BASELINE.md r6)."""
    edges = q49a_lsh_candidates_star(spark, sf_dir).select(
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


# ---------------------------------------------------------------------------
# Dup-graph shape audit — triangles / clustering coefficient over the
# verified near-dup edge set
# ---------------------------------------------------------------------------


def _dup_graph_oracle() -> str:
    from hive_reflex_spark.operators.dedup import q47_jaccard_pairs
    from hive_reflex_spark.registry import ORACLES

    q47_sql = ORACLES["q47_jaccard_pairs"].strip()
    return f"""
    WITH edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM ({q47_sql}) p),
    nodes AS (
        SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
        GROUP BY v),
    tri AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e1.b = e2.a
        JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b),
    agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MAX(deg) AS BIGINT) AS max_degree,
               CAST(SUM(deg * (deg - 1) / 2) AS BIGINT) AS n_wedges
        FROM nodes),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM edges)
    SELECT n_nodes, n_edges, max_degree, n_wedges, n_triangles,
           ROUND(CASE WHEN n_wedges = 0 THEN 0.0
                 ELSE 3.0 * n_triangles / n_wedges END, 6)
               AS clustering_coeff
    FROM agg, ne, tri
    """


@query("q231_dup_graph_shape", oracle=_dup_graph_oracle())
def q231_dup_graph_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape audit of the verified near-dup graph (q47's J≥0.5 edges):
    node/edge counts, max degree, wedge count and the global clustering
    coefficient (3·triangles/wedges). The number decides the dedup
    POLICY: cliquish clusters (coefficient → 1) are true duplicate
    families where keep-first is safe; chain-like graphs (→ 0) mean
    transitive drift — A~B~C with A≁C — where keep-first over-deletes
    and q78's connected-components clustering needs a similarity floor.
    Triangles come from the ordered edge-adjacency join (a<b<c, each
    triangle counted once); every input here is the collision-bounded
    verified pair set, orders of magnitude below corpus scale."""
    from hive_reflex_spark.operators.dedup import q47_jaccard_pairs

    # materialize the verified pair set once (r12): it is referenced
    # five times below (degree union + the three triangle legs) and
    # Catalyst does not share unreferenced common subplans — the cold
    # path re-ran the whole q47 pipeline per reference
    edges = (
        q47_jaccard_pairs(spark, sf_dir)
        .select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .transform(corpus_checkpoint)  # corpus tier (r13)
    )
    nodes = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    agg = nodes.agg(
        F.count("*").alias("n_nodes"),
        F.max("deg").cast("long").alias("max_degree"),
        F.sum((F.col("deg") * (F.col("deg") - 1) / 2).cast("long")).alias(
            "n_wedges"
        ),
    )
    ne = edges.agg(F.count("*").alias("n_edges"))
    return (
        agg.join(F.broadcast(ne))
        .join(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            "max_degree",
            "n_wedges",
            "n_triangles",
            F.round(
                F.when(F.col("n_wedges") == 0, 0.0).otherwise(
                    3.0 * F.col("n_triangles") / F.col("n_wedges")
                ),
                6,
            ).alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# PageRank centrality over the near-dup graph: canonical-doc selection
# ---------------------------------------------------------------------------

_PR_ITERS = 20  # fixed damped iterations (unrolled in the oracle)
_PR_TOP = 10  # most-central docs reported


def _pagerank_oracle() -> str:
    from hive_reflex_spark.registry import ORACLES

    q47_sql = ORACLES["q47_jaccard_pairs"].strip()
    ctes = [
        f"""edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM ({q47_sql}) p)""",
        """sym AS MATERIALIZED (SELECT a, b FROM edges
           UNION ALL SELECT b, a FROM edges)""",
        """deg AS MATERIALIZED (SELECT a AS v, CAST(COUNT(*) AS BIGINT)
               AS d FROM sym GROUP BY a)""",
        """it0 AS MATERIALIZED (SELECT v, CAST(1000000 AS BIGINT) AS s
           FROM deg)""",
    ]
    for k in range(1, _PR_ITERS + 1):
        ctes.append(
            f"""it{k} AS MATERIALIZED (
        SELECT sym.b AS v,
               CAST(150000 + (850 * SUM(prev.s // deg.d)) // 1000
                   AS BIGINT) AS s
        FROM sym JOIN it{k - 1} prev ON sym.a = prev.v
                 JOIN deg ON sym.a = deg.v
        GROUP BY sym.b)"""
        )
    ctes.append(
        f"""ranked AS (SELECT it.v AS doc_id, it.s AS score_ppm, deg.d
                AS degree,
                ROW_NUMBER() OVER (ORDER BY it.s DESC, it.v) AS rnk
         FROM it{_PR_ITERS} it JOIN deg ON it.v = deg.v)"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(rnk AS INTEGER) AS rank, doc_id, degree,
           score_ppm / 1000000.0 AS pagerank
    FROM ranked WHERE rnk <= {_PR_TOP} ORDER BY rank"""
    )


@query("q244_dedup_pagerank", oracle=_pagerank_oracle())
def q244_dedup_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the VERIFIED near-dup graph (q47's
    J>=0.5 edges) — the canonical-selection upgrade for dedup clusters:
    q78 keeps min(doc_id) per component, but the doc every other
    near-dup points at (highest stationary mass) is the better canonical
    when clusters are stars of rewrites around an original; the top-10
    list IS that policy's pick order. Damped (0.85) PageRank runs as 20
    fixed iterations of EXACT integer arithmetic in ppm units —
    share(u) = s_u div deg_u, s'(v) = 150000 + (850*sum shares) div 1000,
    all nonnegative so Spark `div`, DuckDB `//`, and the unrolled
    MATERIALIZED CTE chain agree bit-for-bit; the ranking orders by the
    integer score (float ranks would make ties engine-dependent).

    Scale (100 TB): each round is ONE shuffle of the edge list keyed on
    vertex id (the connected_components discipline — a chain checkpoint per
    round truncates the 20-round lineage); scores live with vertices,
    never collected. The verify-on-candidates edge set is linear in the
    corpus (q49a's star topology), so 20 rounds cost 20 edge-list
    shuffles regardless of scale."""
    from hive_reflex_spark.operators.dedup import q47_jaccard_pairs

    edges = q47_jaccard_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    # both directions in ONE pass over the pair pipeline (a self-union
    # here would compute the q47 upstream twice — unshared subplans)
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(
                        F.col("b").alias("a"), F.col("a").alias("b")
                    ),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .transform(corpus_checkpoint)  # corpus tier (r13)
    )
    deg = sym.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("d"))
    scores = deg.select("v", F.lit(1_000_000).cast("long").alias("s"))
    scores = chain_checkpoint(scores)  # chain tier (r13)
    for _ in range(_PR_ITERS):
        shares = (
            sym.join(scores, sym.a == scores.v)
            .join(deg.withColumnRenamed("v", "dv"), sym.a == F.col("dv"))
            .select(F.col("b"), F.expr("s div d").alias("share"))
        )
        nxt = shares.groupBy(F.col("b").alias("v")).agg(
            (150_000 + F.expr("(850 * sum(share)) div 1000"))
            .cast("long")
            .alias("s")
        )
        prev = scores
        scores = chain_checkpoint(nxt)
        prev.unpersist()
    wr = Window.orderBy(F.desc("s"), "v")
    ranked = (
        scores.join(deg, "v")
        .select(
            F.col("v").alias("doc_id"),
            F.col("s").alias("score_ppm"),
            F.col("d").alias("degree"),
            F.row_number().over(wr).alias("rnk"),
        )
        .filter(F.col("rnk") <= _PR_TOP)
    )
    return ranked.select(
        F.col("rnk").cast("int").alias("rank"),
        "doc_id",
        "degree",
        (F.col("score_ppm") / 1_000_000.0).alias("pagerank"),
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Mutual-kNN graph metrics: triangles, clustering coefficient, homophily
# ---------------------------------------------------------------------------

_KNN_K = 3  # neighbors per vertex in the kNN graph
_KNN_CAP = 512  # q51a's all-pairs fence (NEARDUP_CORPUS_CAP)


@query(
    "q248_knn_graph_triangles",
    oracle=f"""
    WITH coords AS (SELECT vec_id, CAST(dim AS INTEGER) AS dim,
                           CAST(v AS DOUBLE) AS v
                    FROM (SELECT vec_id,
                                 unnest(range(len(embedding))) AS dim,
                                 unnest(embedding) AS v
                          FROM embeddings
                          WHERE vec_id < {_KNN_CAP})),
         norms AS (SELECT vec_id,
                          sqrt(CAST(SUM(CAST(ROUND(v * v * 1000000000)
                               AS BIGINT)) AS BIGINT) / 1000000000.0) AS nrm
                   FROM coords GROUP BY vec_id),
         dots AS (SELECT a.vec_id AS va, b.vec_id AS vb,
                         CAST(SUM(CAST(ROUND(a.v * b.v * 1000000000)
                              AS BIGINT)) AS BIGINT) / 1000000000.0 AS dot
                  FROM coords a JOIN coords b
                    ON a.dim = b.dim AND a.vec_id < b.vec_id
                  GROUP BY a.vec_id, b.vec_id),
         scored AS (SELECT va, vb, dot / (na.nrm * nb.nrm) AS cos
                    FROM dots
                    JOIN norms na ON va = na.vec_id
                    JOIN norms nb ON vb = nb.vec_id),
         sym AS (SELECT va AS s, vb AS d, cos FROM scored
                 UNION ALL SELECT vb, va, cos FROM scored),
         knn AS (SELECT s, d FROM (
                   SELECT s, d, ROW_NUMBER() OVER (PARTITION BY s
                              ORDER BY cos DESC, d) AS rn FROM sym)
                 WHERE rn <= {_KNN_K}),
         mutual AS (SELECT k1.s AS a, k1.d AS b FROM knn k1
                    JOIN knn k2 ON k1.s = k2.d AND k1.d = k2.s
                    WHERE k1.s < k1.d),
         deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS dg
                 FROM (SELECT a AS v FROM mutual
                       UNION ALL SELECT b FROM mutual) GROUP BY v),
         tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM mutual e1
                 JOIN mutual e2 ON e1.b = e2.a
                 JOIN mutual e3 ON e3.a = e1.a AND e3.b = e2.b),
         lab AS (SELECT CAST(SUM(CASE WHEN la.label = lb.label
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_intra
                 FROM mutual m
                 JOIN embeddings la ON m.a = la.vec_id
                 JOIN embeddings lb ON m.b = lb.vec_id)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_vertices,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM mutual) AS n_edges,
           (SELECT CAST(SUM((dg * (dg - 1)) // 2) AS BIGINT) FROM deg)
               AS n_wedges,
           (SELECT n FROM tri) AS n_triangles,
           ROUND((SELECT 3.0 * n FROM tri)
                 / (SELECT SUM((dg * (dg - 1)) // 2) FROM deg), 6)
               AS clustering,
           (SELECT n_intra FROM lab) AS n_intra_label,
           ROUND((SELECT n_intra * 1.0 FROM lab)
                 / (SELECT COUNT(*) FROM mutual), 6) AS homophily
    """,
)
def q248_knn_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structure metrics of the mutual-3NN embedding graph: triangle
    count, global clustering coefficient, and label homophily — the
    embedding-space quality audit (well-trained embeddings cluster, so
    mutual-kNN neighborhoods close into triangles and edges stay within a
    label; a gaussian cloud scores near the random baseline). Cosine uses
    the q51a integer-unit discipline (9dp-unit dots, exact norms), so the
    kNN ranking — computed BEFORE any rounding — orders identical doubles
    on both engines; the pair generator is the same {_KNN_CAP}-fenced
    coordinate join, with the LSH/IVF tiers (q53/q102) as the unfenced
    candidate source at corpus scale.

    Scale (100 TB): mutual-kNN degree is bounded by k, so every
    per-vertex wedge expansion is <= C(k,2) rows and triangle counting is
    O(n·k²) — no degree-orientation tricks needed (that is why dedup
    audits run on the kNN graph, not the raw similarity graph). Each
    stage is an equi-join on vertex id; nothing collects."""
    from hive_reflex_spark.functions import exact_sum
    from hive_reflex_spark.io import read_table
    from hive_reflex_spark.operators.tensor import embedding_coords

    coords = embedding_coords(spark, sf_dir).filter(F.col("vec_id") < _KNN_CAP)
    norms = coords.groupBy("vec_id").agg(
        F.sqrt(exact_sum(F.col("v") * F.col("v"), 9)).alias("nrm")
    )
    a = coords.alias("a")
    b = coords.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.dim") == F.col("b.dim"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb")
        )
        .agg(exact_sum(F.col("a.v") * F.col("b.v"), 9).alias("dot"))
    )
    na = norms.alias("na")
    nb = norms.alias("nb")
    scored = (
        dots.join(F.broadcast(na), F.col("va") == F.col("na.vec_id"))
        .join(F.broadcast(nb), F.col("vb") == F.col("nb.vec_id"))
        .select(
            "va",
            "vb",
            (F.col("dot") / (F.col("na.nrm") * F.col("nb.nrm"))).alias("cos"),
        )
    )
    # one pass over the dot-product pipeline for both directions (a
    # self-union would evaluate the pair scoring twice — unshared
    # subplans, the r12 lesson)
    sym = scored.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("va").alias("s"),
                    F.col("vb").alias("d"),
                    F.col("cos"),
                ),
                F.struct(
                    F.col("vb").alias("s"),
                    F.col("va").alias("d"),
                    F.col("cos"),
                ),
            )
        ).alias("e")
    ).select("e.s", "e.d", "e.cos")
    wk = Window.partitionBy("s").orderBy(F.desc("cos"), "d")
    knn = (
        sym.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _KNN_K)
        .select("s", "d")
    )
    k1 = knn.alias("k1")
    k2 = knn.alias("k2")
    mutual = (
        k1.join(
            k2,
            (F.col("k1.s") == F.col("k2.d"))
            & (F.col("k1.d") == F.col("k2.s")),
        )
        .filter(F.col("k1.s") < F.col("k1.d"))
        .select(F.col("k1.s").alias("a"), F.col("k1.d").alias("b"))
    ).transform(corpus_checkpoint)  # reused by four downstream aggregates (corpus tier r13)
    deg = (
        mutual.select(F.col("a").alias("v"))
        .unionAll(mutual.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("dg"))
    )
    e1 = mutual.alias("e1")
    e2 = mutual.alias("e2")
    e3 = mutual.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.b") == F.col("e2.a"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a"))
            & (F.col("e3.b") == F.col("e2.b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    la = emb.alias("la")
    lb = emb.alias("lb")
    lab = (
        mutual.join(F.broadcast(la), F.col("a") == F.col("la.vec_id"))
        .join(F.broadcast(lb), F.col("b") == F.col("lb.vec_id"))
        .agg(
            F.sum(
                F.when(F.col("la.label") == F.col("lb.label"), 1).otherwise(0)
            ).cast("long").alias("n_intra_label")
        )
    )
    counts = mutual.agg(F.count("*").cast("long").alias("n_edges"))
    vw = deg.agg(
        F.count("*").cast("long").alias("n_vertices"),
        F.sum(F.expr("(dg * (dg - 1)) div 2")).cast("long").alias("n_wedges"),
    )
    return (
        vw.crossJoin(counts)
        .crossJoin(tri)
        .crossJoin(lab)
        .select(
            "n_vertices",
            "n_edges",
            "n_wedges",
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering"),
            "n_intra_label",
            F.round(
                F.col("n_intra_label") * 1.0 / F.col("n_edges"), 6
            ).alias("homophily"),
        )
    )


# ---------------------------------------------------------------------------
# HyperBall: the neighborhood function via per-node HLL registers
# ---------------------------------------------------------------------------

_HB_ROUNDS = 3  # fixed ball radius (unrolled in the oracle)


def _hyperball_oracle() -> str:
    from hive_reflex_spark.operators.analytics import (
        HLL_M,
        _HLL_ALPHA,
        _LZ_DIGIT,
    )
    from hive_reflex_spark.registry import ORACLES

    q47_sql = ORACLES["q47_jaccard_pairs"].strip()
    lz = _LZ_DIGIT.format(
        d="instr('0123456789abcdef', substr(ltrim(suffix, '0'), 1, 1)) - 1"
    )
    ctes = [
        f"""edges AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM ({q47_sql}) p)""",
        """bidir AS (SELECT a AS u, b AS v FROM edges
                     UNION ALL SELECT b AS u, a AS v FROM edges)""",
        f"""r0 AS (SELECT doc_id AS v,
                         substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
                             AS bucket,
                         CAST(4 * (29 - len(ltrim(substr(md5(CAST(doc_id
                                  AS VARCHAR)), 3, 29), '0')))
                              + CASE WHEN ltrim(substr(md5(CAST(doc_id
                                          AS VARCHAR)), 3, 29), '0') = ''
                                     THEN 0 ELSE {lz} END + 1
                              AS BIGINT) AS m_j
                  FROM (SELECT doc_id,
                               substr(md5(CAST(doc_id AS VARCHAR)), 3, 29)
                                   AS suffix
                        FROM documents))""",
    ]
    for t in range(1, _HB_ROUNDS + 1):
        ctes.append(
            f"""r{t} AS (SELECT v, bucket, CAST(MAX(m_j) AS BIGINT) AS m_j
                 FROM (SELECT v, bucket, m_j FROM r{t - 1}
                       UNION ALL
                       SELECT e.v, r.bucket, r.m_j
                       FROM bidir e JOIN r{t - 1} r ON r.v = e.u)
                 GROUP BY v, bucket)"""
        )
    for t in range(0, _HB_ROUNDS + 1):
        ctes.append(
            f"""s{t} AS (SELECT CAST({t} AS BIGINT) AS t,
                        CAST(COUNT(*) AS BIGINT) AS n_nodes,
                        CAST(SUM(mass) AS BIGINT) AS register_mass,
                        CAST(SUM(CAST(ROUND(1e6 * e) AS BIGINT))
                             AS BIGINT) AS nf_units
                 FROM (SELECT v, mass,
                              CASE WHEN e_raw <= 2.5 * {HLL_M}
                                        AND {HLL_M} - nb > 0
                                   THEN {HLL_M} * ln({HLL_M} * 1.0
                                                     / ({HLL_M} - nb))
                                   ELSE e_raw END AS e
                       FROM (SELECT v, SUM(m_j) AS mass,
                                    COUNT(*) AS nb,
                                    CAST({_HLL_ALPHA} AS DOUBLE)
                                        * {HLL_M} * {HLL_M}
                                        / (SUM(pow(2.0, -m_j))
                                           + ({HLL_M} - COUNT(*)))
                                        AS e_raw
                             FROM r{t} GROUP BY v)))"""
        )
    unions = " UNION ALL ".join(
        f"SELECT * FROM s{t}" for t in range(0, _HB_ROUNDS + 1)
    )
    return f"""
    WITH {','.join(ctes)},
    allr AS ({unions})
    SELECT allr.t, allr.n_nodes, allr.register_mass, allr.nf_units,
           CAST(ROUND(allr.nf_units / 1e6) AS BIGINT) AS nf_est,
           ROUND(allr.nf_units * 1.0 / fin.nf_units, 6) AS reach_ratio
    FROM allr, (SELECT nf_units FROM s{_HB_ROUNDS}) fin
    """


@query("q285_hyperball", oracle=_hyperball_oracle())
def q285_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the neighborhood function
    N(t) = sum over nodes of |ball(v, t)| on the verified near-dup
    graph (q47's J>=0.5 edges over ALL documents, isolated nodes
    included), computed by per-node HLL registers that each round
    max-merges with the neighbors' registers — the algorithm that
    measured the Facebook graph's four degrees of separation, and the
    canonical "graph metric via mergeable sketch" pattern: exact BFS
    from every node is |V| traversals, HyperBall is T rounds of one
    grouped MAX each. reach_ratio(t) = N(t)/N(T) reads off how fast
    the graph saturates (effective-diameter form); register_mass is
    the exact-integer convergence witness (monotone, fixpoint when
    stable between rounds).

    Exactness: registers are md5-deterministic integers (the q118
    construction, per node instead of per event_type); each round is
    an integer MAX; per-node estimates freeze to 1e-6 units BEFORE the
    corpus sum (order-independent), and the small-range linear-count
    correction is q118's verbatim.

    Scale: state is |V| x <=256 small integers (the HyperBall paper's
    memory bound); each round shuffles register rows along edges — a
    hash join on vertex id, no BFS frontier materialization. Fixed
    T = 3 rounds (near-dup components have tiny diameters; q231's
    clustering coefficient says cliquish) — the oracle unrolls the
    same three max-merges."""
    from hive_reflex_spark.operators.analytics import (
        HLL_M,
        _HLL_ALPHA,
        hll_registers,
    )
    from hive_reflex_spark.operators.dedup import q47_jaccard_pairs

    from hive_reflex_spark.io import read_table as _rt

    docs = _rt(spark, sf_dir, "documents")
    edges = q47_jaccard_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    # one pass over the pair pipeline for both directions (self-union =
    # two full q47 evaluations; unshared subplans)
    bidir = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("u"), F.col("b").alias("v")
                    ),
                    F.struct(
                        F.col("b").alias("u"), F.col("a").alias("v")
                    ),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .transform(corpus_checkpoint)  # corpus tier (r13): edge-scale
    )
    nodes = docs.select(F.col("doc_id").alias("v"))
    # chain tier (r13): each HyperBall round folds the previous round's
    # registers — truncation is structural
    regs = chain_checkpoint(hll_registers(nodes, ["v"], key_col="v"))

    def summarize(r: DataFrame, t: int) -> DataFrame:
        per = r.groupBy("v").agg(
            F.sum("m_j").alias("mass"),
            F.count("*").alias("nb"),
            F.sum(F.pow(F.lit(2.0), -F.col("m_j"))).alias("sum_pow"),
        )
        e_raw = (
            _HLL_ALPHA * HLL_M * HLL_M
            / (F.col("sum_pow") + (HLL_M - F.col("nb")))
        )
        est = per.select(
            "mass",
            F.when(
                (e_raw <= 2.5 * HLL_M) & (HLL_M - F.col("nb") > 0),
                HLL_M * F.log(HLL_M * 1.0 / (HLL_M - F.col("nb"))),
            )
            .otherwise(e_raw)
            .alias("e"),
        )
        return est.agg(
            F.lit(t).cast("long").alias("t"),
            F.count("*").cast("long").alias("n_nodes"),
            F.sum("mass").cast("long").alias("register_mass"),
            F.sum(F.round(F.lit(1e6) * F.col("e")).cast("long"))
            .cast("long")
            .alias("nf_units"),
        ).select("t", "n_nodes", "register_mass", "nf_units")

    summaries = [summarize(regs, 0)]
    for t in range(1, _HB_ROUNDS + 1):
        contrib = bidir.join(
            regs.withColumnRenamed("v", "u"), "u"
        ).select("v", "bucket", "m_j")
        regs = (
            regs.unionByName(contrib)
            .groupBy("v", "bucket")
            .agg(F.max("m_j").alias("m_j"))
            .transform(chain_checkpoint)
        )
        summaries.append(summarize(regs, t))
    allr = summaries[0]
    for s in summaries[1:]:
        allr = allr.unionByName(s)
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return allr.withColumn(
        "nf_est", F.round(F.col("nf_units") / F.lit(1e6)).cast("long")
    ).withColumn(
        "reach_ratio",
        F.round(
            F.col("nf_units")
            * 1.0
            / F.max(F.when(F.col("t") == _HB_ROUNDS, F.col("nf_units")))
            .over(wall),
            6,
        ),
    )
