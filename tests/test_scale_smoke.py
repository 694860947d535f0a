"""Scale smoke: core curation operators executed at 20-40x the fixture
size on synthesized inputs. No timing asserts (box noise) — the signal
is that the SAME plans complete with correct invariants when the data is
millions of rows, i.e. nothing in the path collects the corpus to the
driver or explodes quadratically."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_exact_dedup_2m_rows(spark):
    """Hash-groupBy dedup over 2M synthetic docs (1% planted dup rate):
    group counts must reconcile exactly — no driver-side set building."""
    n = 2_000_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # ~1% of ids collapse onto shared texts, rest unique
        F.when(F.col("id") % 100 == 0, F.concat(F.lit("dup-"), (F.col("id") % 1000).cast("string")))
        .otherwise(F.concat(F.lit("uniq-"), F.col("id").cast("string")))
        .alias("text"),
    )
    groups = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keeper"))
    )
    stats = groups.agg(
        F.count("*").alias("n_groups"),
        F.sum("n_docs").alias("total"),
        F.sum(F.when(F.col("n_docs") > 1, F.col("n_docs") - 1).otherwise(0)).alias("dropped"),
    ).first()
    assert stats["total"] == n
    # 20k dup ids map onto 10 texts ("dup-0".."dup-900" step 100 -> 10 distinct)
    n_dup_texts = 10
    assert stats["n_groups"] == (n - n // 100) + n_dup_texts
    assert stats["dropped"] == n // 100 - n_dup_texts


def test_repeated_spans_20k_docs(spark, tmp_path):
    """q103's span pipeline at 40x the sf0.01 corpus: 20k docs, ~10% built
    from a shared boilerplate template — exactly those must flag."""
    import os

    from hive_reflex_spark.operators.dedup import q103_repeated_spans

    d = str(tmp_path / "big")
    os.makedirs(d)
    boiler = "this exact boilerplate sentence repeats across documents verbatim!"
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0,
            F.concat(F.lit(boiler + " "), F.md5(F.col("id").cast("string"))),
        )
        .otherwise(
            F.concat(
                F.md5(F.concat(F.col("id").cast("string"), F.lit("a"))),
                F.md5(F.concat(F.col("id").cast("string"), F.lit("b"))),
                F.md5(F.concat(F.col("id").cast("string"), F.lit("c"))),
            )
        )
        .alias("text"),
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text"))
    docs.write.parquet(os.path.join(d, "documents.parquet"))

    res = q103_repeated_spans(spark, d)
    agg = res.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("n_dup_spans") > 0, 1).otherwise(0)).alias("flagged"),
    ).first()
    assert agg["n_docs"] == 20_000
    # every boilerplate doc must flag; md5-concat docs share no 32-char span
    assert agg["flagged"] == 2_000


def test_sessionize_1m_events(spark):
    """Gaps-and-islands sessionization over 1M synthetic events across
    5k users: session counts reconcile with the planted gap structure."""
    ev = spark.range(1_000_000).select(
        (F.col("id") % 5_000).alias("user_id"),
        # each user's events 10 min apart, with a >30-min gap every 50th
        # event (10 + 50 = 60 min): sessions of exactly 50 events
        (
            (F.col("id") / 5_000).cast("long") * 600
            + ((F.col("id") / 5_000) / 50).cast("long") * 3000
        ).alias("ts_s"),
    )
    from pyspark.sql import Window

    wu = Window.partitionBy("user_id").orderBy("ts_s")
    sess = (
        ev.withColumn("prev", F.lag("ts_s").over(wu))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev").isNull() | (F.col("ts_s") - F.col("prev") > 1800), 1
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_sess").over(
                wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "sid")
        .count()
    )
    stats = sess.agg(
        F.count("*").alias("n_sessions"), F.sum("count").alias("total")
    ).first()
    assert stats["total"] == 1_000_000
    # 200 events/user in blocks of 50 -> 4 sessions x 5k users
    assert stats["n_sessions"] == 20_000


def test_layernorm_500k_tokens(spark):
    """q107's normalization plan at 500k token-vectors x 16 dims (8M
    coordinate rows): the chained-window shape must stay one exchange
    and the per-group invariants (mean≈0, var≈1 after norm) must hold —
    checked on an aggregate, nothing collected per group."""
    from hive_reflex_spark.operators.nn import layernorm_coords

    n_vec, dim = 500_000, 16
    coords = (
        spark.range(n_vec * dim)
        .select(
            (F.col("id") / dim).cast("long").alias("vec_id"),
            (F.col("id") % dim).cast("int").alias("dim"),
            (F.sin(F.col("id") * 0.7) * 3.0 + F.col("id") % 7).alias("v"),
        )
    )
    out = layernorm_coords(coords, keys=["vec_id"])
    stats = (
        out.groupBy("vec_id")
        .agg(
            F.avg("ln_v").alias("mu"),
            F.avg(F.col("ln_v") * F.col("ln_v")).alias("ms"),
        )
        .agg(
            F.max(F.abs(F.col("mu"))).alias("worst_mu"),
            F.min("ms").alias("min_ms"),
            F.max("ms").alias("max_ms"),
            F.count("*").alias("n"),
        )
        .first()
    )
    assert stats["n"] == n_vec
    assert stats["worst_mu"] < 1e-6
    # E[ln_v^2] = var/(var+eps) ~ 1 for non-degenerate rows
    assert 0.9 < stats["max_ms"] <= 1.0 + 1e-9


def test_fixed_lstm_800_series(spark):
    """q68a's recurrence tier at 800 independent series x 1000 steps
    (800k rows): sequences recur in parallel per key; state stays in
    the clamp bounds for every row."""
    from hive_reflex_spark.operators.nn import lstm_fixed_forward

    n_seq, steps = 800, 1000
    df = spark.range(n_seq * steps).select(
        (F.col("id") / steps).cast("long").alias("seq"),
        (F.col("id") % steps).cast("long").alias("t"),
        (F.abs(F.sin(F.col("id") * 0.3)) * 400.0).alias("value"),
    )
    out = lstm_fixed_forward(df, ["seq"], ["t"], "value", 100.0, 2)
    stats = out.agg(
        F.count("*").alias("n"),
        F.max(F.abs(F.col("h0"))).alias("m0"),
        F.max(F.abs(F.col("h1"))).alias("m1"),
        F.countDistinct(F.round(F.col("h0"), 4)).alias("d0"),
    ).first()
    assert stats["n"] == n_seq * steps
    assert stats["m0"] <= 1.0 and stats["m1"] <= 1.0
    assert stats["d0"] > 100  # non-degenerate at scale too


def test_multihead_attention_1k_tokens(spark):
    """The q66b layout at 1k tokens x 64 dims (4M score rows across 4
    heads): partition-by-query once, K/V broadcast — the plan must
    complete without a driver-side materialization and every softmax
    row-sum must be 1."""
    from pyspark.sql import Window

    n_tok = 1000
    tok = spark.range(n_tok * 64).select(
        (F.col("id") / 64).cast("long").alias("p"),
        (F.col("id") % 64).cast("int").alias("d"),
        ((F.col("id") % 64) / 16).cast("int").alias("h"),
        (F.sin(F.col("id") * 0.13)).alias("v"),
    )
    a = tok.select(F.col("p").alias("pq"), "d", "h", F.col("v").alias("qv"))
    b = tok.select(F.col("p").alias("pk"), "d", F.col("v").alias("kv"))
    sc = (
        a.join(F.broadcast(b), "d")
        .groupBy("h", "pq", "pk")
        .agg(F.sum(F.col("qv") * F.col("kv") / 4.0).alias("s"))
    )
    wq = Window.partitionBy("h", "pq")
    aw = sc.withColumn(
        "w",
        F.exp(F.col("s") - F.max("s").over(wq))
        / F.sum(F.exp(F.col("s") - F.max("s").over(wq))).over(wq),
    )
    stats = aw.groupBy("h", "pq").agg(F.sum("w").alias("tot")).agg(
        F.count("*").alias("n"),
        F.max(F.abs(F.col("tot") - 1.0)).alias("worst"),
    ).first()
    assert stats["n"] == 4 * n_tok
    assert stats["worst"] < 1e-9


def _write_docs(spark, path, df):
    import os

    os.makedirs(path)
    df.write.parquet(os.path.join(path, "documents.parquet"))


def test_bm25_50k_docs(spark, tmp_path):
    """q110 at ~100x the fixture corpus: 50k docs, 1% planted with query
    terms. The retrieval plan (broadcast df/avgdl, filtered explode,
    TakeOrderedAndProject) must return only term-bearing docs."""
    from hive_reflex_spark.operators.retrieval import q110_bm25_topk

    d = str(tmp_path / "bm25")
    docs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 100 == 0,
            F.concat(
                F.lit("spark merge window spark "),
                F.md5(F.col("id").cast("string")),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                F.md5(F.concat(F.col("id").cast("string"), F.lit("a"))),
                F.md5(F.concat(F.col("id").cast("string"), F.lit("b"))),
            )
        )
        .alias("text"),
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text"))
    _write_docs(spark, d, docs)

    rows = q110_bm25_topk(spark, d).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.doc_id % 100 == 0  # only planted docs carry query terms
        assert r.bm25 > 0


def test_cdc_chunks_20k_docs(spark, tmp_path):
    """q115 at 40x: 10% of 20k docs share a 48-token boilerplate passage.
    Content-defined boundaries hash the shared region identically in
    every doc, so a shared chunk with ~2000 occurrences must surface."""
    from hive_reflex_spark.operators.dedup import q115_cdc_chunks

    d = str(tmp_path / "cdc")
    boiler = " ".join(f"tok{i}" for i in range(48))
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 10 == 0,
            F.concat(F.lit(boiler + " "), F.md5(F.col("id").cast("string"))),
        )
        .otherwise(
            F.concat_ws(
                " ",
                F.md5(F.concat(F.col("id").cast("string"), F.lit("x"))),
                F.md5(F.concat(F.col("id").cast("string"), F.lit("y"))),
            )
        )
        .alias("text"),
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text"))
    _write_docs(spark, d, docs)

    rows = q115_cdc_chunks(spark, d).collect()
    assert len(rows) > 0
    assert max(r.n_occ for r in rows) >= 1_000


def test_shard_manifest_1m_docs(spark, tmp_path):
    """q113 at 2000x: 1M docs. Per-shard windows only — the manifest must
    cover every doc, and the md5 keyspace must spread shards evenly."""
    from hive_reflex_spark.operators.sampling import N_SHARDS, q113_shard_manifest

    d = str(tmp_path / "shards")
    docs = spark.range(1_000_000).select(
        F.col("id").alias("doc_id"),
        F.lit("a b c d").alias("text"),
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text"))
    _write_docs(spark, d, docs)

    man = q113_shard_manifest(spark, d)
    per = man.groupBy("shard").count().collect()
    assert len(per) == N_SHARDS
    counts = [r["count"] for r in per]
    assert sum(counts) == 1_000_000
    assert max(counts) < 2 * (sum(counts) / len(counts))  # no hot shard


def test_curation_pipeline_20k_docs(spark, tmp_path):
    """q129 end-to-end at 40x: the composed plan (three broadcast
    anti-join gates + split rollup) must reconcile doc conservation on a
    20k-doc corpus with planted dups — no stage silently drops or
    double-counts."""
    from hive_reflex_spark.operators.pipeline import q129_curation_pipeline

    d = str(tmp_path / "pipe")
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 50 == 0,
            # planted exact-ish near-dups: 10 shared templates
            F.concat(
                F.lit("shared template text body one two three four five "),
                (F.col("id") % 10).cast("string"),
            ),
        )
        .otherwise(
            F.concat_ws(
                " ",
                F.md5(F.concat(F.col("id").cast("string"), F.lit("p"))),
                F.md5(F.concat(F.col("id").cast("string"), F.lit("q"))),
                F.md5(F.concat(F.col("id").cast("string"), F.lit("r"))),
                F.md5(F.concat(F.col("id").cast("string"), F.lit("s"))),
            )
        )
        .alias("text"),
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s")) \
     .withColumn("n_chars", F.length("text"))
    import os

    os.makedirs(d)
    docs.write.parquet(os.path.join(d, "documents.parquet"))

    out = q129_curation_pipeline(spark, d).collect()
    kept = sum(r.n_docs for r in out)
    # benchmark holdout (~1/97) always drops; planted dup groups keep one
    assert 0 < kept < 20_000
    assert {r.split for r in out} <= {"train", "val", "test"}


def test_nvs_compaction_4m_writes(spark):
    """q135's compaction aggregate at ~400x the sf0.01 log: 4M writes
    over 50k keys (80 versions each, deterministic tombstones). The
    max_by shape must reconcile exactly with closed-form expectations —
    no per-key history materialization, no window sort."""
    n, keys = 4_000_000, 50_000
    log = spark.range(n).select(
        (F.col("id") % keys).alias("key"),
        F.col("id").alias("seq"),
        # tombstone every 7th write; the LAST write of key k has
        # seq = k + keys*79 -> tombstoned iff that seq % 7 == 0
        (F.col("id") % 7 == 0).alias("tombstone"),
        (F.lit(44) + (F.col("id") % 100)).alias("item_bytes"),
    )
    last_tomb = F.max_by("tombstone", "seq")
    last_bytes = F.when(last_tomb, F.lit(0)).otherwise(
        F.max_by("item_bytes", "seq")
    )
    out = log.groupBy("key").agg(
        F.count("*").alias("n_writes"),
        (~last_tomb).alias("live"),
        last_bytes.alias("live_bytes"),
        (F.sum("item_bytes") - last_bytes).alias("reclaimed"),
    )
    stats = out.agg(
        F.count("*").alias("n_keys"),
        F.sum("n_writes").alias("total_writes"),
        F.sum(F.when(F.col("live"), 0).otherwise(1)).alias("dead_keys"),
        F.sum(F.col("live_bytes") + F.col("reclaimed")).alias("bytes"),
    ).first()
    assert stats["n_keys"] == keys
    assert stats["total_writes"] == n
    # closed form: key k dead iff (k + 50_000*79) % 7 == 0
    expect_dead = sum(1 for k in range(keys) if (k + keys * 79) % 7 == 0)
    assert stats["dead_keys"] == expect_dead
    # total bytes = sum over ids of 44 + id%100
    expect_bytes = 44 * n + sum(i % 100 for i in range(100)) * (n // 100)
    assert stats["bytes"] == expect_bytes
