"""Repetition-metric invariants (q91) on planted documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_reflex_spark.operators.text import q91_repetition_metrics


def _metrics_for(spark, texts):
    """Run the q91 plan over an in-memory documents table."""
    docs = spark.createDataFrame(
        [(i, t, "en", "unit", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import hive_reflex_spark.io as io

    orig = io.read_table
    try:
        io.read_table = lambda *_a, **_k: docs
        # the operator module imported read_table by name
        import hive_reflex_spark.operators.text as textmod

        orig_mod = textmod.read_table
        textmod.read_table = lambda *_a, **_k: docs
        try:
            return {
                r["doc_id"]: r
                for r in q91_repetition_metrics(spark, "unused").collect()
            }
        finally:
            textmod.read_table = orig_mod
    finally:
        io.read_table = orig


def test_repetition_extremes(spark):
    m = _metrics_for(
        spark,
        [
            "a a a a a a a a",  # pure repetition
            "one two three four five six seven eight",  # all distinct
            "x y x y x y x y",  # alternating: every bigram repeats
        ],
    )
    rep, uniq, alt = m[0], m[1], m[2]
    # pure repetition: 1 distinct of 8 tokens; the single bigram owns all mass
    assert rep["dup_token_frac"] == pytest.approx(1 - 1 / 8)
    assert rep["top_bigram_frac"] == pytest.approx(1.0)
    assert rep["dup_bigram_frac"] == pytest.approx(1.0)
    # all-distinct: zero duplicate tokens, no repeated bigram
    assert uniq["dup_token_frac"] == 0.0
    assert uniq["dup_bigram_frac"] == 0.0
    assert uniq["top_bigram_frac"] == pytest.approx(1 / 7)
    # alternation: 'x y' appears 4 of 7, 'y x' 3 of 7 — all bigrams repeat
    assert alt["top_bigram_frac"] == pytest.approx(4 / 7)
    assert alt["dup_bigram_frac"] == pytest.approx(1.0)


def test_repetition_bounds_on_corpus(spark, sf_smoke):
    rows = q91_repetition_metrics(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        for c in ("dup_token_frac", "top_bigram_frac", "dup_bigram_frac"):
            assert 0.0 <= r[c] <= 1.0, r
        # the most frequent bigram's mass is part of the duplicated mass
        if r["dup_bigram_frac"] > 0:
            assert r["top_bigram_frac"] <= r["dup_bigram_frac"] or (
                # unless the top bigram is itself unique (count 1)
                r["top_bigram_frac"]
                <= 1.0 / max(r["n_tokens"] - 1, 1) + 1e-9
            )


def test_bpe_merges_planted(spark):
    """Hand-checkable BPE: corpus {aab x3, ab x2}. Merge 1 must pick
    ('a b', count 5) over ('a a', 3); merge 2 picks ('a ab', 3); merge 3
    has no pairs left and emits no row."""
    import hive_reflex_spark.operators.text as textmod
    from pyspark.sql import functions as F2

    words = spark.createDataFrame(
        [("aab",)] * 3 + [("ab",)] * 2, "w string"
    ).select("w", F2.lit(0).alias("doc_id"), F2.lit(0).alias("pos"))
    orig = textmod.doc_words
    try:
        textmod.doc_words = lambda *_a, **_k: words
        rows = sorted(
            textmod.q92_bpe_merges(spark, "unused").collect(),
            key=lambda r: r["step"],
        )
    finally:
        textmod.doc_words = orig
    assert [tuple(r) for r in rows] == [
        (1, "a b", 5, 8),
        (2, "a ab", 3, 5),
    ]


def test_bpe_merges_monotone(spark, sf_smoke):
    """On the real corpus: each merge strictly shrinks the token stream,
    by exactly pair_count tokens (every application removes one token),
    and pair counts are non-increasing across steps."""
    from hive_reflex_spark.operators.text import q92_bpe_merges

    rows = sorted(
        q92_bpe_merges(spark, sf_smoke).collect(), key=lambda r: r["step"]
    )
    assert len(rows) == 3
    for a, b in zip(rows, rows[1:]):
        assert b["corpus_tokens_after"] < a["corpus_tokens_after"]
        assert b["pair_count"] <= a["pair_count"]
    for a, b in zip(rows, rows[1:]):
        assert a["corpus_tokens_after"] - b["corpus_tokens_after"] == (
            b["pair_count"]
        )


def test_perplexity_buckets_ordered(spark, sf_smoke):
    """Per source: ntile emits every bucket 1..3 with balanced counts
    (max spread 1) and mean NLL strictly ordered head < middle < tail."""
    from hive_reflex_spark.operators.text import q95_perplexity_filter

    rows = q95_perplexity_filter(spark, sf_smoke).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    assert by_src
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["bucket"])
        assert [r["bucket"] for r in rs] == [1, 2, 3], (src, rs)
        counts = [r["n_docs"] for r in rs]
        assert max(counts) - min(counts) <= 1, (src, counts)
        means = [r["mean_nll"] for r in rs]
        assert means == sorted(means), (src, means)
        for r in rs:
            assert r["min_nll"] <= r["mean_nll"] <= r["max_nll"]


def test_bpe_tokenize_conserves(spark, sf_smoke):
    """q98: subwords never exceed chars, never undercut chars/longest
    merged token, and the corpus-wide subword total equals q92's final
    corpus_tokens_after (same merge table, applied vs trained)."""
    from hive_reflex_spark.operators.text import (
        q92_bpe_merges,
        q98_bpe_tokenize,
    )

    rows = q98_bpe_tokenize(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 < r["total_subwords"] <= r["total_chars"], r
        assert 0 < r["subwords_per_char"] <= 1.0, r
    merges = sorted(
        q92_bpe_merges(spark, sf_smoke).collect(), key=lambda r: r["step"]
    )
    total_sub = sum(r["total_subwords"] for r in rows)
    assert total_sub == merges[-1]["corpus_tokens_after"]


def test_chunk_udtf_tail_and_overlap(spark):
    """Sliding chunks: width 32 / stride 16 — every start < n_words
    emits, tail chunk is partial, overlap region identical."""
    from hive_reflex_spark.operators.text import chunk_udtf

    text33 = " ".join(f"w{i}" for i in range(33))
    text16 = " ".join(f"w{i}" for i in range(16))
    spark.createDataFrame(
        [(1, text33), (2, text16), (3, "solo")], "doc_id long, text string"
    ).createOrReplaceTempView("chunk_edge_src")
    spark.udtf.register("chunk_edge", chunk_udtf())
    rows = spark.sql(
        """SELECT doc_id, c.chunk_idx, c.chunk_text, c.n_words
           FROM chunk_edge_src, LATERAL chunk_edge(text) c"""
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r
    # 33 words -> starts 0,16,32: sizes 32, 17, 1
    assert [by_doc[1][i].n_words for i in range(3)] == [32, 17, 1]
    # overlap: chunk1 starts at word 16, first word of overlap == w16
    assert by_doc[1][1].chunk_text.split(" ")[0] == "w16"
    assert by_doc[1][2].chunk_text == "w32"
    # 16 words -> one full-width-truncated chunk
    assert [by_doc[2][i].n_words for i in range(1)] == [16]
    assert len(by_doc[2]) == 1
    # single word -> one chunk of itself
    assert by_doc[3][0].chunk_text == "solo" and by_doc[3][0].n_words == 1


def test_registry_window_covers_new_families():
    """The driver checks the first 50 registered queries; pin that the
    curated window holds its members (rotation edits fail loudly here)."""
    import hive_reflex_spark.operators  # noqa: F401 — triggers registration
    from hive_reflex_spark.registry import QUERIES

    window = list(QUERIES)[:50]
    for must in (
        # round-13 rotation (r12 verdict #1): every changed-code slot
        # (corpus/chain materialization tiers, q47 length filter,
        # FIFO-tracked persists), the four named r12 restructures, and
        # the 17 stalest r04 fill rows — 35 of 50 rows >5 rounds stale
        # (quota met). q68/q28 stay out: rows-only by design with
        # oracled twins (q68a/q118).
        "q47_jaccard_pairs",
        "q273_lsh_recall_curve",
        "q258_prefix_filter_join",
        "q269_semantic_dedup",
        "q247_name_linkage",
        "q267_bleu_candidate_score",
        "q186_source_overlap",
        "q122_tfidf_doc_similarity",
        "q232_retrieval_metrics",
        "q261_mmr_rerank",
        "q54b_ivf_topk",
        "q102b_ivfpq_topk",
        "q228_ann_recall",
        "q237_join_cardinality",
        "q292_source_divergence",
        "q245_market_basket",
        "q81_codec_dispatch",
        "q278_phash_hamming_pairs",
        "q109_transformer_block",
        "q109c_llama_block",
        "q231_dup_graph_shape",
        "q244_dedup_pagerank",
        "q248_knn_graph_triangles",
        "q78_dedup_clusters",
        "q285_hyperball",
        "q83_qat_probe",
        "q84_distill_probe",
        "q103_repeated_spans",
        "q88_ivf_kmeans",
        "q94_neardup_filter",
        "q264_weighted_jaccard",
        "q236_zorder_layout",
        "q297_cluster_label_nmi",
        "q146_batchnorm_fold",
        "q130_flash_io_strategies",
        "q131_layer_profile",
        "q136_dvfs_governor",
        "q133_regional_revenue",
        "q134_small_quantity_revenue",
        "q140_rollup_grouping",
        "q142_salted_join",
        "q148_waiting_suppliers",
        "q149_dormant_customers",
        "q150_cheapest_supplier",
        "q151_analytic_functions",
        "q156_table_fingerprint",
        "q165_market_share",
        "q167_activity_reconciliation",
        "q135_nvs_compaction",
        "q168_bucketed_colocated_join",
    ):
        assert must in window, must


def test_grouped_udaf_matches_jvm_aggregates(spark):
    """The GROUPED_AGG pandas-UDAF tier (q141) must agree exactly with
    the JVM built-in aggregates — integer semantics make the custom
    tier bit-identical, not approximately equal."""
    from tests.conftest import SF_SMOKE

    from hive_reflex_spark.io import read_table
    from hive_reflex_spark.operators.text import q141_grouped_udaf

    got = {r["source"]: r for r in q141_grouped_udaf(spark, SF_SMOKE).collect()}
    docs = read_table(spark, SF_SMOKE, "documents")
    ref = {
        r["source"]: r
        for r in docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("sumsq_chars"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for s, r in ref.items():
        g = got[s]
        assert g["n_docs"] == r["n_docs"]
        assert g["total_chars"] == r["total_chars"]
        assert g["sumsq_chars"] == r["sumsq_chars"]
        assert (
            g["nsq_var"]
            == r["n_docs"] * r["sumsq_chars"] - r["total_chars"] ** 2
        )
