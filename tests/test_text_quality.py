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
        # round-8 rotation: the registrations new this round get their
        # first driver rows, and every query whose code changed this
        # round is re-judged; the remaining slots hold the stalest
        # r01/r02 hash-greens (scripts/rotate_window.py) — the listed
        # names that overflow the 50-slot window keep their standing
        # r02 evidence.
        "q299_quantile_order_ci",       # new: quantile CI brackets
        "q298_spearman",                # new: rank correlation
        "q295_auc_delong",              # new: AUC with DeLong CI
        "q296_mcnemar_filters",         # new: paired filter test
        "q297_cluster_label_nmi",       # new: clustering NMI/purity
        "q293_cuped_adjustment",        # new: CUPED adjusted lift
        "q294_simplified_silhouette",   # new: clustering quality
        "q290a_stream_count_sketch",    # new: streaming signed grid
        "q290_count_sketch",            # new: signed frequency sketch
        "q291_brier_decomposition",     # new: Murphy decomposition
        "q292_source_divergence",       # new: source KL/JS matrix
        "q289_permutation_test",        # new: exact permutation test
        "q288_gbdt_split",              # new: histogram split finder
        "q287_rrf_fusion",              # new: reciprocal-rank fusion
        "q285_hyperball",               # new: HLL neighborhood function
        "q283_exact_quantile",          # new: two-pass exact selection
        "q281_bh_fdr",                  # new: exact sign tests + BH
        "q280_roc_auc",                 # new: ROC curve + rank AUC
        "q282_chi2_independence",       # new: frozen-units chi-squared
        "q284_good_turing",             # new: trigram missing mass
        "q286_kendall_tau",             # new: tau-b rank correlation
        "q272_winnowing_fingerprint",   # new: MOSS winnowing fingerprints
        "q273_lsh_recall_curve",        # new: measured LSH S-curve
        "q274_length_bucket_batching",  # new: padding-waste regimes
        "q275_isotonic_calibration",    # new: PAVA calibration curve
        "q276_jl_projection",           # new: JL projection + audit
        "q278_phash_hamming_pairs",     # new: banded perceptual near-dup
        "q268_kmv_set_sketch",          # new: KMV set-operation sketch
        "q268a_stream_kmv",             # new: streaming bottom-k state
        "q277_rolling_distinct_kmv",    # new: sliding sketch-merge distinct
        "q279_mann_whitney",            # new: rank-sum A/B readout
        "q269_semantic_dedup",          # new: SemDeDup cluster dedup
        "q270_fuzzy_decontaminate",     # new: contamination-ratio rule
        "q271_token_entropy",           # new: token-evenness filter
        "q160a_slcan_transport",        # new: S8 real-transport wire codec
        "q250a_stream_novelty",         # new: ingest-side novelty
        "q256a_siegel_repeated_median", # new: 50%-breakdown trend
        "q265_hll_sketch_rollup",       # new: sketch-cube rollup merge
        "q265a_stream_hll_registers",   # new: streaming HLL registers
        "q266_tput_topk_bounds",        # new: deterministic-bounds top-k
        "q267_bleu_candidate_score",    # new: clipped n-gram precision
        "q03_top_revenue",            # code changed: join-then-agg plan
        "q247_name_linkage",          # code changed: per-position cap oracle
        "q261_mmr_rerank",            # code changed: single MMR constant
        "q30b_gram_matmul_numpy",     # code changed: round_half_away
        "q66d_attention_blocked",     # code changed: round_half_away
        "q67b_conv2d_blocked",        # code changed: round_half_away
        "q49a_lsh_candidates_star",   # code changed: shared star_candidates
        "q263_containment_pairs",     # code changed: shared postings/sizes
        # (q47 and q118 overflow past slot 50 — both transitively
        # re-judged via in-window embedders: q47 by q285/q267/q273,
        # q118's register construction by q265/q265a/q285.)
        "q173_hybrid_rerank",         # code changed: hybrid_scored helper
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
