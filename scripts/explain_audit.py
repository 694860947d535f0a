#!/usr/bin/env python3
"""Regenerate EXPLAIN.md: formatted physical plans of representative
queries with what-to-look-for annotations.

Usage: python3 scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hive_reflex_spark.session import get_spark

PICKS = {
    "q01_pricing_summary": (
        "Scan-side pushdown + partial/final hash aggregate — the fact scan "
        "reads 7 of 11 columns and both filter conjuncts reach parquet."
    ),
    "q03_top_revenue": (
        "Dimension broadcast (customer) + shuffle-hash fact join with the "
        "aggregate running ON the join's hash(l_orderkey) partitioning "
        "(no exchange between join and agg) + TakeOrderedAndProject for "
        "the global top-k. At cluster scale the runtime Bloom filter "
        "prunes the lineitem shuffle to the segment-surviving ~20%."
    ),
    "q31_sparse_matmul": (
        "Threshold-skip sparse matmul: the |v| >= 0.05 filters sit in the "
        "scans, so skipped MACs never enter the join."
    ),
    "q47_jaccard_pairs": (
        "Inverted-index pair generation: shingling is shuffle-free "
        "projection; ONE groupBy(shingle) builds df-capped posting lists "
        "and pairs expand in-array — no shingle self-join exchange."
    ),
    "q53_lsh_buckets": (
        "LSH bucketing: the P×D sign matrix is a broadcast constant "
        "(no md5 in the plan), one groupBy(vec) computes all 8 "
        "projections — no pairwise work anywhere."
    ),
    "q59a_asof_join": (
        "Union-then-window as-of: one exchange on user, one sort, a "
        "running last(order) window — no join operator at all, so no "
        "O(events × earlier-orders) intermediate at any scale."
    ),
    "q80_onnx_compile": (
        "Planner-scale compile chain from a parsed .onnx: broadcast "
        "pattern-match joins (fusion), per-model windows (islands + "
        "flash addresses) — model IR never shuffles data-scale rows."
    ),
    "q66_attention": (
        "Attention with ONE data exchange: the post-scan qid repartition "
        "satisfies scores/softmax/output clustering; K and V arrive by "
        "broadcast (plan-pinned in tests/test_plan_shapes.py)."
    ),
    "q87_decontaminate": (
        "Decontamination: the benchmark shingle table broadcasts, so the "
        "corpus side never shuffles for the join — only matched rows "
        "reach the per-doc rollup."
    ),
    "q89_sequence_pack": (
        "Sequence packing with ONE hash exchange: the pid partitioning "
        "feeds both the cumulative-sum window and the (pid, window) "
        "aggregate — packing parallelizes per ingest partition."
    ),
    "q92_bpe_merges": (
        "BPE training on the vocab table: the corpus collapses in one "
        "word-frequency groupBy; every merge iteration's 1-row winner "
        "re-enters as a broadcast scalar join — no driver collect, "
        "iteration cost independent of corpus size."
    ),
    "q94_neardup_filter": (
        "End-to-end near-dup filter: only the collision-sized sides (hot "
        "stop-shingles, q49's band internals) carry broadcast HINTS; the "
        "LSH candidate-pair table, the per-doc sizes table and the final "
        "drop set join with NO hint — at 100 TB all three are "
        "corpus-scale and a forced broadcast would OOM (AQE may still "
        "broadcast them at toy SF); the sizes joins are shuffle-HASH "
        "hinted (uniform doc_id keys, no sort-merge sorts). "
        "Verification touches only candidate docs' shingles — no "
        "all-pairs anywhere."
    ),
    "q196_abc_classification": (
        "Pareto/ABC without a global window: the cumulative mass runs "
        "through the bucketed two-pass prefix — every Window partitions "
        "by the range bucket, the grand total is a 1-row broadcast; the "
        "only SinglePartition exchange is that 1-row aggregate."
    ),
    "q215_stop_phrases": (
        "DF-cap audit: the top-20 is TakeOrderedAndProject (per-partition "
        "heaps) BEFORE the ranking window, so the window input is 20 "
        "rows, never the full shingle vocabulary."
    ),
    "q218_histogram_quantiles": (
        "Mergeable histogram quantiles: binning is integer arithmetic "
        "against broadcast 1-row bounds, the histogram is one "
        "partial/final hash aggregate, and the quantile pick is a "
        "64-rows-per-group window — no global sort at any scale."
    ),
    "q220_zonemap_pruning": (
        "Zone-map audit: two hash aggregates build the per-layout maps; "
        "the 28 quarterly predicates replay as a broadcast nested-loop "
        "against the MAPS (|rows|/4096 entries), never the data."
    ),
    "q221_priority_sample": (
        "Priority sampling: stateless hash/priority projection, then "
        "TakeOrderedAndProject for the top-(k+1) — the only reduction; "
        "tau re-enters as a 1-row broadcast."
    ),
    "q102_pq_encode": (
        "Product quantization: every corpus join is a BroadcastHashJoin "
        "against the k x d codebook (seed, mean-update, re-assign) — the "
        "corpus shuffles only on (vec_id, sub); no sort-merge joins."
    ),
    "q103_repeated_spans": (
        "Repeated-span dedup: one partition-local Generate explodes the "
        "stride windows; the only exchanges are hash-keyed on the uniform "
        "md5 span hash — no cartesian pair expansion."
    ),
    "q109_transformer_block": (
        "Full pre-norm transformer block: both LayerNorms, the softmax "
        "windows and the residual joins all cluster on the token key; "
        "K/V and the FFN weight arrive by broadcast."
    ),
    "q66b_multihead_attention": (
        "Multi-head attention: the head axis is a free grouping key on "
        "the SAME token partitioning — one exchange, no per-head "
        "shuffle."
    ),
    "q107_layernorm": (
        "LayerNorm: the mean window, variance window and affine output "
        "all cluster on vec_id, so Catalyst chains three Window ops "
        "behind ONE exchange (pinned in tests/test_nn.py)."
    ),
    "q68a_lstm_unrolled": (
        "Fixed-point LSTM: ONE exchange on user_id feeds the "
        "FlatMapGroupsInPandas recurrence — sequences recur "
        "independently per key; weights ride in the task closure."
    ),
    "q108_adaptive_cascade": (
        "Adaptive cascade threshold: the hourly exit counts are a "
        "distributed partial/final aggregate; only the O(hours) factor "
        "recurrence is sequential, one control loop per event_type."
    ),
    "q65a_resize_pool": (
        "Multimodal resize: the byte pooling runs in MapInPandas directly "
        "on the scan partitioning — no exchange before the Python stage, "
        "Arrow-batched, bounded fan-out."
    ),
    "q100_chunk_udtf": (
        "UDTF chunking: the registered Python table function appears as a "
        "Generate over the scan (LATERAL) — per-row generation without a "
        "join operator; the extensibility tier, not the codegen hot path."
    ),
    "q110_bm25_topk": (
        "BM25 retrieval: df/idf and the avgdl scalar are broadcast model "
        "tables joined onto the filtered token stream; the global top-k "
        "is TakeOrderedAndProject — no full sort, no index materialized."
    ),
    "q113_shard_manifest": (
        "Shard manifest: ONE hash exchange on the md5-derived shard key "
        "feeds both the sequence and running-token windows — each shard "
        "sorts only its own slice; there is no global sort anywhere."
    ),
    "q115_cdc_chunks": (
        "Content-defined chunking: boundary flags and chunk ids are "
        "windows over the doc partition (partition-local after one "
        "exchange on doc_id); the shared-chunk rollup hashes on the "
        "uniform md5 chunk hash — no hot keys, top-k via "
        "TakeOrderedAndProject."
    ),
    "q129_curation_pipeline": (
        "End-to-end curation pipeline in ONE plan: every corpus-derived "
        "drop set (quality rejects, near-dup drops, contamination hits) "
        "joins WITHOUT a broadcast hint — on real web corpora the "
        "near-dup set alone is 30-50% of documents; AQE broadcasts at "
        "runtime only when a set is genuinely small. The corpus streams "
        "once into the split rollup — no materialized intermediate "
        "passes."
    ),
    "q66d_attention_blocked": (
        "The blocked-attention fast path: scan -> ONE MapInPandas node "
        "-> done. Zero exchanges — scores, softmax and context for a "
        "query row never leave its Arrow batch; K/V rides a broadcast "
        "variable (no join). Contrast with q66c's one qid-keyed "
        "exchange: both verify against the same oracle, this one is "
        "0.03x DuckDB at 4096x512 (BASELINE.md r7)."
    ),
    "q67b_conv2d_blocked": (
        "Blocked conv: scan -> ONE img_id exchange -> "
        "FlatMapGroupsInPandas. The 9-tap arithmetic runs as vectorized "
        "slices inside the batch instead of q67's 9x im2col row "
        "explosion; at corpus scale the exchange is the per-image "
        "co-location the multimodal decode tier already pays. 0.78x "
        "DuckDB at 16x1024x64 with exact checksum parity (BASELINE.md "
        "r7)."
    ),
    "q49a_lsh_candidates_star": (
        "Star-topology LSH candidates: ONE hash partitioning on "
        "(band, band_sig) serves both the hub aggregate and the hub "
        "join (co-partitioned, no second exchange), then one aggregate "
        "on the output pair. Edge stream linear in corpus size — this "
        "is q78's production feed; q49's all-pairs form remains for "
        "pair-level Jaccard verification only."
    ),
    "q165_market_share": (
        "TPC-H Q8 analog: 8-way join where only nation×2/region "
        "broadcast — part is type-filtered but corpus-proportional, "
        "customer/supplier/orders fact-scale, all left to AQE. Market "
        "share = ONE window over the pre-aggregated (year, nation) rows, "
        "so the second pass moves ~175 rows, not the joined fact "
        "stream."
    ),
    "q173_hybrid_rerank": (
        "Two-stage retrieval: BM25's inverted-index top-K is the only "
        "corpus-scale work; the rerank stage touches K candidate rows "
        "joined against a broadcast 64-row query centroid. Look for the "
        "candidate set riding as BroadcastExchange into the coordinate "
        "join — the corpus embedding table never shuffles."
    ),
    "q176_zorder_clustering": (
        "Z-order key is pure shift/mask column arithmetic inside "
        "whole-stage codegen — no UDF, no join; one hash aggregate "
        "produces the per-bucket rectangle proof."
    ),
    "q178_multiprobe_lsh": (
        "Multi-probe ANN: the queries x 9 probe table broadcasts; the "
        "bucket index is touched by ONE equi-join — candidates multiply "
        "~9x, shuffle volume stays O(collisions)."
    ),
    "q159_buffer_allocation": (
        "Aggregate-then-replay for the memory planner: liveness is one "
        "grouped min/max over events; the inherently sequential "
        "first-fit scan runs in an Arrow batch per model over O(tensors) "
        "rows while models parallelize — the q136 discipline applied to "
        "list-valued allocator state."
    ),
    "q135_nvs_compaction": (
        "Log compaction as ONE hash aggregate: max_by carries the "
        "latest-record candidate through map-side partial aggregation, "
        "so the shuffle moves one candidate per (partition, key) — not "
        "the key's history. No window, no sort: the shape that survives "
        "a 100-TB CDC log."
    ),
    "q136_dvfs_governor": (
        "Aggregate-then-replay: the event-scale work is one grouped "
        "count to (device, hour); the hysteresis recurrence runs in an "
        "Arrow batch per device over O(hours) rows. Look for the single "
        "HashAggregate feeding FlatMapGroupsInPandas."
    ),
    "q142_salted_join": (
        "The explicit hot-key tool: the bounded dim replicates 8x as a "
        "broadcast (BroadcastNestedLoopJoin against the 8-row salt "
        "table, then BroadcastHashJoin on (key, salt)) while the fact "
        "side only gains a salt projection — no extra fact shuffle; "
        "the hot key's rows land on 8 tasks instead of 1."
    ),
    "q146_batchnorm_fold": (
        "Compile-time BN fold: one grouped aggregate reduces the "
        "weights to per-channel moments, then the fold is a broadcast "
        "join + elementwise rescale — the weight stream itself never "
        "shuffles."
    ),
    "q62_streaming_hourly": "(streaming — plan shown for the post-sink projection)",
    "q30a_gram_matmul_array": (
        "Gram matmul scale form: BroadcastNestedLoopJoin pair stream + "
        "zip_with fold — NO exchange keyed on the 64-value contraction "
        "index anywhere in the plan."
    ),
    "q30b_gram_matmul_numpy": (
        "Dense contraction fast path: one ArrowEvalPython (mapInPandas) "
        "over the stream side, broadcast factor matrix — the 0.19x-DuckDB "
        "plan; no join, no wide shuffle, output aggregation only."
    ),
    "q66c_attention_scaled": (
        "q66's single-exchange attention at 256x64: broadcast KV joins, "
        "one qid-keyed exchange serving the score aggregate, both softmax "
        "windows, and the output reduction."
    ),
    "q246_interval_bucket_join": (
        "Range join the scalable way: both interval sets explode into "
        "hour buckets, the windows side broadcasts, and the exact overlap "
        "predicate re-checks map-side — no BroadcastNestedLoopJoin theta "
        "join anywhere in the plan."
    ),
    "q247_name_linkage": (
        "Blocked entity resolution: the pair source is two equi-joins on "
        "name tokens (block-capped) over ONE localCheckpointed entity "
        "table (r12), levenshtein evaluates only on candidate rows after "
        "the distinct — never an all-pairs product."
    ),
    "q248_knn_graph_triangles": (
        "Triangle counting on the mutual-3NN graph: degree <= k bounds "
        "every wedge expansion; look for plain shuffled hash joins on "
        "vertex ids and the single localCheckpoint reuse of the edge set."
    ),
    "q68c_lstm_blocked": (
        "Batched recurrence: ONE salt-keyed exchange feeds "
        "FlatMapGroupsInPandas; inside, every group advances all its "
        "sequences one step per numpy int64 op — 5.4x the per-key tier, "
        "bit-identical trajectory."
    ),
    "q255_disjunctive_revenue": (
        "OR-of-conjunctions: the mixed disjunction can't push whole, but "
        "the inferred per-side envelopes do — quantity range on the "
        "lineitem scan, brand/size residual on the part scan."
    ),
    "q257_family_sharding": (
        "Family-consistent placement: fingerprint reduce, constant-width "
        "shard fan-out on the FAMILY table, then one hash join back to "
        "docs on the fingerprint key the reduce already partitioned."
    ),
    "q258_prefix_filter_join": (
        "PPJoin: the candidate join reads ONLY the prefix projection "
        "(rarest floor(n/2)+1 shingles per set, localCheckpointed) with "
        "length+positional predicates inline in the join condition; the "
        "exact-Jaccard verify legs are candidate-restricted and the "
        "tail is join-free — |doc| and family counts ride the pairs as "
        "functionally-dependent group keys (r12)."
    ),
    "q259_rbo_rank_stability": (
        "RBO: two windows per source partition, a depth fan-out bounded "
        "at D=20 per surviving doc, integer-unit geometric terms summed "
        "in one hash aggregate — order-independent despite the float "
        "curve."
    ),
    "q260_lsh_banding_planner": (
        "Banding planner: q47's verified-pair stream joined against a "
        "4-row broadcast config table; everything after the pair source "
        "is a 4-group aggregate."
    ),
    "q261_mmr_rerank": (
        "MMR: distributed exact cosine aggregates feed a bounded "
        "candidate-pair sim matrix; ONE FlatMapGroupsInPandas per query "
        "runs the sequential greedy over its 12x12 block."
    ),
    "q262_coverage_selection": (
        "Max-coverage: candidate selection is a reduce + top-N window; "
        "the greedy replay input is candidates-only shingle rows through "
        "a single constant-key FlatMapGroupsInPandas."
    ),
    "q263_containment_pairs": (
        "Containment: q47's capped posting lists expand pairs in-array; "
        "direction is a unionAll projection — no second pair join; the "
        "size joins are shuffle-hash on doc id."
    ),
    "q265_hll_sketch_rollup": (
        "Sketch-cube merge: ONE corpus-scale grouped MAX builds the hour "
        "registers; the day grain is a grouped MAX over the sketch rows "
        "only (no second events scan on the sketch side); the exact-audit "
        "branch carries n_hours on its own aggregate, and the estimate "
        "joins back as a broadcast."
    ),
    "q266_tput_topk_bounds": (
        "TPUT bounds: the only corpus-wide exchange is the (bucket, word) "
        "count; the local-top window partitions by the 32-node bucket key; "
        "taus and the shipped locals are broadcast into the candidate "
        "grid — bounds math runs on at most P*m rows."
    ),
    "q267_bleu_candidate_score": (
        "BLEU on star candidates: bucket hubs reuse the q49 band "
        "partitioning (co-partitioned aggregate + join); gram tables are "
        "scan-side array transforms + one grouped count; clipped "
        "intersections touch candidate docs' gram rows only."
    ),
    "q268_kmv_set_sketch": (
        "KMV set sketch: the per-day k-smallest plans as WindowGroupLimit "
        "(partial top-k per partition, merged at the shuffle — the bounded "
        "sketch heap); pair membership is an exploded (pair, day) table "
        "EQUI-broadcast into both the sketch join and the exact audit — "
        "no OR-condition nested loop anywhere."
    ),
    "q269_semantic_dedup": (
        "SemDeDup: centroids broadcast into the assignment join (k x d "
        "doubles); the pairwise stage equi-joins on (cid, dim) so each "
        "cluster's pairs co-locate — n^2/k work, never a cross-cluster "
        "cartesian; norms/dots are exact integer-unit sums in codegen."
    ),
    "q270_fuzzy_decontaminate": (
        "Graded decontamination: the benchmark shingle set broadcasts; "
        "the corpus side is one scan-side shingle transform + a grouped "
        "count carrying both the hit numerator and the per-doc "
        "denominator on the same aggregate."
    ),
    "q271_token_entropy": (
        "Token entropy: two grouped aggregates on one parquet scan — no "
        "join, no window; the c*ln(c) terms freeze to integer 1e-9 units "
        "inside the partial aggregate, so the corpus-scale reduction is "
        "order-independent map-side combine."
    ),
    "q272_winnowing_fingerprint": (
        "Winnowing: doc_id repartition spreads the CPU-bound md5+window "
        "selection, which then runs entirely as array expressions in one "
        "projection (no window operator, no gram self-join); the explode "
        "is OUTER so Catalyst cannot push an inferred size>0 constraint "
        "into the scan with the HOF chain inlined (a measured 350 s "
        "cubic blowup); fingerprint rollups run on the slim persisted "
        "(doc, pos, hash) stream."
    ),
    "q273_lsh_recall_curve": (
        "LSH recall audit: truth pairs from the capped posting-list "
        "expansion (O(collisions)), candidates from the band equi-join, "
        "audit join pair-key to pair-key — all collision-sized; theory "
        "column is a constant CASE (no cross-engine pow)."
    ),
    "q274_length_bucket_batching": (
        "Padding-waste audit: two deterministic global ranks (md5 order "
        "vs length order) feed ONE unioned grouped aggregate; everything "
        "after the rank is integer arithmetic on batch rows."
    ),
    "q275_isotonic_calibration": (
        "PAVA relationally: the corpus reduces to 10 decile rows in one "
        "aggregate; the minimax fit is an 11-row broadcast triple join — "
        "dimension cost, no sequential pool-adjacent loop."
    ),
    "q276_jl_projection": (
        "JL projection: dims x 16 sign constants broadcast into one "
        "grouped exact-sum join (linear scan-side); the distortion audit "
        "is the fenced 128-vector pair sample by definition."
    ),
    "q277_rolling_distinct_kmv": (
        "Rolling distinct from sketches: the (day, member) calendar "
        "broadcasts into the shared day-sketch table; each output day is "
        "a k-smallest over <= 7k pooled sketch rows (WindowGroupLimit), "
        "never a fact-table rescan per frame."
    ),
    "q278_phash_hamming_pairs": (
        "Perceptual near-dup banding: exact-equal signatures collapse to "
        "min-doc families BEFORE the band self-join (quadratic in bucket "
        "size otherwise on duplicate-dense corpora); verification joins "
        "touch candidate families' 16-row signatures only."
    ),
    "q280_roc_auc": (
        "ROC/AUC: ONE event-scale pass (rank + ntile share the scan), "
        "then 10-row cumulative windows; the AUC witness auc2num is an "
        "exact-integer aggregate broadcast onto the curve points. "
        "Production shape for the global rank: per-shard rank + offset "
        "merge, the q113 manifest pattern."
    ),
    "q281_bh_fdr": (
        "BH-FDR: events reduce to |types| x |days| in one grouped "
        "aggregate; the 860-row exact binomial tail table broadcasts "
        "from the driver; every comparison after that is integer "
        "arithmetic on a |types|-row frame."
    ),
    "q282_chi2_independence": (
        "Chi-squared: one grouped count at event scale; row/column "
        "margins broadcast back onto |types| x 7 cells; contributions "
        "freeze to 1e-6 integer units before the order-independent "
        "total."
    ),
    "q283_exact_quantile": (
        "Two-pass exact selection: pass 1 is a partial+final hash "
        "aggregate to ~160 histogram rows (bounded driver state); pass "
        "2 scans ONLY the target buckets via a pushed-down IN filter "
        "and ranks within buckets — no global sort at any scale."
    ),
    "q284_good_turing": (
        "Good-Turing: trigram construction is a partition-local array "
        "transform (explode_outer — the q272 constraint-inlining "
        "fence); two further shuffles are on already-reduced keys "
        "(gram counts, then the tiny r histogram)."
    ),
    "q285_hyperball": (
        "HyperBall: per-node register state (|V| x <=256 ints) "
        "max-merges along edges, one hash join + grouped MAX per "
        "round, localCheckpoint between rounds to truncate lineage — "
        "the neighborhood function without per-source BFS."
    ),
    "q286_kendall_tau": (
        "Kendall tau-b: the event-scale work is ONE grouped aggregate "
        "to daily cents; the pairwise classification is days^2 per "
        "type pair — calendar-bounded, so the self-join stays "
        "dimension-scale at any SF."
    ),
    "q287_rrf_fusion": (
        "RRF: everything after the shared q110/q173 candidate stage "
        "is a K-row window — three ROW_NUMBERs and an integer-unit "
        "sum; no second corpus pass for the fusion."
    ),
    "q288_gbdt_split": (
        "Histogram split finder: one event-scale ntile pass reduces "
        "to a 64-row bin table; all 63 candidate splits score from "
        "cumulative windows over it — per-split partition "
        "materialization never happens."
    ),
    "q289_permutation_test": (
        "Permutation test: events reduce once to |types| x |days|; "
        "the B=200 relabelings expand a calendar-bounded pool "
        "partition-locally (explode of a sequence, no corpus join) "
        "and each permutation is a 60-row window partition."
    ),
    "q290_count_sketch": (
        "CountSketch: events reduce to per-user counts once; the x4 "
        "row expansion happens on the USER table; the 64-cell signed "
        "grid is one mergeable aggregate that broadcasts back onto "
        "the top-10 report."
    ),
    "q291_brier_decomposition": (
        "Brier decomposition: one event-scale ntile + one grouped "
        "aggregate to 10 bin rows; components are arithmetic against "
        "a broadcast 1-row bounds/base-rate table."
    ),
    "q298_spearman": (
        "Spearman: the shared daily-cents reduction, per-pair ranks "
        "partitioned by the type pair (calendar-bounded frames), one "
        "exact-moment reduction — no pairwise day join."
    ),
    "q299_quantile_order_ci": (
        "Quantile CI brackets: one histogram pass + ONE few-bucket "
        "rescan serves all 12 order statistics (shared "
        "two_pass_rank_values) — never a global sort."
    ),
    "q295_auc_delong": (
        "DeLong AUC CI: three ranks share one event scan (combined + "
        "per-class), then a 1-row frozen-units reduction — the "
        "pairwise-defined variance without pairwise work."
    ),
    "q297_cluster_label_nmi": (
        "Cluster-label NMI: assignment reuses the shared array-fold "
        "broadcast join (ivf_own_arrays, vec_id re-spread); all "
        "entropy terms are |clusters| x |labels| arithmetic."
    ),
    "q293_cuped_adjustment": (
        "CUPED: one event-scale grouped aggregate to per-user (X, Y) "
        "rows, then a 1-row exact-moment reduction — the q128/q123 "
        "moment pattern applied to experimentation."
    ),
    "q294_simplified_silhouette": (
        "Simplified silhouette: corpus x centroids broadcast join in "
        "the array-fold form (pair rows, not coordinate rows) with a "
        "vec_id repartition so the CPU-bound fold spans the cluster "
        "(2-partition parquet measured 263 s vs 24 s at sf1)."
    ),
    "q292_source_divergence": (
        "Source divergence: the corpus reduces ONCE to |sources| x "
        "|vocab| counts; the pair expansion joins the tiny smoothed "
        "LM table to itself on the word key — dimension-scale, no "
        "corpus rescan."
    ),
    "q246a_multires_interval_join": (
        "Multi-res interval join: the interval side emits buckets at "
        "its own length tier (hour/day — the 2-day tail emits 3 rows, "
        "not 49), the 20-row window side broadcasts with all tiers "
        "expanded; one (tier, bucket) equi-join, exact re-check "
        "map-side, no theta join anywhere."
    ),
    "q246b_salted_interval_join": (
        "Salted interval join: q246a's decomposition as a SHUFFLE "
        "hash join for the can't-broadcast case — interval rows salt "
        "on hash(event_id) mod 8, the probe side replicates per salt, "
        "the join key is (tier, bucket, salt) so the hot day-tier "
        "bucket spreads across 8 tasks; plan-pinned ShuffledHashJoin "
        "with zero broadcast on the match path."
    ),
    "q160b_kafka_log_transport": (
        "Commit-log transport: produce is one key-hash shuffle + a "
        "per-partition offset window; consume reads the partition= "
        "hive layout (pruned scans) and the decode rollup runs the "
        "same partial/final hash agg as q160 — the log adds one write "
        "and one columnar read, never a second data-scale exchange."
    ),
}


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("explain-audit")
    import __spark_entry__ as e

    qs = e.queries()
    out = io.StringIO()
    out.write("# EXPLAIN — physical plans of representative queries\n\n")
    out.write(
        "Generated by `scripts/explain_audit.py` at sf0.001 (plan shape is\n"
        "scale-invariant; AQE re-plans exchanges at runtime). What to look\n"
        "for is annotated per query; `tests/test_plan_shapes.py` pins these\n"
        "properties so regressions fail CI.\n"
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name, note in PICKS.items():
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        out.write(f"\n## {name}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "EXPLAIN.md"), "w") as f:
        f.write(out.getvalue())
    print("wrote EXPLAIN.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
