"""Operator modules. Importing this package registers every query/oracle
pair into :mod:`hive_reflex_spark.registry`."""

from hive_reflex_spark.operators import (  # noqa: F401
    analytics,
    artifacts,
    codec,
    compiler,
    dedup,
    graph,
    nn,
    pipeline,
    power,
    relational,
    retrieval,
    sampling,
    similarity,
    storage,
    tensor,
    text,
    timeseries,
    training,
)
from hive_reflex_spark.sources import multimodal  # noqa: F401
from hive_reflex_spark.streaming import ops as streaming_ops  # noqa: F401

from hive_reflex_spark import registry as _registry

# The driver verifies only the FIRST 50 registered queries, so this list IS
# the judged correctness surface. Round-9 window (the r8 verdict's #2:
# spend the window on the staleness backlog, freeze new registrations):
# 7 changed-code slots (q273's decimal->DOUBLE fix; the ADVICE guards on
# q293/q295; the two_pass_histogram floor-div shared by q283/q299; the
# _CS_BUCKETS guard shared by q290/q290a) + the 43 stalest r01/r02
# hash-greens oldest-first (scripts/rotate_window.py). q68/q28 stay out:
# rows-only by design with standing rows evidence and oracled twins
# (q68a/q118). The ~19 remaining r02 greens (q54b/q88/q21-q26/q29/q90/
# q51-q58 tier) clear in r10. Every query not listed keeps its standing
# hash-green driver row and original registration order after this block.
_registry.finalize_order([
    # code changed this round — must be re-judged
    "q273_lsh_recall_curve",      # r8's one red: DECIMAL->DOUBLE + exact-unit recall
    "q293_cuped_adjustment",      # try_divide/NULLIF variance guards (ADVICE)
    "q295_auc_delong",            # (p-1)/(neg-1) guards (ADVICE)
    "q283_exact_quantile",        # sign-safe floor-div bucket key (shared helper)
    "q299_quantile_order_ci",     # same two-pass helper
    "q290_count_sketch",          # _CS_BUCKETS assert -> raise (shared module)
    "q290a_stream_count_sketch",  # same constant
    # stalest hash-greens: last driver-checked r01
    "q72_accuracy_eval",
    "q73_distillation_kl",
    "q74_log_stats",
    "q75_cascade_stats",
    "q70_int4_pack",
    "q71_artifact_checksums",
    "q59_cost_partition_islands",
    "q60_flash_layout",
    "q61_liveness",
    "q43_quality_score",
    "q44_lang_id",
    "q45_fingerprint",
    "q42a_bpe_token_count",
    "q50_simhash",
    "q79_power_rollup",
    "q02_filter_project",
    "q04_priority_semi_join",
    "q05_customers_without_orders",
    "q06_region_rollup",
    "q08_theta_join",
    # stalest hash-greens: last driver-checked r02
    "q65_multimodal_meta",
    "q81_codec_dispatch",
    "q82_lz4_roundtrip",
    "q80_onnx_compile",
    "q100_chunk_udtf",
    "q85_hash_split",
    "q86_stratified_sample",
    "q87_decontaminate",
    "q89_sequence_pack",
    "q51a_embedding_neardup",
    "q09_status_priority_cube",
    "q10_topk_per_nation",
    "q11_running_order_totals",
    "q12_global_topk",
    "q13_set_ops",
    "q15_price_percentiles",
    "q16_word_explode",
    "q17_monthly_orders",
    "q18_above_avg_orders",
    "q19_gaps_islands",
    "q20_sessionize",
    "q51_cosine_topk",
    "q53_lsh_buckets",
])

__all__ = [
    "analytics",
    "codec",
    "compiler",
    "dedup",
    "graph",
    "nn",
    "pipeline",
    "power",
    "relational",
    "retrieval",
    "sampling",
    "similarity",
    "storage",
    "streaming_ops",
    "tensor",
    "text",
    "timeseries",
    "training",
    "multimodal",
]
