"""Hypothesis property tests for the invariants the oracle harness
depends on: exact_sum order-independence, quantization round-trip bounds,
RLE reconstruction."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hive_reflex_spark.functions import exact_sum
from hive_reflex_spark.functions.tensor_fns import (
    dequantize,
    quantize_symmetric,
)

money = st.decimals(
    min_value=-99999, max_value=99999, places=2, allow_nan=False
).map(float)


@settings(max_examples=8, deadline=None)
@given(st.lists(money, min_size=1, max_size=50), st.integers(1, 16))
def test_exact_sum_is_partition_order_independent(spark, values, n_parts):
    """The determinism contract: exact_sum must give bit-identical results
    for ANY partitioning of the same rows."""
    df1 = spark.createDataFrame([(v,) for v in values], "x double").coalesce(1)
    df2 = spark.createDataFrame(
        [(v,) for v in reversed(values)], "x double"
    ).repartition(n_parts)
    a = df1.agg(exact_sum(F.col("x"), 2).alias("s")).first()["s"]
    b = df2.agg(exact_sum(F.col("x"), 2).alias("s")).first()["s"]
    assert a == b  # exact equality, not approx
    # reference value computed the way the contract defines it
    expected = sum(int(round(v * 100)) for v in values) / 100.0
    assert a == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=40,
    )
)
def test_quantize_roundtrip_error_bounded(spark, values):
    """|x − dequant(quant(x))| ≤ scale/2 for in-range values (the int8
    quantization error bound the A12 metrics assume)."""
    mx = max(abs(v) for v in values)
    if mx == 0:
        return
    scale = mx / 127.0
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    rows = df.select(
        "x",
        dequantize(
            quantize_symmetric(F.col("x"), F.lit(scale)), F.lit(scale)
        ).alias("dq"),
    ).collect()
    for r in rows:
        assert abs(r.x - r.dq) <= scale / 2 + 1e-12


def test_df_cache_and_repartition_preserve_results(spark, sf_smoke):
    """Bench mode (persisted base tables, re-spread partitioning) must be
    result-identical to the cold path — i.e. exact_sum really is
    order/partitioning-independent for every float that crosses an
    aggregate."""
    import __spark_entry__ as e
    from hive_reflex_spark import io as hio

    qs = e.queries()
    names = ["q01_pricing_summary", "q47_jaccard_pairs", "q53_lsh_buckets"]
    cold = {
        n: sorted(map(tuple, qs[n](spark, sf_smoke).collect())) for n in names
    }
    hio.enable_df_cache(table_partitions=4)
    try:
        warm = {
            n: sorted(map(tuple, qs[n](spark, sf_smoke).collect()))
            for n in names
        }
    finally:
        for df in hio._DF_CACHE.values():
            df.unpersist()
        hio._DF_CACHE = None
        hio._CACHE_TABLE_PARTITIONS = None
    assert cold == warm
