"""Unit tests for the round-5 primitives: the bucketed two-pass global
prefix (shared by the Pareto/Gini shapes) and the CAN wire encode/decode
inverse pair behind the device-interface round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_reflex_spark.operators.analytics import bucketed_ordered_prefix


def _golden_prefix(rows, descending):
    ordered = sorted(
        rows, key=lambda r: ((-r[1] if descending else r[1]), r[0])
    )
    out, acc = {}, 0
    for rn, (k, v) in enumerate(ordered, start=1):
        acc += v
        out[k] = (acc, rn)
    return out


def test_bucketed_prefix_matches_global_scan_asc(spark):
    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: (r["_cum"], r["_rn"])
        for r in bucketed_ordered_prefix(
            df, "v", "k", descending=False, n_buckets=16
        ).collect()
    }
    assert got == _golden_prefix(rows, descending=False)


def test_bucketed_prefix_matches_global_scan_desc_with_ties(spark):
    # heavy ties: only 7 distinct values across 300 keys — tie-break on k
    rows = [(i, i % 7) for i in range(300)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r["k"]: (r["_cum"], r["_rn"])
        for r in bucketed_ordered_prefix(
            df, "v", "k", descending=True, n_buckets=16
        ).collect()
    }
    assert got == _golden_prefix(rows, descending=True)


def test_bucketed_prefix_skewed_single_value(spark):
    # all rows share one value: one bucket holds everything (the
    # documented skew trade) but the result must still be exact
    rows = [(i, 5) for i in range(50)]
    df = spark.createDataFrame(rows, "k long, v long")
    res = bucketed_ordered_prefix(df, "v", "k", n_buckets=8).collect()
    assert sorted((r["k"], r["_rn"]) for r in res) == [
        (i, i + 1) for i in range(50)
    ]
    assert {r["_cum"] for r in res} == {5 * (i + 1) for i in range(50)}


def test_bucketed_prefix_empty_input(spark):
    df = spark.createDataFrame([], "k long, v long")
    assert bucketed_ordered_prefix(df, "v", "k").collect() == []


def test_can_encode_decode_inverse(spark):
    """encode(decode(frames)) must reproduce the command frames bit-for-
    bit — the property the q217 round-trip oracle rests on."""
    from hive_reflex_spark.streaming.ops import (
        CAN_CMD_ID,
        decode_can_frames,
        encode_can_frames,
        synthesize_can_frames,
    )

    ticks = spark.range(200).select(
        F.col("id").alias("value"),
        F.timestamp_micros(F.col("id") * 1000).alias("timestamp"),
    )
    frames = synthesize_can_frames(ticks)
    cmd = frames.filter(F.col("can_id") == CAN_CMD_ID)
    back = encode_can_frames(decode_can_frames(frames))
    orig = {
        (r["node_id"], r["ts"]): list(r["data"]) for r in cmd.collect()
    }
    got = {
        (r["node_id"], r["ts"]): list(r["data"]) for r in back.collect()
    }
    assert len(orig) == 175  # every 8th of 200 is bus noise
    assert got == orig
