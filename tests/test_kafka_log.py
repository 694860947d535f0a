"""Kafka-shaped commit log (sources/kafka_log.py): the S8 bus on a
partitioned, offset-addressed, replayable transport.

The semantics under test are Kafka's contract, checked against ground
truth computed independently:

- keyed partitioning: every key lands in exactly one partition;
- per-partition offsets are dense from 0 and stay monotone across
  appends (high-water-mark continuation);
- replay: batch reads from per-partition start offsets return exactly
  the records at-or-above those offsets (unknown partitions from
  earliest);
- the streaming reader over the same directory yields the identical
  record set as the batch reader;
- end to end: SLCAN frames produced onto the log, consumed, parsed and
  decoded give the SAME per-node rollup as the direct (transport-free)
  decode path — a byte-level defect anywhere in produce/consume breaks
  the comparison.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMOKE


def _ticks(spark, n=256):
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id"))
        ).alias("ts"),
    )


def _wire(spark, n=256):
    """SLCAN wire lines with a producer key (the 11-bit id hex — a
    node's command stream keys to one value, Kafka-style)."""
    from hive_reflex_spark.streaming.ops import (
        slcan_encode_lines,
        synthesize_can_frames,
    )

    frames = synthesize_can_frames(
        _ticks(spark, n), value_col="event_id", ts_col="ts"
    )
    return (
        slcan_encode_lines(frames)
        .withColumn("t0", F.lit("2024-01-01").cast("timestamp"))
        .withColumn("k", F.substring("value", 2, 3))
    )


def _append(spark, log_dir, n=256, **kw):
    from hive_reflex_spark.sources.kafka_log import log_append

    log_append(
        _wire(spark, n),
        str(log_dir),
        "can",
        key_col="k",
        value_col="value",
        ts_col="t0",
        **kw,
    )


def test_keyed_partitioning_and_dense_offsets(spark, tmp_path):
    from hive_reflex_spark.sources.kafka_log import log_read

    _append(spark, tmp_path, n=256, n_partitions=4)
    recs = log_read(spark, str(tmp_path), "can").collect()
    assert len(recs) == 256
    # every key in exactly one partition
    key_parts: dict[bytes, set[int]] = {}
    by_part: dict[int, list[int]] = {}
    for r in recs:
        key_parts.setdefault(bytes(r.key), set()).add(r.partition)
        by_part.setdefault(r.partition, []).append(r.offset)
    assert all(len(ps) == 1 for ps in key_parts.values())
    assert len(by_part) > 1  # keys actually spread
    # offsets dense from 0 within each partition
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), p


def test_offsets_continue_across_appends(spark, tmp_path):
    from hive_reflex_spark.sources.kafka_log import log_read

    _append(spark, tmp_path, n=64, n_partitions=2)
    first = {
        (r.partition, r.offset)
        for r in log_read(spark, str(tmp_path), "can").collect()
    }
    _append(spark, tmp_path, n=64, n_partitions=2)
    both = log_read(spark, str(tmp_path), "can").collect()
    assert len(both) == 128
    by_part: dict[int, list[int]] = {}
    for r in both:
        by_part.setdefault(r.partition, []).append(r.offset)
    # still dense from 0 after the second append: the high-water mark
    # continued the sequence instead of restarting it
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), p
    assert first < {(r.partition, r.offset) for r in both}


def test_replay_from_committed_offsets(spark, tmp_path):
    from hive_reflex_spark.sources.kafka_log import log_read

    _append(spark, tmp_path, n=256, n_partitions=4)
    full = log_read(spark, str(tmp_path), "can").collect()
    parts = sorted({r.partition for r in full})
    commit = {parts[0]: 10, parts[1]: 0}  # resume points; rest earliest
    got = {
        (r.partition, r.offset)
        for r in log_read(
            spark, str(tmp_path), "can", start_offsets=commit
        ).collect()
    }
    want = {
        (r.partition, r.offset)
        for r in full
        if r.offset >= commit.get(r.partition, 0)
    }
    assert got == want
    # int form: one global start offset
    got_all = {
        (r.partition, r.offset)
        for r in log_read(
            spark, str(tmp_path), "can", start_offsets=5
        ).collect()
    }
    assert got_all == {(r.partition, r.offset) for r in full if r.offset >= 5}


def test_stream_reader_matches_batch(spark, tmp_path):
    from hive_reflex_spark.sources.kafka_log import (
        log_read,
        log_read_stream,
    )

    _append(spark, tmp_path, n=128, n_partitions=4)
    batch = {
        (r.partition, r.offset, bytes(r.value))
        for r in log_read(spark, str(tmp_path), "can").collect()
    }
    stream = log_read_stream(spark, str(tmp_path), "can")
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_log_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.partition, r.offset, bytes(r.value))
        for r in spark.sql("SELECT * FROM kafka_log_t").collect()
    }
    assert got == batch


def test_slcan_over_log_matches_direct_decode(spark, tmp_path):
    """End to end: produce SLCAN onto the log, consume+parse+decode, and
    the per-node rollup equals the transport-free decode of the same
    frames — only a byte-exact produce/consume round-trip matches."""
    from hive_reflex_spark.sources.kafka_log import log_read
    from hive_reflex_spark.streaming.ops import (
        decode_can_frames,
        parse_slcan_frames,
        synthesize_can_frames,
    )

    _append(spark, tmp_path, n=256, n_partitions=4)
    lines = log_read(spark, str(tmp_path), "can").select(
        F.decode("value", "UTF-8").alias("value"),
        F.col("ts").alias("ts0"),
    )
    via_log = (
        decode_can_frames(parse_slcan_frames(lines, ts_col="ts0"))
        .groupBy("node_id")
        .agg(
            F.count("*").alias("n_cmd"),
            F.sum(F.round(F.col("target_angle") * 100).cast("long"))
            .alias("sum_centideg"),
            F.sum(F.round(F.col("compliance") * 255).cast("long"))
            .alias("sum_comp"),
        )
    )
    direct = (
        decode_can_frames(
            synthesize_can_frames(
                _ticks(spark, 256), value_col="event_id", ts_col="ts"
            )
        )
        .groupBy("node_id")
        .agg(
            F.count("*").alias("n_cmd"),
            F.sum(F.round(F.col("target_angle") * 100).cast("long"))
            .alias("sum_centideg"),
            F.sum(F.round(F.col("compliance") * 255).cast("long"))
            .alias("sum_comp"),
        )
    )
    a = sorted(map(tuple, via_log.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b and len(a) > 0


def test_hwm_from_footer_stats_matches_full_scan(spark, tmp_path):
    """ADVICE r9: the high-water mark derives from parquet FOOTER
    statistics (metadata-only), never a cached side-structure — so it
    cannot go stale after a crashed append. The footer-derived map must
    equal a full row scan's max(offset)+1 per partition."""
    from pyspark.sql import functions as F2

    from hive_reflex_spark.sources.kafka_log import _read_hwm, _topic_dir

    _append(spark, tmp_path, n=64, n_partitions=2)
    _append(spark, tmp_path, n=64, n_partitions=2)
    tdir = _topic_dir(str(tmp_path), "can")
    from_footers = _read_hwm(tdir)
    assert sum(from_footers.values()) == 128
    from_scan = {
        int(r["partition"]): int(r["hwm"])
        for r in spark.read.parquet(tdir)
        .groupBy("partition")
        .agg((F2.max("offset") + 1).cast("long").alias("hwm"))
        .collect()
    }
    assert from_footers == from_scan
    # crash-simulation: an orphaned extra data file (append that died
    # before any bookkeeping) is STILL counted, because the data is the
    # source of truth — the third append continues densely above it
    _append(spark, tmp_path, n=64, n_partitions=2)
    from hive_reflex_spark.sources.kafka_log import log_read

    by_part: dict[int, list[int]] = {}
    for r in log_read(spark, str(tmp_path), "can").collect():
        by_part.setdefault(r.partition, []).append(r.offset)
    for p, offs in by_part.items():
        assert sorted(offs) == list(range(len(offs))), p


def test_q160b_log_produced_once_and_superseded_dirs_reaped(spark):
    """The q160b transport log is keyed by (fixture, produce-code)
    fingerprint and produced at most once per key: a repeat call reuses
    the same directory (no wipe — concurrent sweeps can never delete a
    directory a live plan is scanning), and a superseded sibling
    fingerprint older than an hour is reaped on the next call."""
    import glob
    import os
    import time

    from tests.conftest import SF_SMOKE

    import hive_reflex_spark.operators  # noqa: F401 — registers queries
    from hive_reflex_spark.registry import QUERIES

    q = QUERIES["q160b_kafka_log_transport"]
    import hashlib
    import shutil

    base = "/tmp/hrs_q160b_log_" + hashlib.md5(
        SF_SMOKE.encode()
    ).hexdigest()[:10]
    # start clean: a sibling from an earlier run with DIFFERENT code
    # (new fingerprint) legitimately survives the 1h reaper and would
    # flake the exactly-one-dir assertion below
    for leftover in glob.glob(base + "*"):
        if leftover.endswith(".lock"):
            # never unlink a lock file, even in test cleanup: a
            # concurrent sweep holding that flock would be split from
            # future lockers (fresh inode) — the module's own rule
            continue
        try:
            if os.path.isdir(leftover):
                shutil.rmtree(leftover, ignore_errors=True)
            else:
                os.unlink(leftover)
        except OSError:
            pass  # another job on this host may clean concurrently

    first = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    assert len(first) == 4
    dirs0 = {d for d in glob.glob(base + "_*") if not d.endswith(".lock")}
    assert len(dirs0) == 1, dirs0
    marker = os.path.join(next(iter(dirs0)), "_COMPLETE")
    produced_at = os.path.getmtime(marker)

    # plant superseded siblings: a fingerprint dir 2h idle (reaped —
    # new-code reuse refreshes mtime, so 1h idle means abandoned), its
    # lock file (NEVER reaped: unlinking a lockable path splits future
    # flockers onto a fresh inode), the legacy unsuffixed dir at 2h
    # (KEPT — legacy reuse never refreshes mtime, 24h grace) and at
    # 25h (reaped)
    stale = base + "_deadbeef00"
    os.makedirs(stale, exist_ok=True)
    open(stale + ".lock", "w").close()
    os.makedirs(base, exist_ok=True)
    for p in (stale, stale + ".lock", base):
        os.utime(p, (time.time() - 7200, time.time() - 7200))

    again = sorted(map(tuple, q(spark, SF_SMOKE).collect()))
    assert again == first
    assert os.path.getmtime(marker) == produced_at, "log was re-produced"
    assert not os.path.exists(stale), "superseded fingerprint dir kept"
    assert os.path.exists(stale + ".lock"), "lock file must never be reaped"
    assert os.path.exists(base), "legacy dir reaped inside its 24h grace"

    os.utime(base, (time.time() - 90000, time.time() - 90000))
    q(spark, SF_SMOKE).collect()
    assert not os.path.exists(base), "legacy dir kept past 24h idle"
    # stale's lock file is deliberately left behind: never-unlink-flock


def test_local_fs_path_classification():
    """ADVICE r10: a driver-side glob over a REMOTE log dir matches
    nothing and would misread an existing topic as empty (duplicate
    offsets) — so remote schemes must classify as non-local."""
    from hive_reflex_spark.sources.kafka_log import _local_fs_path

    assert _local_fs_path("/tmp/x/topic=t") == "/tmp/x/topic=t"
    assert _local_fs_path("file:/tmp/x/topic=t") == "/tmp/x/topic=t"
    assert _local_fs_path("file:///tmp/x/topic=t") == "/tmp/x/topic=t"
    assert _local_fs_path("hdfs://nn:8020/logs/topic=t") is None
    assert _local_fs_path("s3a://bucket/logs/topic=t") is None
    # ADVICE r11: percent-encoded local paths must decode before the
    # glob, and a file: URI with a foreign authority is NOT this host's
    # filesystem — both misreads would mint duplicate offsets
    assert _local_fs_path("file:///tmp/a%20b/topic=t") == "/tmp/a b/topic=t"
    assert _local_fs_path("file://localhost/tmp/x") == "/tmp/x"
    assert _local_fs_path("file://otherhost/tmp/x") is None


def test_hwm_spark_fallback_matches_footer_path(spark, tmp_path):
    """The Spark-scan high-water mark (the non-local-path fallback) must
    agree exactly with the pyarrow footer-statistics fast path, and an
    absent topic directory must read as a new topic, not an error."""
    from hive_reflex_spark.sources.kafka_log import (
        _read_hwm,
        _read_hwm_spark,
        _topic_dir,
    )

    _append(spark, tmp_path, n=64, n_partitions=2)
    tdir = _topic_dir(str(tmp_path), "can")
    assert _read_hwm_spark(spark, tdir) == _read_hwm(tdir)
    assert _read_hwm_spark(spark, str(tmp_path / "no_such_topic")) == {}


def test_foreign_parquet_in_partition_dir_raises(spark, tmp_path):
    """ADVICE r10: a parquet file without an 'offset' column in a
    partition dir must raise a descriptive error naming the file, not a
    bare StopIteration out of the footer scan."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from hive_reflex_spark.sources.kafka_log import _read_hwm, _topic_dir

    _append(spark, tmp_path, n=64, n_partitions=2)
    tdir = _topic_dir(str(tmp_path), "can")
    part_dir = sorted(
        d for d in os.listdir(tdir) if d.startswith("partition=")
    )[0]
    foreign = os.path.join(tdir, part_dir, "foreign.parquet")
    pq.write_table(pa.table({"not_offset": [1, 2, 3]}), foreign)
    with pytest.raises(ValueError, match="foreign.parquet"):
        _read_hwm(tdir)
