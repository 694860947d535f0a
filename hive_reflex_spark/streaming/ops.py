"""Structured Streaming operators over the replayed ``events`` fixture
(SURVEY §2A ST1-ST8): tumbling/session windows, stream-static joins,
stateful per-key aggregation with timeouts.

Replay model: the parquet file is a file-stream source driven to
completion with an availableNow trigger + memory sink (FIXTURES.md oracle
policy) — deterministic in CI, and the exact code path a Kafka/CAN-bus
source would feed in production (swap the reader, keep the plan).

Scale notes: windowed aggregations keep O(open windows × keys) state;
watermarks (ST3) bound that state by evicting closed windows — without
one, a 100 TB replay would accumulate state forever. Session windows and
applyInPandasWithState shuffle on the grouping key once; state lives in
the state store, not executor heap.
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from hive_reflex_spark.registry import query

_MEM_COUNTER = itertools.count()

EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)
# normalized shape once ts is a real timestamp (chunk re-stage, micros files)
EVENTS_SCHEMA_TS = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
EVENTS_SCHEMA_NTZ = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _events_ts_storage(sf_dir: str) -> str:
    """Physical timestamp storage of the events fixture: 'ns' (TIMESTAMP
    NANOS — pre-round-2 fixtures), 'us_ntz' (micros, isAdjustedToUTC=false)
    or 'us_tz'. Streaming sources need an explicit schema, so the reader
    must match the file, not assume one vintage."""
    import pyarrow.parquet as pq

    t = str(
        pq.read_schema(os.path.join(sf_dir, "events.parquet"))
        .field("ts")
        .type
    )
    if t.startswith("timestamp[ns"):
        return "ns"
    return "us_tz" if "tz=" in t else "us_ntz"


def _stage_stream_dir(sf_dir: str) -> str:
    """Spark's file-stream source requires a *directory*; the fixture is a
    single file. Stage a symlink dir under /tmp (one per sf_dir), which is
    also where a real deployment would point the source at a landing zone.
    """
    key = sf_dir.strip("/").replace("/", "_")
    d = os.path.join("/tmp", "hrs_stream", key)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.exists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return d


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a file-stream source, ts normalized to TIMESTAMP
    micros whatever the physical storage (matching io.read_table)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    staged = _stage_stream_dir(sf_dir)
    storage = _events_ts_storage(sf_dir)
    if storage == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(staged)
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    schema = EVENTS_SCHEMA_NTZ if storage == "us_ntz" else EVENTS_SCHEMA_TS
    raw = spark.readStream.schema(schema).parquet(staged)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_memory(df: DataFrame, mode: str = "complete") -> DataFrame:
    """Drive a streaming DataFrame to completion (availableNow) into a
    memory sink; return the sink table."""
    name = f"hrs_mem_{next(_MEM_COUNTER)}"
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


@query(
    "q62_streaming_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q62_streaming_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling windows (ST1, `can_sync.c:35-51`'s sync-period
    alignment): 1-hour windows × event_type via readStream → window() →
    availableNow → memory sink. The oracle is the batch equivalent —
    streaming and batch must agree on a bounded replay."""
    stream = stream_events(spark, sf_dir)
    agg = stream.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count("*").alias("n"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
            "total_value"
        ),
    )
    out = run_to_memory(agg, mode="complete")
    return out.select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n",
        "total_value",
    )


@query(
    "q63_stream_static_join",
    oracle="""
    SELECT label, event_type, COUNT(*) AS n
    FROM events JOIN embeddings ON user_id = vec_id
    GROUP BY label, event_type
    """,
)
def q63_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (ST5's sense→lookup→act loop): the event stream
    enriched against the static embeddings dimension (broadcast — each
    micro-batch joins without shuffling the stream), then aggregated."""
    stream = stream_events(spark, sf_dir)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).select(
        "vec_id", "label"
    )
    joined = stream.join(F.broadcast(emb), stream.user_id == emb.vec_id)
    agg = joined.groupBy("label", "event_type").agg(F.count("*").alias("n"))
    return run_to_memory(agg, mode="complete")


@query(
    "q64_streaming_sessions",
    oracle="""
    WITH s AS (
        SELECT user_id, ts_us,
               CAST(SUM(CASE WHEN prev_us IS NULL
                             OR ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS sid
        FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                     lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY epoch_us(ts), event_id)
                         AS prev_us
              FROM events)),
    agg AS (SELECT user_id, sid, MIN(ts_us) AS start_us,
                   MAX(ts_us) AS last_us, COUNT(*) AS n_events
            FROM s GROUP BY user_id, sid),
    wm AS (SELECT MAX(epoch_us(ts)) - 3600000000 AS w FROM events)
    SELECT user_id,
           strftime(make_timestamp(start_us), '%Y-%m-%d %H:%M:%S')
               AS session_start,
           n_events
    FROM agg, wm WHERE last_us + 1800000000 <= w
    """,
)
def q64_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows in streaming (ST8): session_window(ts, 30 min) per
    user with a 1-hour watermark, availableNow replay. Append mode emits
    exactly the sessions whose end+gap precedes the final watermark
    (max event time − 1 h) — a deterministic set on a bounded replay, so
    the oracle is batch sessionization (q20's islands) filtered by that
    same predicate; the in-state tail is the complement, covered by
    batch twin q20."""
    stream = stream_events(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    out = run_to_memory(agg, mode="append")
    return out.select(
        "user_id",
        F.date_format(F.col("session_window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_events",
    )


def stateful_user_counts(
    spark: SparkSession, sf_dir: str, timeout_ms: int = 0
) -> DataFrame:
    """Per-key stateful aggregation via applyInPandasWithState (ST2/ST5,
    `example_reflex_node.c:87-93`'s per-node failsafe state): running
    event count + last-seen timestamp per user, state carried across
    micro-batches in the state store."""
    stream = stream_events(spark, sf_dir)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            (count, last_us) = state.get
        else:
            count, last_us = 0, 0
        for pdf in pdfs:
            count += len(pdf)
            if len(pdf):
                last_us = max(
                    last_us, int(pdf["ts"].astype("int64").max()) // 1000
                )
        state.update((count, last_us))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [count], "last_us": [last_us]}
        )

    out = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_events long, last_us long",
        stateStructType="n_events long, last_us long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return run_to_memory(out, mode="update")


CAN_CMD_ID = 0x123  # command frame id (example_reflex_node.c CAN_CMD_ID)


def synthesize_can_frames(
    ticks: DataFrame,
    value_col: str = "value",
    ts_col: str = "timestamp",
    n_nodes: int = 4,
) -> DataFrame:
    """Tick stream → CAN frames (ts, node_id, can_id, data array<int>).

    Each tick becomes one 8-byte frame with the wire layout of
    `examples/example_reflex_node.c:109-120`: data[0..1] = little-endian
    two's-complement int16 angle in 0.01° units, data[2] = uint8
    compliance. Deterministic in the tick value so batch and streaming
    runs agree; every 8th frame carries a non-command id (bus noise the
    decoder must ignore)."""
    v = F.col(value_col).cast("long")
    angle16 = (F.pmod(v * 37 + 13, 36000) - 18000).cast("int")  # ±180.00°
    u16 = F.pmod(angle16.cast("long"), 65536).cast("int")  # two's complement
    data = F.array(
        (u16 % 256).cast("int"),
        (u16 / 256).cast("int"),
        F.pmod(v * 7, 256).cast("int"),
        *[F.lit(0) for _ in range(5)],
    )
    return ticks.select(
        F.col(ts_col).alias("ts"),
        F.pmod(v, n_nodes).cast("int").alias("node_id"),
        F.when(v % 8 == 0, F.lit(0x200))
        .otherwise(F.lit(CAN_CMD_ID))
        .cast("int")
        .alias("can_id"),
        data.alias("data"),
    )


def decode_can_frames(frames: DataFrame) -> DataFrame:
    """CAN_RxCallback as column expressions (S8/P13,
    `example_reflex_node.c:109-120`): keep command frames, reassemble the
    little-endian int16 ((data[1] << 8) | data[0], sign-extended), scale
    to degrees and [0,1] compliance. Works identically on a batch frame
    table and a streaming one — swap the source, keep the plan."""
    from hive_reflex_spark.functions.tensor_fns import (
        decode_angle_raw,
        decode_compliance_raw,
    )

    u16 = F.col("data")[1] * 256 + F.col("data")[0]
    raw = F.when(u16 >= 32768, u16 - 65536).otherwise(u16)
    return frames.filter(F.col("can_id") == CAN_CMD_ID).select(
        "ts",
        "node_id",
        decode_angle_raw(raw).alias("target_angle"),
        decode_compliance_raw(F.col("data")[2]).alias("compliance"),
    )


def encode_can_frames(commands: DataFrame) -> DataFrame:
    """CAN_Transmit as column expressions — the Act/tx leg of the HEx
    device interface (U2, `codegen_cim.py:527-546`'s
    HEx_Device_Init/Read/Act contract): target angle/compliance back to
    the 8-byte wire layout of `example_reflex_node.c:109-120`
    (little-endian two's-complement int16 in 0.01-degree units + uint8
    compliance). The exact inverse of :func:`decode_can_frames`."""
    raw = F.round(F.col("target_angle") * 100).cast("long")
    u16 = F.pmod(raw, 65536).cast("int")
    comp = F.round(F.col("compliance") * 255).cast("int")
    data = F.array(
        (u16 % 256).cast("int"),
        (u16 / 256).cast("int"),
        comp,
        *[F.lit(0) for _ in range(5)],
    )
    return commands.select(
        "ts",
        "node_id",
        F.lit(CAN_CMD_ID).cast("int").alias("can_id"),
        data.alias("data"),
    )


def can_bus_stream(
    spark: SparkSession, rows_per_second: int = 500, n_nodes: int = 4
) -> DataFrame:
    """S8 — a real continuous bus source: Spark's rate source emits ticks
    at bus frequency, each synthesized into a CAN frame and wire-decoded.
    Unlike the file-replay sources, this stream has no end — the
    continuous-ingest reality of a sensor bus. Compose with
    window()/withWatermark for the ST1 sync-window rollups."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return decode_can_frames(
        synthesize_can_frames(rate, n_nodes=n_nodes)
    )


# --- S8 over a REAL transport: SLCAN frames on a TCP socket -----------------
#
# The reference's bus is a physical transport (examples/
# example_reflex_node.c:109-120 rx path; id scheme CAN_CMD_ID =
# 0x200 + MY_NODE_ID at example_reflex_node.c:18). The engine-side
# equivalent is a bus-wide consumer on a socket: frames arrive as SLCAN
# ("Lawicel/serial-line CAN", the can-utils slcand wire text:
# 't' + 11-bit id as 3 hex + DLC digit + 2*DLC hex data chars), the
# standard way a CAN adapter is bridged onto a byte stream. The decode
# path after parsing is byte-for-byte the SAME decode_can_frames plan
# the rate-source bus uses — swap the transport, keep the plan.

CAN_NODE_BASE = 0x200  # wire command id = 0x200 + node_id
CAN_NOISE_WIRE_ID = 0x100  # non-command traffic on the wire


def slcan_encode_lines(frames: DataFrame, n_bytes: int = 8) -> DataFrame:
    """Frame table (node_id, can_id, data array<int>) → SLCAN text lines
    (column ``value``) — the tx leg onto the byte transport, as pure
    column expressions (codegen; usable under writeStream). Command
    frames address by id offset (0x200 + node_id, the reference's
    scheme); anything else ships under the noise id."""
    wire_id = (
        F.when(
            F.col("can_id") == CAN_CMD_ID,
            F.lit(CAN_NODE_BASE) + F.col("node_id"),
        )
        .otherwise(F.lit(CAN_NOISE_WIRE_ID))
        .cast("long")
    )
    id_hex = F.lpad(F.lower(F.conv(wire_id.cast("string"), 10, 16)), 3, "0")
    byte_hex = [
        F.lpad(
            F.lower(
                F.conv(F.col("data")[i].cast("string"), 10, 16)
            ),
            2,
            "0",
        )
        for i in range(n_bytes)
    ]
    return frames.select(
        F.concat(F.lit("t"), id_hex, F.lit(str(n_bytes)), *byte_hex).alias(
            "value"
        )
    )


def parse_slcan_frames(
    lines: DataFrame,
    ts_col: str = "timestamp",
    n_nodes: int = 4,
) -> DataFrame:
    """SLCAN text lines → the logical frame table decode_can_frames
    consumes (ts, node_id, can_id, data array<int>). The wire→logical
    adapter inverts the id-offset addressing: wire ids in
    [0x200, 0x200+n_nodes) are command frames for node (id - 0x200);
    malformed lines and short frames are dropped (bus noise discipline,
    same as the non-command-id filter). All column expressions —
    whole-stage codegen, batch and streaming alike."""
    ok = lines.filter(
        F.col("value").rlike("^t[0-9a-fA-F]{3}[0-8]([0-9a-fA-F]{2})*$")
    ).filter(
        F.length("value")
        == 5 + 2 * F.conv(F.substring("value", 5, 1), 16, 10).cast("int")
    )
    wid = F.conv(F.substring("value", 2, 3), 16, 10).cast("int")
    dlc = F.conv(F.substring("value", 5, 1), 16, 10).cast("int")
    data = F.array(
        *[
            F.when(
                F.lit(i) < dlc,
                F.conv(F.substring("value", 6 + 2 * i, 2), 16, 10).cast(
                    "int"
                ),
            ).otherwise(F.lit(0))
            for i in range(8)
        ]
    )
    node = wid - CAN_NODE_BASE
    is_cmd = node.between(0, n_nodes - 1)
    return ok.select(
        F.col(ts_col).alias("ts"),
        F.when(is_cmd, node).otherwise(F.pmod(wid, n_nodes))
        .cast("int")
        .alias("node_id"),
        F.when(is_cmd, F.lit(CAN_CMD_ID)).otherwise(wid)
        .cast("int")
        .alias("can_id"),
        data.alias("data"),
    )


def can_bus_socket_stream(
    spark: SparkSession, host: str, port: int, n_nodes: int = 4
) -> DataFrame:
    """S8 on a real external transport: SLCAN frames read from a TCP
    socket (Spark's socket source, arrival-timestamped), parsed and fed
    through the IDENTICAL decode path as the rate-source bus. At
    deployment scale the same parse+decode plan sits behind a
    partitioned ingest (one socket per bus adapter, or Kafka topic
    partitions) — the transport fans out, the plan does not change."""
    lines = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .option("includeTimestamp", "true")
        .load()
    )
    return decode_can_frames(parse_slcan_frames(lines, n_nodes=n_nodes))


_CAN_ROLLUP_ORACLE = """
    WITH f AS (SELECT event_id AS v FROM events WHERE event_id % 8 != 0),
    d AS (SELECT CAST(v % 4 AS INTEGER) AS node_id,
                 CAST(((v * 37 + 13) % 36000) - 18000 AS DOUBLE) * 0.01
                     AS angle,
                 CAST((v * 7) % 256 AS DOUBLE) / 255.0 AS compliance
          FROM f)
    SELECT node_id, COUNT(*) AS n_cmd,
           ROUND(MIN(angle), 6) AS min_angle,
           ROUND(MAX(angle), 6) AS max_angle,
           ROUND(CAST(SUM(CAST(ROUND(angle * 1000000000) AS BIGINT))
                 AS BIGINT) / 1000000000.0, 6) AS sum_angle,
           ROUND(CAST(SUM(CAST(ROUND(compliance * 1000000000) AS BIGINT))
                 AS BIGINT) / 1000000000.0, 6) AS sum_compliance
    FROM d GROUP BY node_id
    """


@query("q160_can_wire_decode", oracle=_CAN_ROLLUP_ORACLE)
def q160_can_wire_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 wire codec as a driver-checkable batch query: every event id
    becomes an 8-byte CAN frame (little-endian two's-complement int16
    angle in 0.01° units + uint8 compliance, `examples/
    example_reflex_node.c:109-120`), then the SAME decode plan the live
    bus stream uses reassembles and scales it; non-command ids (every
    8th frame) must be ignored. The oracle computes the per-node rollup
    straight from the synthesis arithmetic — only a correct
    encode→decode round-trip (sign extension included) hash-matches."""
    from hive_reflex_spark.functions import exact_sum
    from hive_reflex_spark.io import read_table

    ticks = read_table(spark, sf_dir, "events").select("event_id", "ts")
    decoded = decode_can_frames(
        synthesize_can_frames(ticks, value_col="event_id", ts_col="ts")
    )
    return decoded.groupBy("node_id").agg(
        F.count("*").alias("n_cmd"),
        F.round(F.min("target_angle"), 6).alias("min_angle"),
        F.round(F.max("target_angle"), 6).alias("max_angle"),
        F.round(exact_sum(F.col("target_angle"), 9), 6).alias("sum_angle"),
        F.round(exact_sum(F.col("compliance"), 9), 6).alias("sum_compliance"),
    )


@query("q160a_slcan_transport", oracle=_CAN_ROLLUP_ORACLE)
def q160a_slcan_transport(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q160's rollup with the REAL transport codec in the loop
    (VERDICT r7 item 6): frames encode to SLCAN wire text
    (``slcan_encode_lines``, id-offset addressing 0x200 + node_id per
    `example_reflex_node.c:18`), the text is parsed back
    (``parse_slcan_frames`` — the adapter the TCP socket source feeds
    through), and only then decoded. Same oracle as q160: the rollup
    hash-matches ONLY if the wire text round-trips every byte (hex
    packing, 11-bit id math, DLC length discipline, sign extension) —
    a transport-layer defect anywhere breaks the hash. The live-socket
    twin (`can_bus_socket_stream`) runs this identical parse+decode
    plan over readStream and is CI-verified end to end over a real TCP
    server in tests/test_sinks_allocator.py."""
    from hive_reflex_spark.functions import exact_sum
    from hive_reflex_spark.io import read_table

    ticks = read_table(spark, sf_dir, "events").select("event_id", "ts")
    frames = synthesize_can_frames(ticks, value_col="event_id", ts_col="ts")
    wire = slcan_encode_lines(frames).withColumn("ts0", F.lit(None).cast("timestamp"))
    decoded = decode_can_frames(parse_slcan_frames(wire, ts_col="ts0"))
    return decoded.groupBy("node_id").agg(
        F.count("*").alias("n_cmd"),
        F.round(F.min("target_angle"), 6).alias("min_angle"),
        F.round(F.max("target_angle"), 6).alias("max_angle"),
        F.round(exact_sum(F.col("target_angle"), 9), 6).alias("sum_angle"),
        F.round(exact_sum(F.col("compliance"), 9), 6).alias("sum_compliance"),
    )


@query("q160b_kafka_log_transport", oracle=_CAN_ROLLUP_ORACLE)
def q160b_kafka_log_transport(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q160's rollup with the PARTITIONED COMMIT LOG in the transport
    loop (the fleet-scale S8 shape next to q160a's point-to-point
    socket): SLCAN wire lines are PRODUCED into the Kafka-shaped log
    (`sources/kafka_log.py` — keyed partitioning on the wire id, dense
    per-partition offsets, the kafka source's record projection), then
    CONSUMED back (batch replay from earliest) and only then parsed and
    decoded by the identical plan. Same oracle as q160/q160a: the
    per-node rollup hash-matches ONLY if every byte survives
    produce→consume→decode — key hashing, binary encode/decode, offset
    assignment and replay all sit on the verified path. On a cluster
    `log_read` swaps for the kafka connector with the downstream plan
    unchanged. Reference anchor: the bus rx path the log transports,
    `examples/example_reflex_node.c:109-120`."""
    import fcntl
    import hashlib
    import shutil

    from hive_reflex_spark.functions import exact_sum
    from hive_reflex_spark.io import read_table
    from hive_reflex_spark.sources.kafka_log import log_append, log_read

    ticks = read_table(spark, sf_dir, "events").select("event_id", "ts")
    frames = synthesize_can_frames(ticks, value_col="event_id", ts_col="ts")
    wire = slcan_encode_lines(frames).select(
        # key = the 11-bit wire id (hex chars 2..4): per-node total order
        # within a partition, kafka's per-key ordering contract
        F.substring("value", 2, 3).alias("k"),
        F.col("value"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("t0"),
    )
    # produce happens at plan-construction (a broker append is eager by
    # nature). The log dir is keyed by a FINGERPRINT of everything the
    # produce depends on — the fixture file's (path, size, mtime) AND a
    # hash of the produce-path sources (this module, kafka_log.py, and
    # io.py whose read_table feeds the wire rows) — and produced AT
    # MOST ONCE per fingerprint, then REUSED: the produce is
    # deterministic, so a completed log for the same fingerprint is
    # byte-equivalent to reproducing it. Keying (rather than wiping a
    # shared dir) is what makes this safe twice over: (a) CONCURRENT
    # sweeps — a rebuilt fixture or changed code writes into a
    # DIFFERENT directory, so no call ever deletes files another
    # process's returned (lazy) plan is still scanning; (b) REGRESSION
    # masking — any edit to the produce path changes the code hash and
    # forces a fresh produce, so a stale green log can never vouch for
    # new code. Two first-producers of one fingerprint serialize on an
    # exclusive flock with the completion marker re-checked inside the
    # lock. Every call refreshes its OWN dir's mtime, then reaps
    # siblings (superseded fingerprint dirs, their lock files, and the
    # legacy unsuffixed layout) once they have sat untouched for an
    # hour — so "idle" really means "no process has reused it either",
    # and /tmp growth stays bounded.
    import hive_reflex_spark.io as _hio
    import hive_reflex_spark.sources.kafka_log as _klog

    code_h = hashlib.md5()
    for mod_path in (os.path.abspath(__file__), _klog.__file__,
                     _hio.__file__):
        with open(mod_path, "rb") as mf:
            code_h.update(mf.read())
    ev_path = os.path.join(sf_dir, "events.parquet")
    st = os.stat(ev_path)
    fingerprint = hashlib.md5(
        f"{ev_path}:{st.st_size}:{st.st_mtime_ns}:"
        f"{code_h.hexdigest()}".encode()
    ).hexdigest()[:10]
    base = "hrs_q160b_log_" + hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    log_dir = os.path.join("/tmp", f"{base}_{fingerprint}")
    # marker PRESENCE is the completion signal; the fingerprint lives
    # in the directory name, not the marker content
    marker = os.path.join(log_dir, "_COMPLETE")

    def _ensure_log() -> None:
        if os.path.exists(marker):
            return
        with open(log_dir + ".lock", "w") as lockf:
            fcntl.flock(lockf, fcntl.LOCK_EX)
            try:
                if not os.path.exists(marker):  # produced while waiting?
                    # a dir without its marker is a crashed produce
                    shutil.rmtree(log_dir, ignore_errors=True)
                    log_append(
                        wire, log_dir, "slcan", n_partitions=4,
                        key_col="k", value_col="value", ts_col="t0",
                    )
                    with open(marker, "w"):
                        pass
            finally:
                fcntl.flock(lockf, fcntl.LOCK_UN)

    _ensure_log()
    # refresh our dir's mtime BEFORE reaping: reuse must count as
    # activity, or a >1h-old dir this very call returns a plan over
    # could be reaped by a concurrent process with a different
    # fingerprint. If a racing reaper already took the dir (it was >1h
    # idle until this instant), reproduce under the lock and retry —
    # the residual window is then one getmtime-vs-utime interleaving
    # on a dir whose FIRST reuse after an hour's sleep coincides with
    # another fingerprint's reap to the microsecond; accepted.
    try:
        os.utime(log_dir)
    except OSError:
        _ensure_log()
        os.utime(log_dir)
    import glob as _glob
    import time as _time

    for sib in _glob.glob(os.path.join("/tmp", f"{base}*")):
        # NEVER unlink lock files: removing a path another process may
        # flock splits future lockers onto a fresh inode and two
        # producers enter the critical section together (classic
        # unlink/reopen flock hazard). They are 0-byte; they stay.
        if sib == log_dir or sib.endswith(".lock"):
            continue
        try:
            # fingerprint-suffixed dirs ({base}_*) refresh their mtime
            # on every reuse, so 1h idle truly means abandoned; the
            # legacy EXACT-{base} layout (pre-fingerprint code never
            # touches mtime on reuse) gets a 24h grace instead — note
            # base itself ends in 10 hex, so test the "{base}_" prefix,
            # not a suffix pattern
            idle = _time.time() - os.path.getmtime(sib)
            horizon = (
                3600
                if sib.startswith(os.path.join("/tmp", base) + "_")
                else 86400
            )
            if idle > horizon:
                shutil.rmtree(sib, ignore_errors=True)
        except OSError:
            pass
    lines = log_read(spark, log_dir, "slcan").select(
        F.decode("value", "UTF-8").alias("value"),
        F.col("ts").alias("ts0"),
    )
    decoded = decode_can_frames(parse_slcan_frames(lines, ts_col="ts0"))
    return decoded.groupBy("node_id").agg(
        F.count("*").alias("n_cmd"),
        F.round(F.min("target_angle"), 6).alias("min_angle"),
        F.round(F.max("target_angle"), 6).alias("max_angle"),
        F.round(exact_sum(F.col("target_angle"), 9), 6).alias("sum_angle"),
        F.round(exact_sum(F.col("compliance"), 9), 6).alias("sum_compliance"),
    )


@query(
    "q217_device_roundtrip",
    oracle="""
    WITH f AS (SELECT event_id AS v FROM events WHERE event_id % 8 != 0),
    d AS (SELECT CAST(v % 4 AS INTEGER) AS node_id,
                 ((v * 37 + 13) % 36000) - 18000 AS raw,
                 (v * 7) % 256 AS comp
          FROM f)
    SELECT node_id, COUNT(*) AS n_cmd,
           CAST(SUM((raw + 65536) % 65536) AS BIGINT) AS sum_u16,
           CAST(SUM(comp) AS BIGINT) AS sum_comp,
           CAST(MIN(raw) AS BIGINT) AS min_raw,
           CAST(MAX(raw) AS BIGINT) AS max_raw
    FROM d GROUP BY node_id
    """,
)
def q217_device_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 — the HEx device-driver interface (HEx_Device_Init/Read/Act,
    `codegen_cim.py:527-546`; `README.md:36`) driven end to end as one
    driver-checkable round-trip. Read: the bus frames wire-decoded to
    commands (the S8 rx path). Act: commands re-ENCODED to the 8-byte
    wire layout and transmitted through the registered JSON log sink —
    the device tx wire log. The shipped log is then read back under an
    explicit schema and rolled up at BYTE level (u16 word sums,
    compliance-byte sums, raw int16 extremes — no floats anywhere), so
    only a true encode/decode inverse pair plus a lossless sink
    hash-match the oracle, which re-derives every byte from the event
    arithmetic.

    Scale: encode/decode are pure column expressions (whole-stage
    codegen); the sink is a distributed partitioned write, the readback
    a parallel scan — nothing driver-resident."""
    import hashlib
    import shutil
    import tempfile

    from hive_reflex_spark.io import read_table
    from hive_reflex_spark.sources.sinks import write_runtime_log_json

    ticks = read_table(spark, sf_dir, "events").select("event_id", "ts")
    cmds = decode_can_frames(
        synthesize_can_frames(ticks, value_col="event_id", ts_col="ts")
    )
    tx = encode_can_frames(cmds)
    work = os.path.join(
        tempfile.gettempdir(),
        f"hrs_devtx_{os.getpid()}_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    shutil.rmtree(work, ignore_errors=True)
    write_runtime_log_json(tx.drop("ts"), work)
    back = spark.read.schema("node_id int, can_id int, data array<int>").json(
        work
    )
    u16 = F.col("data")[1] * 256 + F.col("data")[0]
    raw = F.when(u16 >= 32768, u16 - 65536).otherwise(u16)
    return (
        back.filter(F.col("can_id") == CAN_CMD_ID)
        .groupBy("node_id")
        .agg(
            F.count("*").alias("n_cmd"),
            F.sum(u16.cast("long")).alias("sum_u16"),
            F.sum(F.col("data")[2].cast("long")).alias("sum_comp"),
            F.min(raw.cast("long")).alias("min_raw"),
            F.max(raw.cast("long")).alias("max_raw"),
        )
    )


def ota_feedback_loop(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    weights: DataFrame | None = None,
    min_samples: int = 100,
    drift_threshold: float = 0.01,
    min_confidence: float = 0.7,
    n_chunks: int = 4,
) -> dict:
    """ST7 — the composed OTA feedback loop (`tools/ai_feedback.py:401-531`
    AdaptiveFeedbackLoop.run_auto_loop), end to end in ONE streaming job:

      collect (stream micro-batch) → aggregate (A6 stats) → decide
      (sample-count + confidence + drift gates) → optimize (distributed
      weight rescale) → package (pack_model_binary, versioned, CRC'd)
      → validate (load_model_binary) → ship (JSON feedback log).

    The event fixture is re-staged as ``n_chunks`` files and streamed with
    maxFilesPerTrigger=1, so foreachBatch runs one loop iteration per
    chunk — the reference's collect/optimize/wait cycle with micro-batches
    as the clock. Every gate mirrors the reference: <100 samples skips
    (ai_feedback.py:449-451), confidence < 0.7 skips (:456-458), versions
    increment 2.1.N (:469-471). Returns the loop summary."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    # stage the replay as n_chunks files → n_chunks micro-batches
    chunk_dir = os.path.join(out_dir, "chunks")
    if os.path.exists(chunk_dir):
        # chunk dirs staged by the pre-vintage-detection code carry ts as
        # raw nanosecond INT64 — unreadable under the TIMESTAMP schema
        # below; restage rather than crash on schema conversion
        import glob as _glob
        import shutil as _shutil

        import pyarrow.parquet as _pq

        files = _glob.glob(os.path.join(chunk_dir, "*.parquet"))
        stale = not files or not str(
            _pq.read_schema(files[0]).field("ts").type
        ).startswith("timestamp")
        if stale:
            _shutil.rmtree(chunk_dir)
    if not os.path.exists(chunk_dir):
        # re-stage via the normalized batch reader so the chunks carry a
        # real TIMESTAMP column regardless of the fixture's storage vintage
        from hive_reflex_spark.io import read_table

        read_table(spark, sf_dir, "events").repartition(n_chunks).write.parquet(
            chunk_dir
        )
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )

    if weights is None:
        # seed model: ReflexNet-shaped fc layer as a coordinate table
        weights = spark.range(64).select(
            F.lit("fc1").alias("layer"),
            (F.col("id") / 8).cast("int").alias("i"),
            (F.col("id") % 8).cast("int").alias("j"),
            (F.sin(F.col("id").cast("double")) * 0.5).alias("value"),
        )

    state = {"version": 0, "current": weights.persist(), "log": []}
    log_path = os.path.join(out_dir, "feedback_log.jsonl")

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        from hive_reflex_spark.sources.sinks import (
            load_model_binary,
            pack_model_binary,
        )

        stats = batch_df.agg(
            F.count("*").alias("n"),
            F.avg("value").alias("mean_value"),
            F.expr("percentile_approx(value, 0.99)").alias("p99_value"),
        ).first()
        entry = {
            "epoch": int(epoch_id),
            "n_samples": int(stats["n"]),
            "mean_value": float(stats["mean_value"] or 0.0),
            "p99_value": float(stats["p99_value"] or 0.0),
        }
        confidence = min(1.0, stats["n"] / (2.0 * min_samples))
        if stats["n"] < min_samples:
            entry["action"] = "skip_insufficient_samples"
        elif confidence < min_confidence:
            entry["action"] = "skip_low_confidence"
        elif abs(entry["mean_value"]) < drift_threshold:
            entry["action"] = "skip_no_drift"
        else:
            # optimize: damp weights against the observed drift (the
            # reference's optimize_model gradient nudge, as a column op)
            factor = 1.0 / (1.0 + abs(entry["mean_value"]) / 10.0)
            new_w = state["current"].withColumn(
                "value", F.col("value") * F.lit(factor)
            )
            state["version"] += 1
            version = f"2.1.{state['version']}"
            artifact = os.path.join(out_dir, f"model_v{version}.bin")
            manifest = pack_model_binary(new_w, artifact)
            load_model_binary(artifact)  # upload-side validation (CRC)
            prev = state["current"]
            state["current"] = new_w.persist()
            prev.unpersist()
            entry.update(
                action="deployed",
                version=version,
                artifact=artifact,
                n_layers=manifest["n_layers"],
                factor=round(factor, 6),
            )
        state["log"].append(entry)
        with open(log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")

    q = (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state["current"].unpersist()
    return {
        "iterations": len(state["log"]),
        "deployed": [e["version"] for e in state["log"] if e.get("version")],
        "log_path": log_path,
        "final_version": f"2.1.{state['version']}",
    }


def batched_log_shipping(
    spark: SparkSession, sf_dir: str, out_dir: str, batch_rows: int = 1000
) -> list[str]:
    """Batched log shipping (ST6, `tools/ai_feedback.py:88-118`): the
    event stream flushed as JSON batch files via foreachBatch — the
    exactly-once sink pattern (each epoch writes one atomic directory).
    Returns the written batch paths."""
    stream = stream_events(spark, sf_dir)
    written: list[str] = []

    def sink(df: DataFrame, epoch_id: int) -> None:
        path = os.path.join(out_dir, f"batch_{epoch_id:05d}")
        (
            df.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .json(path)
        )
        written.append(path)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return written


# ---------------------------------------------------------------------------
# Streaming exact dedup (the curation dedup family's streaming member)
# ---------------------------------------------------------------------------

DUP_MOD = 97  # event_id % 97 == 0 -> planted duplicate (~1% of the stream)


@query(
    "q97_stream_dedup",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_unique,
           CAST(SUM(CASE WHEN event_id % 97 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_had_dupe,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def q97_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup via ``dropDuplicatesWithinWatermark``: the
    ingest-side member of the dedup family (q46 is its batch twin). The
    replayed event stream is salted with deterministic duplicates (every
    event_id divisible by 97 arrives twice), watermarked, deduplicated
    on event_id in-flight, then rolled up per event_type.

    On a bounded replay every duplicate lands inside the watermark, so
    the emitted set is EXACTLY the batch distinct — which is the oracle.
    At scale this is the operator that keeps re-delivered ingest (at
    least-once sources, retried uploads) from double-counting: state is
    bounded by the watermark horizon, keyed by event_id, and the
    aggregate only ever sees each event once."""
    stream = stream_events(spark, sf_dir)
    duped = stream.withColumn(
        "copy",
        F.explode(
            F.sequence(
                F.lit(0),
                (F.col("event_id") % DUP_MOD == 0).cast("int"),
            )
        ),
    ).drop("copy")
    deduped = duped.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    out = run_to_memory(deduped, mode="append")
    return out.groupBy("event_type").agg(
        F.count("*").alias("n_unique"),
        F.sum(((F.col("event_id") % DUP_MOD) == 0).cast("int"))
        .cast("long")
        .alias("n_had_dupe"),
        (F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0).alias(
            "total_value"
        ),
    )


@query(
    "q101_stream_interval_join",
    oracle="""
    SELECT a.user_id,
           a.event_id AS error_event_id,
           b.event_id AS click_event_id,
           CAST(epoch_us(a.ts) - epoch_us(b.ts) AS BIGINT) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_type = 'error' AND b.event_type = 'click'
     AND b.ts >= a.ts - INTERVAL 24 HOUR AND b.ts < a.ts
    """,
)
def q101_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM interval join: every error event correlated with the
    same user's click events in the preceding 24 h — the reference's
    Command→Status frame correlation on the CAN bus
    (`hive_arch.md:51-57`: a command at t is explained by status frames
    shortly before it), lifted to event time.

    Both sides carry a watermark and the join predicate carries the time
    range, so Spark bounds the join state to the interval plus the
    watermark delay per side — the production stream-stream shape whose
    state does NOT grow with stream length at 100 TB. On the bounded
    availableNow replay the inner join emits exactly the batch-join
    result, so the query is fully oracle-checkable.
    """
    errors = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_event_id"),
            "user_id",
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "1 hour")
    )
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("click_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    joined = errors.join(
        clicks,
        (F.col("user_id") == F.col("click_user_id"))
        & (F.col("click_ts") >= F.col("err_ts") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("click_ts") < F.col("err_ts")),
    ).select(
        "user_id",
        "error_event_id",
        "click_event_id",
        (F.unix_micros("err_ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )
    return run_to_memory(joined, mode="append")


@query(
    "q104_incremental_rollup",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) / 100.0
               AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q104_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (the hypertable
    continuous aggregate): the event stream arrives in micro-batches and
    each batch UPSERTS its partial (hour, event_type) counters into a
    parquet rollup table — read-merge-rewrite of ONLY the touched hour
    partitions via dynamic partition overwrite. Because the counters are
    additive integer units, the final table equals the full batch
    aggregate regardless of how the stream was chunked — which is exactly
    what the oracle checks.

    Scale shape: each micro-batch shuffles only its own partial aggregate
    (map-side combined); the rewrite touches O(hours in batch) partitions,
    not the whole view — the same pattern a Delta/Iceberg MERGE performs,
    expressed on plain parquet."""
    import shutil
    import tempfile

    from hive_reflex_spark.io import read_table

    # the view dir must outlive this function (the returned frame reads it
    # lazily), so the workdir path is DETERMINISTIC per (process, sf_dir)
    # and cleared at the start of each call — at most one view per input
    # ever lives in the temp dir, and no driver-side collect of the
    # rollup; chunks/checkpoint are deleted below, the view is not
    import hashlib

    work = os.path.join(
        tempfile.gettempdir(),
        f"hrs_rollup_{os.getpid()}_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    chunk_dir = os.path.join(work, "chunks")
    view_dir = os.path.join(work, "view")
    # time-range chunks: each micro-batch carries a contiguous slice of
    # event time, so an upsert touches ~1/4 of the day partitions — the
    # late-data-plus-fresh-tail arrival pattern, not a full-view rewrite
    read_table(spark, sf_dir, "events").repartitionByRange(
        4, "ts"
    ).write.parquet(chunk_dir)

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        # hourly rows inside daily partitions: the rewrite unit is a day,
        # the rollup grain is an hour
        delta = batch_df.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "event_type",
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("units"),
        ).withColumn("day", F.substring("window_start", 1, 10))
        s = batch_df.sparkSession
        if os.path.exists(view_dir):
            existing = s.read.parquet(view_dir)
            touched = [r["day"] for r in
                       delta.select("day").distinct().collect()]
            merged = (
                existing.filter(F.col("day").isin(touched))
                .unionByName(delta)
                .groupBy("day", "window_start", "event_type")
                .agg(F.sum("n").alias("n"), F.sum("units").alias("units"))
            )
            prev = s.conf.get("spark.sql.sources.partitionOverwriteMode")
            s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                # one task per touched day (each day's rows hash to one
                # shuffle partition) — the per-partition rewrite unit that
                # holds at any scale, and one file per day locally
                merged.repartition("day").write.mode("overwrite").partitionBy(
                    "day"
                ).parquet(view_dir)
            finally:
                s.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            delta.repartition("day").write.partitionBy("day").parquet(view_dir)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA_TS)
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # drop only the stream plumbing; the view dir stays alive so the
    # returned plan is a lazy parquet read (hour x event_type rollup),
    # evaluated whenever the caller acts on it
    shutil.rmtree(chunk_dir, ignore_errors=True)
    shutil.rmtree(os.path.join(work, "ckpt"), ignore_errors=True)
    return spark.read.parquet(view_dir).select(
        F.col("window_start").cast("string"),
        "event_type",
        "n",
        (F.col("units") / 100.0).alias("total_value"),
    )


@query(
    "q121_stream_countmin",
    oracle="""
    WITH rows_ AS (SELECT unnest(range(4)) AS j)
    SELECT j,
           CAST(instr('0123456789abcdef',
                      substr(md5(j || ':' || CAST(user_id AS VARCHAR)), 1, 1))
                - 1 AS INTEGER) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cell
    FROM events, rows_
    GROUP BY 1, 2
    """,
)
def q121_stream_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch maintained BY THE STREAM (the ingest-side twin of
    q114): each micro-batch folds its events into the 4x16 counter grid
    via a streaming groupBy — the grid is the only state, fixed-size
    regardless of stream length, and complete-mode emission equals the
    batch grid on any chunking (the mergeability q114's pytest proves is
    exactly why streaming partial aggregation is correct here). User
    frequencies over an unbounded event stream in 64 integers."""
    stream = stream_events(spark, sf_dir)
    depth = F.array(*[F.lit(j).cast("long") for j in range(4)])
    cells = (
        stream.select(F.col("user_id").cast("string").alias("u"))
        .select(F.explode(depth).alias("j"), "u")
        .select(
            "j",
            F.expr(
                "instr('0123456789abcdef', substr(md5(j || ':' || u), 1, 1))"
                " - 1"
            ).cast("int").alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("cell"))
    )
    return run_to_memory(cells, mode="complete")


@query(
    "q265a_stream_hll_registers",
    oracle="""
    SELECT event_type,
           substr(md5(CAST(user_id AS VARCHAR)), 1, 2) AS bucket,
           CAST(MAX(
               4 * (29 - len(ltrim(substr(md5(CAST(user_id AS VARCHAR)), 3, 29), '0')))
               + CASE WHEN ltrim(substr(md5(CAST(user_id AS VARCHAR)), 3, 29), '0') = ''
                      THEN 0
                      ELSE CASE WHEN instr('0123456789abcdef',
                                substr(ltrim(substr(md5(CAST(user_id AS VARCHAR)), 3, 29), '0'), 1, 1)) - 1 >= 8 THEN 0
                                WHEN instr('0123456789abcdef',
                                substr(ltrim(substr(md5(CAST(user_id AS VARCHAR)), 3, 29), '0'), 1, 1)) - 1 >= 4 THEN 1
                                WHEN instr('0123456789abcdef',
                                substr(ltrim(substr(md5(CAST(user_id AS VARCHAR)), 3, 29), '0'), 1, 1)) - 1 >= 2 THEN 2
                                ELSE 3 END
                 END + 1) AS BIGINT) AS m_j
    FROM events GROUP BY event_type, substr(md5(CAST(user_id AS VARCHAR)), 1, 2)
    """,
)
def q265a_stream_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog registers maintained BY THE STREAM (the ingest-side
    twin of q118/q265): each micro-batch folds its user hashes into the
    per-event-type register table via a streaming groupBy MAX — the
    state is at most |event_type| x 256 integers regardless of stream
    length, and complete-mode emission equals the batch register table
    on ANY chunking because MAX is the mergeable combine (the same
    property q265 exploits to roll hour sketches up to days). Distinct
    users over an unbounded event stream in fixed memory; the q118
    estimate math runs on this table whenever a reader wants a number."""
    from hive_reflex_spark.operators.analytics import hll_registers

    stream = stream_events(spark, sf_dir)
    regs = hll_registers(
        stream.select("event_type", "user_id"), ["event_type"]
    )
    return run_to_memory(regs, mode="complete")


def _kmv_stream_oracle() -> str:
    # import-safe: built at module-import time, so it must not touch
    # the operators package (operators/__init__ would finalize the
    # registry order mid-registration under streaming-first import)
    from hive_reflex_spark.functions import (
        KMV_K,
        duck_dyadic_md5_uniform,
    )

    _KMV_U_SQL = duck_dyadic_md5_uniform("user_id")

    return f"""
    WITH ev AS (SELECT DISTINCT CAST(ts AS DATE) AS dday, user_id
                FROM events),
         keyed AS (SELECT dday, user_id, {_KMV_U_SQL} AS u FROM ev)
    SELECT dday, user_id, ROUND(u, 9) AS u FROM (
        SELECT dday, user_id, u,
               ROW_NUMBER() OVER (PARTITION BY dday
                                  ORDER BY u, user_id) AS rn
        FROM keyed) WHERE rn <= {KMV_K}
    """


@query("q268a_stream_kmv", oracle=_kmv_stream_oracle())
def q268a_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketches maintained BY THE STREAM — the third ingest-side
    sketch twin (q121 count-min grid, q265a HLL registers, now the
    k-minimum-values bottom-k): per active day, the state store holds
    the k smallest (hash-uniform, user_id) pairs ever seen — 2k scalars
    per day regardless of stream length — and each micro-batch folds
    its arrivals in with one bounded merge. Unlike q250a's novelty
    (which needs an ingestion-ordered replay), KMV's merge is fully
    ORDER-INDEPENDENT: the final state equals the batch-built sketch on
    ANY chunking — the mergeability q268 exploits pairwise, exercised
    here by the stream's arbitrary file-split batching. The emitted
    sketch supports the full q268 report (union AND intersection
    estimates) without ever rescanning the stream's history.

    Determinism contract: every final sketch member was in the running
    sketch from its arrival onward (bottom-k state only evicts, never
    readmits), so the k-smallest cut over all emitted rows equals the
    final state — which the oracle computes as the batch sketch."""
    from hive_reflex_spark.operators.analytics import KMV_K, _kmv_u_spark

    stream = stream_events(spark, sf_dir)
    keyed = stream.select(
        F.col("ts").cast("date").alias("dday"),
        "user_id",
        _kmv_u_spark().alias("u"),
    )

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            us, ids = state.get
            members = {int(i): float(v) for v, i in zip(us, ids)}
        else:
            members = {}
        for pdf in pdfs:
            for uid, uval in zip(pdf["user_id"], pdf["u"]):
                members[int(uid)] = float(uval)
        if not members:
            return
        smallest = sorted(
            ((v, i) for i, v in members.items())
        )[:KMV_K]
        state.update((
            [v for v, _ in smallest],
            [i for _, i in smallest],
        ))
        yield pd.DataFrame(
            {
                "dday": [key[0]] * len(smallest),
                "user_id": [i for _, i in smallest],
                "u": [v for v, _ in smallest],
            }
        )

    out = keyed.groupBy("dday").applyInPandasWithState(
        fn,
        outputStructType="dday date, user_id long, u double",
        stateStructType="us array<double>, ids array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = run_to_memory(out, mode="update").dropDuplicates(
        ["dday", "user_id"]
    )
    w = Window.partitionBy("dday").orderBy("u", "user_id")
    return (
        emitted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("dday", "user_id", F.round("u", 9).alias("u"))
    )


# ---------------------------------------------------------------------------
# Stream-STREAM LEFT OUTER interval join — watermark-gated null emission
# ---------------------------------------------------------------------------


@query(
    "q147_stream_left_outer_join",
    oracle="""
    WITH err AS (SELECT event_id AS error_event_id, user_id, ts AS err_ts
                 FROM events WHERE event_type = 'error'),
    clk AS (SELECT event_id AS click_event_id, user_id AS click_user_id,
                   ts AS click_ts
            FROM events WHERE event_type = 'click'),
    wm AS (SELECT LEAST(
               (SELECT MAX(ts) FROM events WHERE event_type = 'error'),
               (SELECT MAX(ts) FROM events WHERE event_type = 'click'))
               - INTERVAL 1 HOUR AS w),
    matched AS (
        SELECT e.user_id, e.error_event_id, c.click_event_id
        FROM err e JOIN clk c
          ON e.user_id = c.click_user_id
         AND c.click_ts >= e.err_ts - INTERVAL 24 HOURS
         AND c.click_ts < e.err_ts),
    unmatched AS (
        SELECT e.user_id, e.error_event_id,
               CAST(NULL AS BIGINT) AS click_event_id
        FROM err e, wm
        WHERE NOT EXISTS (
                SELECT 1 FROM clk c
                WHERE c.click_user_id = e.user_id
                  AND c.click_ts >= e.err_ts - INTERVAL 24 HOURS
                  AND c.click_ts < e.err_ts)
          AND e.err_ts < wm.w)
    SELECT * FROM matched UNION ALL SELECT * FROM unmatched
    """,
)
def q147_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-STREAM LEFT OUTER interval join — q101's correlation with
    the harder half of the semantics: an error with NO click in its
    24-hour lookback must still emit (with nulls), but only once the
    watermark proves no matching click can ever arrive. Matches stream
    out as they join; a null row emits when the global watermark
    (min over both inputs' max event time, minus the 1-hour delay)
    passes the error's timestamp and its join state is evicted — so on
    the bounded availableNow replay the result equals the batch left
    join RESTRICTED to errors older than the final watermark, which is
    exactly what the oracle computes (the q64 final-watermark
    technique, applied to outer-join state eviction).

    Scale: identical bounded-state shape as q101 — state is the
    interval plus the watermark delay per side, independent of stream
    length; the null-emission rule is what lets Spark drop error state
    instead of holding every unmatched row forever."""
    errors = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_event_id"),
            "user_id",
            F.col("ts").alias("err_ts"),
        )
        .withWatermark("err_ts", "1 hour")
    )
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_event_id"),
            F.col("user_id").alias("click_user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    joined = errors.join(
        clicks,
        (F.col("user_id") == F.col("click_user_id"))
        & (F.col("click_ts") >= F.col("err_ts") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("click_ts") < F.col("err_ts")),
        "left_outer",
    ).select("user_id", "error_event_id", "click_event_id")
    return run_to_memory(joined, mode="append")

@query(
    "q171_incremental_lsh_index",
    oracle="""
    WITH dsh AS (
        SELECT DISTINCT doc_id,
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
             LATERAL unnest(range(1, GREATEST(len(ws) - 1, 1))) AS t(i)
        WHERE len(ws) >= 3),
    mh AS (
        SELECT doc_id, CAST(seed AS INTEGER) AS seed,
               MIN(CASE WHEN seed < 4 THEN substr(h1, seed * 8 + 1, 8)
                        ELSE substr(h2, (seed - 4) * 8 + 1, 8) END) AS sig
        FROM (SELECT doc_id, md5(shingle) AS h1,
                     md5(reverse(shingle)) AS h2 FROM dsh),
             (SELECT unnest(range(8)) AS seed) seeds
        GROUP BY doc_id, seed)
    SELECT doc_id, CAST(seed // 2 AS INTEGER) AS band,
           MIN(CASE WHEN seed % 2 = 0 THEN sig END)
           || MIN(CASE WHEN seed % 2 = 1 THEN sig END) AS band_sig
    FROM mh GROUP BY doc_id, seed // 2
    """,
)
def q171_incremental_lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of the LSH dedup index: the corpus arrives
    in micro-batches and each batch APPENDS its own (doc_id, band,
    band_sig) rows to the index — correct with no merge step because a
    signature is a pure function of one document's shingle set
    (`dedup.minhash_from_shingles`), so chunking cannot change any row.
    This is how a 100 TB curation deployment keeps q49/q94's index fresh
    as crawls land: per-batch signature compute + blind append; only the
    candidate JOIN ever sees the global index. The oracle recomputes the
    full index from scratch — the streamed union must hash-match it on
    any chunking."""
    import hashlib
    import shutil
    import tempfile

    from hive_reflex_spark.io import read_table
    from hive_reflex_spark.operators.dedup import (
        bands_from_minhash,
        minhash_from_shingles,
        shingles_of_docs,
    )

    work = os.path.join(
        tempfile.gettempdir(),
        f"hrs_lshidx_{os.getpid()}_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    chunk_dir = os.path.join(work, "chunks")
    index_dir = os.path.join(work, "index")
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.repartitionByRange(4, "doc_id").write.parquet(chunk_dir)

    def append_index(batch_df: DataFrame, epoch_id: int) -> None:
        bands = bands_from_minhash(
            minhash_from_shingles(shingles_of_docs(batch_df))
        ).select("doc_id", F.col("band").cast("int").alias("band"), "band_sig")
        bands.write.mode("append").parquet(index_dir)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(chunk_dir)
    )
    q = (
        stream.writeStream.foreachBatch(append_index)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(chunk_dir, ignore_errors=True)
    shutil.rmtree(os.path.join(work, "ckpt"), ignore_errors=True)
    return spark.read.parquet(index_dir)

@query(
    "q172_log_shipping_roundtrip",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(MIN(event_id) AS BIGINT) AS min_event,
           CAST(MAX(event_id) AS BIGINT) AS max_event,
           ROUND(CAST(SUM(CAST(ROUND(value * 1000000) AS BIGINT)) AS BIGINT)
                 / 1000000.0, 6) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q172_log_shipping_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 batched log shipping driven end-to-end: the event stream
    flushes as per-epoch JSON batch directories via foreachBatch
    (`batched_log_shipping`, the exactly-once atomic-directory sink of
    `tools/ai_feedback.py:88-118`), then EVERY shipped file is read back
    and rolled up. The oracle computes the rollup from the parquet
    source, so a dropped epoch, duplicated flush, or JSON precision loss
    fails the hash — shipping must be a lossless partition of the
    stream on any chunking."""
    import hashlib
    import shutil
    import tempfile

    work = os.path.join(
        tempfile.gettempdir(),
        f"hrs_logship_{os.getpid()}_"
        f"{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}",
    )
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    batched_log_shipping(spark, sf_dir, work)
    back = spark.read.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string, epoch long"
    ).json(os.path.join(work, "batch_*"))
    return back.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("event_id").alias("min_event"),
        F.max("event_id").alias("max_event"),
        F.round(
            F.sum(F.round(F.col("value") * 1_000_000).cast("long"))
            / 1_000_000.0,
            6,
        ).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Streaming n-gram novelty (q250's ingest-side twin)
# ---------------------------------------------------------------------------


def stream_documents(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> DataFrame:
    """Documents replayed as an ingestion-ordered stream: the corpus is
    staged once as ``n_chunks`` doc_id-range files (written in range
    order, so the file source's oldest-first pickup replays ingestion
    order) and read with maxFilesPerTrigger=1 — one corpus slice per
    micro-batch, the batch clock the OTA loop also uses."""
    import hashlib

    import tempfile

    from hive_reflex_spark.io import read_table

    work = os.path.join(
        tempfile.gettempdir(),
        f"hrs_docstream_{hashlib.md5(f'{sf_dir}:{n_chunks}'.encode()).hexdigest()[:10]}",
    )
    if not os.path.exists(os.path.join(work, "_STAGED")):
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        os.makedirs(work)
        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
        span = (int(hi) - int(lo) + n_chunks) // n_chunks
        for i in range(n_chunks):  # sequential writes → mtime order
            docs.filter(
                (F.col("doc_id") >= int(lo) + i * span)
                & (F.col("doc_id") < int(lo) + (i + 1) * span)
            ).coalesce(1).write.mode("append").parquet(work)
        open(os.path.join(work, "_STAGED"), "w").close()
    return (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(work)
    )


@query(
    "q250a_stream_novelty",
    oracle="""
    WITH words AS (SELECT doc_id, pos, w FROM (
             SELECT doc_id,
                    unnest(range(len(string_split(text, ' ')))) AS pos,
                    unnest(string_split(text, ' ')) AS w
             FROM documents)),
         dsh AS (SELECT DISTINCT doc_id, shingle FROM (
             SELECT doc_id, w || ' ' || w1 || ' ' || w2 AS shingle
             FROM (SELECT doc_id, w,
                          lead(w, 1) OVER win AS w1,
                          lead(w, 2) OVER win AS w2
                   FROM words
                   WINDOW win AS (PARTITION BY doc_id ORDER BY pos))
             WHERE w2 IS NOT NULL)),
         first_seen AS (SELECT shingle, MIN(doc_id) AS first_doc
                        FROM dsh GROUP BY shingle),
         per_doc AS (SELECT d.doc_id,
                            CAST(COUNT(*) AS BIGINT) AS n_shingles,
                            CAST(SUM(CASE WHEN f.first_doc = d.doc_id
                                          THEN 1 ELSE 0 END) AS BIGINT)
                                AS n_novel
                     FROM dsh d JOIN first_seen f USING (shingle)
                     GROUP BY d.doc_id)
    SELECT doc.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_shingles) AS BIGINT) AS total_shingles,
           CAST(SUM(n_novel) AS BIGINT) AS total_novel,
           ROUND(SUM(n_novel) * 1.0 / SUM(n_shingles), 6) AS novelty
    FROM per_doc pd JOIN documents doc USING (doc_id)
    GROUP BY doc.source
    """,
)
def q250a_stream_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q250's novelty rate computed INGEST-SIDE over the document
    stream (the builder-named r8 refinement): per-shingle state in the
    state store records the first-seen doc; each arriving (doc,
    shingle) pair is judged novel-or-derivative AT ARRIVAL, so a
    curation pipeline can down-weight copy-heavy sources while
    ingesting instead of waiting for a corpus-wide batch pass.

    Determinism contract: the replay is ingestion-ordered (doc_id-range
    chunks), and within a batch the minimum doc_id sharing a shingle
    takes the novelty — so the at-arrival flags equal q250's batch
    min(doc_id) first-occurrence exactly, and the per-source rollup
    hash-matches the IDENTICAL oracle as q250.

    Scale (100 TB): the stateful op shuffles on shingle ONCE; state is
    one long per distinct shingle in RocksDB (the same key space the
    batch min-reduce shuffles), GC-able by state TTL when novelty only
    needs a trailing horizon; the per-batch work is Arrow-batched. The
    rollup input is one row per distinct (doc, shingle) — identical
    volume to q250's join output."""
    docs = stream_documents(spark, sf_dir)
    with_tokens = docs.select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    )
    shingles = F.expr(
        "CASE WHEN size(ws) >= 3 THEN "
        "transform(sequence(0, size(ws) - 3), "
        "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) "
        "ELSE array() END"
    )
    sh = with_tokens.select(
        "doc_id", "source", F.explode(shingles).alias("shingle")
    )

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        seen = state.get[0] if state.exists else None
        docs_in_batch: dict[int, str] = {}
        for pdf in pdfs:
            for d, s in zip(pdf["doc_id"], pdf["source"]):
                docs_in_batch.setdefault(int(d), s)
        if not docs_in_batch:
            return
        batch_min = min(docs_in_batch)
        if seen is None:
            state.update((batch_min,))
        ids = sorted(docs_in_batch)
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "source": [docs_in_batch[d] for d in ids],
                "novel": [seen is None and d == batch_min for d in ids],
            }
        )

    out = sh.groupBy("shingle").applyInPandasWithState(
        fn,
        outputStructType="doc_id long, source string, novel boolean",
        stateStructType="first_doc long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    emitted = run_to_memory(out, mode="update")
    return emitted.groupBy("source").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count("*").alias("total_shingles"),
        F.sum(F.col("novel").cast("long")).alias("total_novel"),
        F.round(
            F.sum(F.col("novel").cast("long")) * 1.0 / F.count("*"), 6
        ).alias("novelty"),
    )


def _cs_stream_oracle() -> str:
    # import-safe: see _kmv_stream_oracle
    from hive_reflex_spark.functions import _CS_ROWS_VALUES, _cs_keyed_sql

    return f"""
    WITH rows_j AS (SELECT CAST(j AS BIGINT) AS j
                    FROM (VALUES {_CS_ROWS_VALUES}) t(j)),
         keyed AS (SELECT rows_j.j, {_cs_keyed_sql("e.user_id")}
                   FROM events e, rows_j)
    SELECT j, bucket, CAST(SUM(sgn) AS BIGINT) AS c
    FROM keyed GROUP BY j, bucket
    """


@query("q290a_stream_count_sketch", oracle=_cs_stream_oracle())
def q290a_stream_count_sketch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CountSketch grid maintained BY THE STREAM — the fourth
    ingest-side sketch twin (q121 CMS grid, q265a HLL registers,
    q268a KMV bottom-k, now the SIGNED grid): each event adds its
    +/-1 sign into one of 4 x 16 counters via a streaming groupBy
    SUM, so the state is 64 integers for an unbounded stream and —
    signed sums being fully order-independent — the complete-mode
    emission equals the batch grid on ANY chunking. The turnstile
    story is why this twin matters: of the family, only CountSketch
    also absorbs RETRACTIONS (a CDC delete is one more row with the
    sign flipped), giving unbiased frequency estimates over a
    correction-carrying stream where CMS only ever grows. q290 runs
    its median-estimate readout against exactly this table."""
    from hive_reflex_spark.functions import cs_keyed

    stream = stream_events(spark, sf_dir)
    keyed = cs_keyed(stream.select("user_id")).select(
        "j", "bucket", "sgn"
    )
    grid = keyed.groupBy("j", "bucket").agg(
        F.sum("sgn").cast("long").alias("c")
    )
    return run_to_memory(grid, mode="complete")
