#!/usr/bin/env python3
"""Synthesize a larger benchmark SF by replicating sf0.1 with key shifts.

The driver ships sf{0.001,0.01,0.1}; the per-job scheduler floor dominates
7 of 15 headline ratios at sf0.1 (BASELINE.md caveat). This builds an
sf1-equivalent under /tmp for a one-off plan-level bench: every fact table
is replicated REPLICAS× with non-overlapping keys, and document text is
word-interleaved with a replica token so the dedup tier sees a genuinely
10× corpus (same dup rate as the original) instead of 10 exact copies of
every document. FOR BENCH ONLY — correctness always runs on the driver's
own fixtures.

Usage: python3 scripts/make_scaled_sf.py [src_dir] [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hrs_sf1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def src_t(t: str) -> str:
        return f"'{os.path.join(src, t)}.parquet'"

    def write(t: str, sql: str) -> None:
        path = os.path.join(out, f"{t}.parquet")
        con.execute(
            f"COPY ({sql}) TO '{path}' (FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{path}'").fetchone()[0]
        print(f"{t}: {n} rows")

    # dimensions: copy verbatim
    for t in ("region", "nation", "customer", "supplier", "part"):
        write(t, f"SELECT * FROM {src_t(t)}")

    reps_sql = f"(SELECT unnest(range({reps})) AS r)"

    ok_max = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM {src_t('orders')}"
    ).fetchone()[0]
    write(
        "orders",
        f"SELECT o_orderkey + r * {ok_max} AS o_orderkey, "
        "o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
        "o_orderpriority "
        f"FROM {src_t('orders')}, {reps_sql}",
    )
    write(
        "lineitem",
        f"SELECT l_orderkey + r * {ok_max} AS l_orderkey, "
        "l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        f"FROM {src_t('lineitem')}, {reps_sql}",
    )

    ev_max, us_max = con.execute(
        f"SELECT MAX(event_id) + 1, MAX(user_id) + 1 FROM {src_t('events')}"
    ).fetchone()
    write(
        "events",
        f"SELECT event_id + r * {ev_max} AS event_id, ts, "
        f"user_id + r * {us_max} AS user_id, event_type, value, props "
        f"FROM {src_t('events')}, {reps_sql}",
    )

    doc_max = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM {src_t('documents')}"
    ).fetchone()[0]
    doc_cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM {src_t('documents')}"
        ).fetchall()
    ]
    rest = ", ".join(
        c for c in doc_cols if c not in ("doc_id", "text", "n_chars")
    )
    write(
        "documents",
        f"SELECT doc_id + r * {doc_max} AS doc_id, "
        "CASE WHEN r = 0 THEN text ELSE "
        "replace(text, ' ', ' z' || CAST(r AS VARCHAR) || ' ') END AS text, "
        "CAST(len(CASE WHEN r = 0 THEN text ELSE "
        "replace(text, ' ', ' z' || CAST(r AS VARCHAR) || ' ') END) "
        f"AS BIGINT) AS n_chars, {rest} "
        f"FROM {src_t('documents')}, {reps_sql}",
    )

    vec_max = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM {src_t('embeddings')}"
    ).fetchone()[0]
    emb_cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM {src_t('embeddings')}"
        ).fetchall()
    ]
    erest = ", ".join(c for c in emb_cols if c != "vec_id")
    write(
        "embeddings",
        f"SELECT vec_id + r * {vec_max} AS vec_id, {erest} "
        f"FROM {src_t('embeddings')}, {reps_sql}",
    )
    total = sum(
        os.path.getsize(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    print(f"total bytes: {total / (1 << 20):.1f} MiB -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
