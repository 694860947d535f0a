#!/usr/bin/env python3
"""Local approximation of the driver's correctness harness.

Runs every registered query in Spark AND its DuckDB oracle on the same
parquet tables, canonicalizes both results (columns sorted by name, rows
sorted, floats rounded), and reports row-count / schema-kind / value
matches. Use before committing any new query.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from hive_reflex_spark.io import TABLES
from hive_reflex_spark.session import get_spark

ROUND = 9


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, ROUND)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), ROUND)
    except ImportError:
        pass
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(map(str, t)))


def canon_arrow_type(t) -> str:
    """Canonical name for an arrow dtype, normalizing representation
    differences that are PROVEN benign across engines while keeping the
    dangerous ones:

    - large_* string/binary/list variants and timestamp unit/tz: engine
      export details, normalized;
    - integer width is compared EXACTLY (r10 verdict #5): the 23 legacy
      width diffs the old normalization tolerated are all cast away and
      the registry-wide raw-captured scan reports 0 diffs — keeping the
      width window open would silently re-admit the class, so int32 vs
      int64 is now a sweep FAILURE, nested occurrences included;
    - kept fatal: decimal (any precision — the class that flipped the
      driver hash on q273: Spark decimal(6,6) vs DuckDB decimal128(7,6),
      identical values), int-vs-float, and any cross-kind difference."""
    import pyarrow as pa

    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_integer(t):
        return str(t)  # exact width + signedness: int8..int64, uint8..
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_float64(t):
        return "double"
    if pa.types.is_float32(t):
        return "float"
    if (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    ):
        return f"list<{canon_arrow_type(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{canon_arrow_type(t.field(i).type)}"
            for i in range(t.num_fields)
        )
        return f"struct<{inner}>"
    return str(t)


def arrow_dtype_check(sdf, con, oracle_sql):
    """Compare arrow-level dtypes between Spark and DuckDB, and reject
    DECIMAL output columns outright.

    The driver's value hash is arrow-type-sensitive; value-level
    canonicalization (floats rounded, Decimal -> float) passed q273 in
    r8 while the driver hash failed on a decimal-precision mismatch.
    Spark's arrow schema comes from the plan (no job); DuckDB's from a
    LIMIT-0 arrow fetch. Returns a list of failure strings; empty = ok.
    Integer-width mismatches are FAILURES since r11 (the 23 legacy diffs
    are cast away and the registry scan reports 0 — canon_arrow_type
    keeps exact widths, so they surface through the ordinary dtype diff
    below).
    """
    from pyspark.sql.pandas.types import to_arrow_schema

    fails = []
    s_schema = to_arrow_schema(sdf.schema)
    d_schema = con.execute(
        f"SELECT * FROM ({oracle_sql}) __dtype_probe LIMIT 0"
    ).fetch_arrow_table().schema
    s_types = {f.name: canon_arrow_type(f.type) for f in s_schema}
    d_types = {f.name: canon_arrow_type(f.type) for f in d_schema}
    for side, types in (("spark", s_types), ("duck", d_types)):
        # substring, not prefix: nested decimals (list<decimal(7,6)>,
        # struct<x:decimal(...)>) are the same driver-hash hazard
        decs = [c for c, t in sorted(types.items()) if "decimal(" in t]
        if decs:
            fails.append(
                f"DECIMAL output columns are banned (registry rule; driver "
                f"hash is precision-sensitive): {side} {decs} — CAST to "
                f"DOUBLE or emit integer units"
            )
    if s_types != d_types:
        diff = {
            c: (s_types.get(c), d_types.get(c))
            for c in sorted(set(s_types) | set(d_types))
            if s_types.get(c) != d_types.get(c)
        }
        fails.append(f"arrow dtypes differ (spark, duck): {diff}")
    return fails


def kind(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return type(v).__name__


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_noracle = 0
    for name in sorted(qs):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"----  {name}: no oracle (rows-only): {len(srows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            n_noracle += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue

        sc, sr = canon_rows(scols, srows)
        dc, dr = canon_rows(dcols, drows)
        ok = True
        try:
            dtype_fails = arrow_dtype_check(sdf, con, oracles[name])
            dtype_warns = []
        except ImportError as ex:
            # environment-class probe problem (pyarrow/arrow-bridge
            # missing): the value comparison below still runs, so WARN
            # rather than flipping the whole sweep red (ADVICE r9)
            dtype_fails, dtype_warns = [], [f"dtype probe error (infra): {ex}"]
        except Exception as ex:  # noqa: BLE001
            # any OTHER probe exception stays a FAILURE: an output type
            # to_arrow_schema cannot express is itself a driver-hash
            # hazard, and swallowing it would silently disable the
            # decimal ban this guard exists for (r8 q273)
            dtype_fails, dtype_warns = [f"dtype probe error: {ex}"], []
        for msg in dtype_warns:
            print(f"WARN {name}: {msg}")
        if dtype_fails:
            for msg in dtype_fails:
                print(f"FAIL {name}: {msg}")
            ok = False
        elif sc != dc:
            print(f"FAIL {name}: columns differ: spark={sc} duck={dc}")
            ok = False
        elif len(sr) != len(dr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duck={len(dr)}")
            ok = False
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(sr)} rows differ; first: "
                  f"spark={diffs[0][0]} duck={diffs[0][1]}")
            ok = False
        else:
            skinds = [kind(v) for v in (sr[0] if sr else [])]
            dkinds = [kind(v) for v in (dr[0] if dr else [])]
            if sr and skinds != dkinds:
                print(f"WARN {name}: value kinds differ: {skinds} vs {dkinds}")
            print(f"PASS {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
