#!/usr/bin/env python3
"""Scaled tensor-tier bench: the coordinate matmul / attention plans at
sf-proportional sizes, Spark vs DuckDB (verdict r5 item 5).

The registered q30/q66 run on fixture-scale tensors at every SF (24
vectors / one 4x8 attention block) so their ratios measure Spark's job
floor, not the plan. This script runs the SAME plan shapes at sizes
proportional to the sf1 embedding corpus (20k vectors x 64 dims):

- gram_coord  : q30's coordinate-join Gram matrix over N vectors
- gram_array  : the array/broadcast alternative (zip_with dot product
                over a BroadcastNestedLoopJoin pair stream) — the
                candidate 100-TB plan when one side fits a broadcast
- attn_coord  : q66's full attention chain (scores -> softmax -> AV)
                at N_Q x N_KV

Every variant reduces to an exact-integer checksum (per-term ROUND to
1e-9 units, BIGINT sums) so all Spark variants AND the DuckDB twin must
agree bit-for-bit — the bench is also a scale-correctness check.

Usage: bench_tensor_scale.py [sf_dir] [n_gram] [n_q] [n_kv]
Defaults: /tmp/hrs_sf1 2048 4096 512
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hive_reflex_spark.io import read_table
from hive_reflex_spark.session import get_spark

U9 = 1_000_000_000


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hrs_sf1"
    n_gram = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    n_kv = int(sys.argv[4]) if len(sys.argv) > 4 else 512
    kv_lo, kv_hi = n_q, n_q + n_kv  # disjoint query/key id ranges
    sqrt_d = 8.0  # sqrt(64), as in q66

    spark = get_spark("tensor-scale-bench")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW emb AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'embeddings.parquet')}'"
    )
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'events.parquet')}'"
    )
    duck_coords = """(
        SELECT vec_id, CAST(dim AS INTEGER) AS dim, CAST(v AS DOUBLE) AS v
        FROM (SELECT vec_id, unnest(range(len(embedding))) AS dim,
                     unnest(embedding) AS v
              FROM emb))"""

    def coords(lo: int, hi: int):
        return (
            read_table(spark, sf_dir, "embeddings")
            .filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
            .select("vec_id", F.posexplode("embedding").alias("dim", "v"))
            .withColumn("v", F.col("v").cast("double"))
        )

    results: dict[str, dict] = {}

    def run(name: str, fn):
        t0 = time.time()
        n_rows, chk = fn()
        results[name] = {
            "sec": round(time.time() - t0, 3),
            "rows": int(n_rows),
            "checksum": int(chk),
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    # --- Gram: coordinate-join plan (q30's registered shape) -------------
    def gram_coord():
        c = coords(0, n_gram)
        a = c.select(
            F.col("vec_id").alias("i"),
            F.col("dim").alias("k"),
            F.col("v").alias("av"),
        )
        b = c.select(
            F.col("vec_id").alias("j"),
            F.col("dim").alias("k"),
            F.col("v").alias("bv"),
        )
        dots = (
            a.join(b, "k")
            .filter(F.col("i") <= F.col("j"))
            .groupBy("i", "j")
            .agg(
                F.sum(
                    F.round(F.col("av") * F.col("bv") * U9).cast("long")
                ).alias("dot_u")
            )
        )
        r = dots.agg(F.count("*"), F.sum("dot_u")).collect()[0]
        return r[0], r[1]

    # --- Gram: array/broadcast plan (candidate scale plan) ---------------
    def gram_array():
        emb = (
            read_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < n_gram)
            .select("vec_id", "embedding")
        )
        a = emb.select(F.col("vec_id").alias("i"), F.col("embedding").alias("ea"))
        b = emb.select(F.col("vec_id").alias("j"), F.col("embedding").alias("eb"))
        dots = a.join(F.broadcast(b), F.col("i") <= F.col("j")).select(
            F.aggregate(
                F.zip_with(
                    "ea",
                    "eb",
                    lambda x, y: F.round(
                        x.cast("double") * y.cast("double") * U9
                    ).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot_u")
        )
        r = dots.agg(F.count("*"), F.sum("dot_u")).collect()[0]
        return r[0], r[1]

    # --- Gram: numpy-blocked plan (Arrow batches x broadcast factor) ------
    def gram_numpy():
        import numpy as np
        import pandas as pd

        emb = (
            read_table(spark, sf_dir, "embeddings")
            .filter(F.col("vec_id") < n_gram)
            .select("vec_id", "embedding")
        )
        rows = emb.collect()  # bounded: one factor matrix (n_gram x 64)
        ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        b_ids = spark.sparkContext.broadcast(ids)
        b_mat = spark.sparkContext.broadcast(mat)

        def blocks(batches):
            B = b_mat.value
            Bi = b_ids.value
            for pdf in batches:
                A = np.array(list(pdf["embedding"]), dtype=np.float64)
                Ai = pdf["vec_id"].to_numpy(dtype=np.int64)
                # exact per-term rounding to 1e-9 units, matmul-blocked:
                # C = sum_k round(outer(A[:,k], B[:,k]) * 1e9).
                # NB: np.round is half-EVEN; Spark/DuckDB ROUND are
                # half-away-from-zero — emulate with sign*floor(|x|+0.5)
                # or one .5-landing term breaks checksum parity by 1.
                C = np.zeros((len(Ai), len(Bi)), dtype=np.float64)
                for k in range(A.shape[1]):
                    P = np.outer(A[:, k], B[:, k]) * U9
                    C += np.sign(P) * np.floor(np.abs(P) + 0.5)
                ii, jj = np.nonzero(Ai[:, None] <= Bi[None, :])
                yield pd.DataFrame(
                    {
                        "i": Ai[ii],
                        "j": Bi[jj],
                        "dot_u": C[ii, jj].astype(np.int64),
                    }
                )

        dots = emb.repartition(32).mapInPandas(
            blocks, "i long, j long, dot_u long"
        )
        r = dots.agg(F.count("*"), F.sum("dot_u")).collect()[0]
        return r[0], r[1]

    def gram_duck():
        r = con.execute(
            f"""
            WITH c AS (SELECT * FROM {duck_coords} WHERE vec_id < {n_gram}),
            dots AS (
                SELECT a.vec_id AS i, b.vec_id AS j,
                       CAST(SUM(CAST(ROUND(a.v * b.v * {U9}) AS BIGINT))
                           AS BIGINT) AS dot_u
                FROM c a JOIN c b
                  ON a.dim = b.dim AND a.vec_id <= b.vec_id
                GROUP BY 1, 2)
            SELECT COUNT(*), CAST(SUM(dot_u) AS BIGINT) FROM dots
            """
        ).fetchone()
        return r[0], r[1]

    # --- Attention: q66's registered chain at scale -----------------------
    def attn_coord():
        q = (
            coords(0, n_q)
            .select(F.col("vec_id").alias("qid"), "dim", "v")
            .repartition("qid")
        )
        kv = coords(kv_lo, kv_hi).select(
            F.col("vec_id").alias("kid"), "dim", "v"
        )
        scores = (
            q.alias("q")
            .join(F.broadcast(kv.alias("k")), "dim")
            .groupBy("qid", "kid")
            .agg(
                (
                    F.sum(
                        F.round(
                            F.col("q.v") * F.col("k.v") / sqrt_d * U9
                        ).cast("long")
                    )
                    / float(U9)
                ).alias("s")
            )
        )
        wq = Window.partitionBy("qid")
        e = F.round(F.exp(F.col("s") - F.max("s").over(wq)), 6)
        attn = scores.withColumn("e", e).withColumn(
            "w",
            F.col("e")
            / (
                F.sum(F.round(F.col("e") * 1_000_000).cast("long")).over(wq)
                / 1_000_000.0
            ),
        )
        out = (
            attn.select("qid", "kid", "w")
            .join(F.broadcast(kv), "kid")
            .groupBy("qid", F.col("dim").alias("out_dim"))
            .agg(
                # the registered queries' exact_sum_round6 half-up:
                # out_v is an exact 1e-6 multiple on every engine
                F.expr(
                    "cast(floor((sum(cast(round(w * v * 1000000000) as"
                    " bigint)) + 500) / 1000.0) as bigint) / 1000000.0"
                ).alias("out_v")
            )
        )
        r = out.agg(
            F.count("*"),
            F.sum(F.round(F.col("out_v") * 1_000_000).cast("long")),
        ).collect()[0]
        return r[0], r[1]

    # --- Attention: numpy-blocked tier (nn.attention_blocked) -------------
    def attn_blocked():
        from hive_reflex_spark.operators.nn import attention_blocked

        emb = read_table(spark, sf_dir, "embeddings")
        q = emb.filter(F.col("vec_id") < n_q).select(
            F.col("vec_id").alias("qid"), "embedding"
        )
        kv_rows = [
            (r["vec_id"], r["embedding"])
            for r in emb.filter(
                (F.col("vec_id") >= kv_lo) & (F.col("vec_id") < kv_hi)
            )
            .select("vec_id", "embedding")
            .collect()
        ]
        out = attention_blocked(q.repartition(32), kv_rows, sqrt_d)
        r = out.agg(
            F.count("*"),
            F.sum(F.round(F.col("out_v") * 1_000_000).cast("long")),
        ).collect()[0]
        return r[0], r[1]

    def attn_duck():
        r = con.execute(
            f"""
            WITH coords AS (SELECT * FROM {duck_coords}),
            q AS (SELECT vec_id AS qid, dim, v FROM coords
                  WHERE vec_id < {n_q}),
            kv AS (SELECT vec_id AS kid, dim, v FROM coords
                   WHERE vec_id >= {kv_lo} AND vec_id < {kv_hi}),
            scores AS (SELECT qid, kid,
                              CAST(SUM(CAST(ROUND(q.v * kv.v / {sqrt_d}
                                   * {U9}) AS BIGINT)) AS BIGINT)
                                  / {U9}.0 AS s
                       FROM q JOIN kv USING (dim) GROUP BY qid, kid),
            expd AS (SELECT qid, kid,
                            ROUND(exp(s - MAX(s) OVER (PARTITION BY qid)), 6)
                                AS e
                     FROM scores),
            attn AS (SELECT qid, kid,
                            e / (CAST(SUM(CAST(ROUND(e * 1000000) AS BIGINT))
                                 OVER (PARTITION BY qid) AS BIGINT)
                                 / 1000000.0) AS w
                     FROM expd),
            out AS (SELECT qid, dim AS out_dim,
                           CAST(FLOOR((CAST(SUM(CAST(ROUND(attn.w * kv.v
                                * {U9}) AS BIGINT)) AS BIGINT) + 500)
                                / 1000.0) AS BIGINT) / 1000000.0 AS out_v
                    FROM attn JOIN kv USING (kid)
                    GROUP BY qid, dim)
            SELECT COUNT(*),
                   CAST(SUM(CAST(ROUND(out_v * 1000000) AS BIGINT))
                       AS BIGINT)
            FROM out
            """
        ).fetchone()
        return r[0], r[1]

    run("gram_coord_spark", gram_coord)
    run("gram_array_spark", gram_array)
    run("gram_numpy_spark", gram_numpy)
    run("gram_duckdb", gram_duck)
    # --- Conv2D: blocked per-image kernel vs DuckDB coordinate join -------
    # n_conv vectors sliced into 1024-row images (h=1024, w=64): the
    # blocked tier runs one numpy kernel per image (images parallelize
    # across Arrow batches), DuckDB pays the 9x im2col row explosion.
    n_conv = 16384
    conv_h = 1024

    def conv_blocked():
        from hive_reflex_spark.operators.nn import conv2d_blocked

        c = coords(0, n_conv)
        img = c.select(
            (F.col("vec_id") / conv_h).cast("long").alias("img_id"),
            (F.col("vec_id") % conv_h).alias("y"),
            F.col("dim").alias("x"),
            "v",
        )
        out = conv2d_blocked(img, conv_h, 64)
        r = out.agg(
            F.count("*"),
            F.sum(F.round(F.col("conv_v") * 1_000_000).cast("long")),
        ).collect()[0]
        return r[0], r[1]

    def conv_duck():
        r = con.execute(
            f"""
            WITH c AS (SELECT * FROM {duck_coords}
                       WHERE vec_id < {n_conv}),
            img AS (SELECT vec_id // {conv_h} AS g,
                           CAST(vec_id % {conv_h} AS INT) AS y,
                           dim AS x, v
                    FROM c),
            kernel AS (SELECT dy, dx, 1.0 / 9 AS w
                       FROM (SELECT unnest(range(-1, 2)) AS dy) a,
                            (SELECT unnest(range(-1, 2)) AS dx) b),
            out AS (SELECT g, (y - dy) AS oy, (x - dx) AS ox,
                           CAST(FLOOR((CAST(SUM(CAST(ROUND(v * w
                                * {U9}) AS BIGINT)) AS BIGINT) + 500)
                                / 1000.0) AS BIGINT) / 1000000.0 AS conv_v
                    FROM img, kernel
                    WHERE (y - dy) BETWEEN 1 AND {conv_h - 2}
                      AND (x - dx) BETWEEN 1 AND 62
                    GROUP BY g, oy, ox)
            SELECT COUNT(*),
                   CAST(SUM(CAST(ROUND(conv_v * 1000000) AS BIGINT))
                       AS BIGINT)
            FROM out
            """
        ).fetchone()
        return r[0], r[1]

    def lstm_perkey():
        from hive_reflex_spark.operators.nn import q68a_lstm_unrolled

        out = q68a_lstm_unrolled(spark, sf_dir)
        r = out.agg(
            F.count("*"),
            F.sum(F.round(F.col("h0") * U9).cast("long")
                  + F.round(F.col("h1") * U9).cast("long")),
        ).collect()[0]
        return r[0], r[1]

    def lstm_blocked():
        from hive_reflex_spark.operators.nn import q68c_lstm_blocked

        out = q68c_lstm_blocked(spark, sf_dir)
        r = out.agg(
            F.count("*"),
            F.sum(F.round(F.col("h0") * U9).cast("long")
                  + F.round(F.col("h1") * U9).cast("long")),
        ).collect()[0]
        return r[0], r[1]

    def lstm_duck():
        from hive_reflex_spark.registry import ORACLES

        r = con.execute(
            f"""SELECT COUNT(*),
                   CAST(SUM(CAST(ROUND(h0 * {U9}) AS BIGINT)
                        + CAST(ROUND(h1 * {U9}) AS BIGINT)) AS BIGINT)
                FROM ({ORACLES['q68c_lstm_blocked']})"""
        ).fetchone()
        return r[0], r[1]

    run("attn_coord_spark", attn_coord)
    run("attn_blocked_spark", attn_blocked)
    run("attn_duckdb", attn_duck)
    run("conv_blocked_spark", conv_blocked)
    run("conv_duckdb", conv_duck)
    run("lstm_perkey_spark", lstm_perkey)
    run("lstm_blocked_spark", lstm_blocked)
    run("lstm_duckdb", lstm_duck)

    gs, ga, gn, gd = (
        results["gram_coord_spark"],
        results["gram_array_spark"],
        results["gram_numpy_spark"],
        results["gram_duckdb"],
    )
    at, ab, ad = (
        results["attn_coord_spark"],
        results["attn_blocked_spark"],
        results["attn_duckdb"],
    )
    cb, cd = results["conv_blocked_spark"], results["conv_duckdb"]
    lp, lb, ld = (
        results["lstm_perkey_spark"],
        results["lstm_blocked_spark"],
        results["lstm_duckdb"],
    )
    parity = (
        gs["checksum"] == ga["checksum"] == gn["checksum"] == gd["checksum"]
        and gs["rows"] == ga["rows"] == gn["rows"] == gd["rows"]
        and at["checksum"] == ab["checksum"] == ad["checksum"]
        and at["rows"] == ab["rows"] == ad["rows"]
        and cb["checksum"] == cd["checksum"]
        and cb["rows"] == cd["rows"]
        and lp["checksum"] == lb["checksum"] == ld["checksum"]
        and lp["rows"] == lb["rows"] == ld["rows"]
    )
    print(
        json.dumps(
            {
                "metric": "tensor_scale_bench",
                "sf_dir": sf_dir,
                "n_gram": n_gram,
                "n_q": n_q,
                "n_kv": n_kv,
                "results": results,
                "checksum_parity": parity,
                "gram_coord_ratio": round(gs["sec"] / gd["sec"], 2),
                "gram_array_ratio": round(ga["sec"] / gd["sec"], 2),
                "gram_numpy_ratio": round(gn["sec"] / gd["sec"], 2),
                "attn_ratio": round(at["sec"] / ad["sec"], 2),
                "attn_blocked_ratio": round(ab["sec"] / ad["sec"], 2),
                "conv_blocked_ratio": round(cb["sec"] / cd["sec"], 2),
                "lstm_perkey_ratio": round(lp["sec"] / ld["sec"], 2),
                "lstm_blocked_ratio": round(lb["sec"] / ld["sec"], 2),
            }
        )
    )
    return 0 if parity else 1


if __name__ == "__main__":
    raise SystemExit(main())
