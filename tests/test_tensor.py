"""Tensor-algebra library tests, including the reference's only bit-exact
golden oracle: the 2x2 FC layer expecting [5.0, 12.0] with mac_ops == 4
(`/root/reference/simulator/test_sim_reflex.py:24-59`)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from hive_reflex_spark.functions.tensor_fns import (
    compliance_blend,
    decode_angle_raw,
    decode_compliance_raw,
    dequantize,
    fake_quantize,
    float_to_q16_16,
    gelu,
    leaky_relu,
    q16_16_to_float,
    quantize_symmetric,
    relu,
    relu6,
    sigmoid,
    silu,
    threshold_mask,
)
from hive_reflex_spark.operators.tensor import (
    add_bias,
    argmax,
    coord_matmul,
    csr_from_coords,
    magnitude_prune_threshold,
    softmax,
    sparse_matmul,
)


def coords_df(spark, mat: np.ndarray, row="i", col="k"):
    rows = [
        (int(i), int(j), float(mat[i, j]))
        for i in range(mat.shape[0])
        for j in range(mat.shape[1])
    ]
    return spark.createDataFrame(rows, schema=f"{row} int, {col} int, v double")


def to_matrix(rows, n, m, ri="i", rj="j"):
    out = np.zeros((n, m))
    for r in rows:
        out[r[ri]][r[rj]] = r["v"]
    return out


class TestGoldenFC:
    """The reference golden case: input [1,2] x weights [[1,2],[3,4]] +
    bias [0,1], ReLU → [5.0, 12.0], 4 MACs."""

    def test_fc_forward(self, spark):
        x = coords_df(spark, np.array([[1.0, 2.0]]))  # 1x2 input (i,k)
        w = coords_df(spark, np.array([[1.0, 2.0], [3.0, 4.0]]).T, row="k", col="j")
        bias = spark.createDataFrame(
            [(0, 0.0), (1, 1.0)], schema="j int, v double"
        )
        out = add_bias(coord_matmul(x, w, broadcast_b=True), bias)
        out = out.withColumn("v", relu(F.col("v")))
        got = {r["j"]: r["v"] for r in out.collect()}
        assert got == {0: 5.0, 1: 12.0}

    def test_mac_count(self, spark):
        x = coords_df(spark, np.array([[1.0, 2.0]]))
        w = coords_df(spark, np.array([[1.0, 2.0], [3.0, 4.0]]).T, row="k", col="j")
        macs = (
            x.alias("a")
            .join(w.alias("b"), "k")
            .count()
        )
        assert macs == 4


class TestMatmul:
    def test_matches_numpy(self, spark):
        rng = np.random.default_rng(42)
        a = rng.normal(size=(7, 5))
        b = rng.normal(size=(5, 9))
        got_df = coord_matmul(
            coords_df(spark, a), coords_df(spark, b, row="k", col="j")
        )
        got = to_matrix(got_df.collect(), 7, 9)
        np.testing.assert_allclose(got, a @ b, rtol=1e-9)

    def test_sparse_skips_macs(self, spark):
        """Sparse path must produce fewer MACs, matching the reference's
        skip counter semantics (`sim/sparse_mac_sim.py:14-52`)."""
        rng = np.random.default_rng(7)
        a = rng.normal(size=(6, 8))
        a[np.abs(a) < 0.5] = 0.001  # near-zeros to skip
        b = rng.normal(size=(8, 4))
        dense = coord_matmul(coords_df(spark, a), coords_df(spark, b, "k", "j"))
        sparse = sparse_matmul(
            coords_df(spark, a), coords_df(spark, b, "k", "j"), threshold=0.01
        )
        # thresholded result equals numpy on the masked matrix
        am = np.where(np.abs(a) >= 0.01, a, 0.0)
        got = to_matrix(sparse.collect(), 6, 4)
        np.testing.assert_allclose(got, am @ b, rtol=1e-9)
        assert dense.count() >= sparse.count()


class TestCSR:
    def test_row_ptr(self, spark):
        """CSR row_ptr reconstruction (`sparsity_optimizer.py:202-229`):
        exclusive cumsum of per-row nnz."""
        mat = np.array([[1.0, 0.0, 2.0], [0.0, 0.0, 0.0], [3.0, 4.0, 5.0]])
        nz = [(i, j, float(mat[i, j])) for i in range(3) for j in range(3) if mat[i, j]]
        df = spark.createDataFrame(nz, schema="i int, k int, v double")
        got = {r["i"]: (r["nnz"], r["row_ptr"]) for r in csr_from_coords(df).collect()}
        assert got == {0: (2, 0), 2: (3, 2)}  # empty rows absent (COO form)

    def test_row_ptr_distributed_prefix_sum(self, spark):
        """The two-pass prefix sum must be exact across many partitions and
        buckets — row_ptr[i] == total nnz of all earlier rows (exclusive),
        with row ids sparse and shuffled across >= 2 input partitions."""
        rng = np.random.default_rng(7)
        # 2000 sparse row ids in [0, 100000), variable nnz per row
        row_ids = rng.choice(100_000, size=2000, replace=False)
        rows = []
        expect_nnz = {}
        for i in row_ids:
            nnz = int(rng.integers(1, 6))
            expect_nnz[int(i)] = nnz
            rows += [(int(i), k, 1.0) for k in range(nnz)]
        df = spark.createDataFrame(rows, "i long, k int, v double").repartition(8)
        assert df.rdd.getNumPartitions() >= 2
        got = {
            r["i"]: (r["nnz"], r["row_ptr"])
            for r in csr_from_coords(df, n_buckets=16).collect()
        }
        acc = 0
        for i in sorted(expect_nnz):
            assert got[i] == (expect_nnz[i], acc)
            acc += expect_nnz[i]


class TestElementwise:
    def test_activations_match_numpy(self, spark):
        xs = np.linspace(-3, 3, 31)
        df = spark.createDataFrame([(float(x),) for x in xs], "x double")
        out = df.select(
            relu(F.col("x")).alias("relu"),
            relu6(F.col("x") * 3).alias("relu6"),
            leaky_relu(F.col("x")).alias("leaky"),
            sigmoid(F.col("x")).alias("sig"),
            gelu(F.col("x")).alias("gelu"),
            silu(F.col("x")).alias("silu"),
        ).collect()
        for x, r in zip(xs, out):
            assert r["relu"] == pytest.approx(max(x, 0.0))
            assert r["relu6"] == pytest.approx(min(max(3 * x, 0.0), 6.0))
            assert r["leaky"] == pytest.approx(x if x >= 0 else 0.01 * x)
            assert r["sig"] == pytest.approx(1 / (1 + math.exp(-x)), rel=1e-12)
            g = 0.5 * x * (1 + math.tanh(math.sqrt(2 / math.pi) * (x + 0.044715 * x**3)))
            assert r["gelu"] == pytest.approx(g, rel=1e-9, abs=1e-12)
            assert r["silu"] == pytest.approx(x / (1 + math.exp(-x)), rel=1e-9)

    def test_quantize_roundtrip(self, spark):
        """Symmetric int8 quantize/dequant matches the numpy reference
        semantics (`tools/model_to_flash.py:92-116`)."""
        xs = np.linspace(-1.27, 1.27, 255)
        df = spark.createDataFrame([(float(x),) for x in xs], "x double")
        scale = F.lit(1.27 / 127)
        out = df.select(
            quantize_symmetric(F.col("x"), scale).alias("q"),
            dequantize(quantize_symmetric(F.col("x"), scale), scale).alias("dq"),
            fake_quantize(F.col("x"), scale).alias("fq"),
        ).collect()
        for x, r in zip(xs, out):
            q_np = int(np.clip(round(x / (1.27 / 127)), -127, 127))
            assert r["q"] == q_np
            assert r["dq"] == pytest.approx(q_np * 1.27 / 127, rel=1e-12)
            assert r["fq"] == pytest.approx(r["dq"])

    def test_fixed_point_and_wire(self, spark):
        df = spark.createDataFrame([(1.5, 314, 128)], "x double, a short, c short")
        r = df.select(
            float_to_q16_16(F.col("x")).alias("fx"),
            q16_16_to_float(float_to_q16_16(F.col("x"))).alias("back"),
            decode_angle_raw(F.col("a")).alias("deg"),
            decode_compliance_raw(F.col("c")).alias("comp"),
        ).first()
        assert r["fx"] == 98304 and r["back"] == 1.5
        assert r["deg"] == pytest.approx(3.14)
        assert r["comp"] == pytest.approx(128 / 255)

    def test_threshold_and_blend(self, spark):
        df = spark.createDataFrame([(0.005, 0.8, 0.4, 0.5)], "w double, pid double, nn double, g double")
        r = df.select(
            threshold_mask(F.col("w"), 0.01).alias("masked"),
            compliance_blend(F.col("pid"), F.col("nn"), F.col("g")).alias("u"),
        ).first()
        assert r["masked"] == 0.0
        assert r["u"] == pytest.approx(0.8 * 0.5 + 0.4 * 0.5)


class TestSoftmaxArgmax:
    def test_softmax_sums_to_one(self, spark):
        rng = np.random.default_rng(3)
        rows = [(g, i, float(v)) for g in range(4) for i, v in enumerate(rng.normal(size=10))]
        df = spark.createDataFrame(rows, "g int, idx int, v double")
        out = softmax(df, ["g"]).groupBy("g").agg(F.sum("softmax").alias("s")).collect()
        for r in out:
            assert r["s"] == pytest.approx(1.0, rel=1e-12)

    def test_argmax_deterministic_ties(self, spark):
        df = spark.createDataFrame(
            [(0, 1, 5.0), (0, 3, 5.0), (0, 2, 1.0)], "g int, idx int, v double"
        )
        r = argmax(df, ["g"], "v", "idx").first()
        assert r["idx"] == 1  # lowest index wins ties


class TestPruning:
    def test_percentile_threshold(self, spark):
        vals = [float(i) for i in range(1, 101)]
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        thr = magnitude_prune_threshold(df, 0.5).first()["threshold"]
        assert thr == pytest.approx(50.5)
