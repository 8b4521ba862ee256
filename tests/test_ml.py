"""FlinkML-parity wrapper smoke tests (thin by design — pyspark.ml is
the implementation; we verify the wrappers wire features/labels right)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark import ml
from flink_1_8_sourcecode_spark.catalog import table
from tests.conftest import SF_SMALL


def test_linear_regression_recovers_line(spark):
    # y = 2x + 1 exactly -> coefficients must recover
    df = spark.range(100).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2.0 + 1.0).alias("y"),
    )
    model, preds = ml.linear_regression(df, ["x"], "y", regParam=0.0)
    assert abs(model.coefficients[0] - 2.0) < 1e-6
    assert abs(model.intercept - 1.0) < 1e-4


def test_svm_separates(spark):
    df = spark.range(200).select(
        F.col("id").cast("double").alias("x"),
        (F.col("id") >= 100).cast("double").alias("label"),
    )
    model, preds = ml.svm_classifier(df, ["x"], "label", maxIter=20)
    acc = preds.filter(F.col("prediction") == F.col("label")).count() / 200
    assert acc > 0.95


def test_standard_scaler(spark):
    df = table(spark, SF_SMALL, "customer").select("c_acctbal")
    from pyspark.ml.functions import vector_to_array

    _, out = ml.standard_scaler(df, ["c_acctbal"])
    stats = out.select(vector_to_array("scaled")[0].alias("s")).agg(
        F.avg("s").alias("m"), F.stddev_samp("s").alias("sd")
    ).first()
    assert abs(stats.m) < 1e-9
    assert abs(stats.sd - 1.0) < 1e-6


def test_knn_reuses_similarity(spark):
    emb = table(spark, SF_SMALL, "embeddings")
    out = ml.knn(emb, emb.filter(F.col("vec_id") < 3), "vec_id", "embedding", k=5)
    pdf = out.toPandas()
    assert set(pdf.query_id) == {0, 1, 2}
    assert (pdf.groupby("query_id").size() == 5).all()


def test_als_fits(spark):
    ratings = (
        table(spark, SF_SMALL, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").cast("int").alias("user"),
            (F.col("event_id") % 50).cast("int").alias("item"),
            F.col("value").alias("rating"),
        )
    )
    model = ml.als_recommender(ratings, "user", "item", "rating", rank=4, maxIter=3)
    recs = model.recommendForAllUsers(3)
    assert recs.count() > 0


def test_sos_outlier_recovers_planted_outlier(spark):
    """The reference's own doc example (StochasticOutlierSelection.scala:35):
    (5,8) among four clustered points gets outlierness ~0.9923."""
    from flink_1_8_sourcecode_spark.ml.wrappers import sos_outlier

    rows = [(0, 1.0, 1.0), (1, 2.0, 1.0), (2, 1.0, 2.0), (3, 2.0, 2.0), (4, 5.0, 8.0)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    out = sos_outlier(df, "id", ["x", "y"], perplexity=3.0).toPandas()
    scores = dict(zip(out.id, out.outlier_probability))
    assert max(scores, key=scores.get) == 4
    assert scores[4] > 0.98
    assert all(v < 0.35 for k, v in scores.items() if k != 4)


def test_fit_pipeline_chained_scaler_regression(spark):
    """ChainedTransformer + Predictor parity: scaler -> linreg pipeline
    fits and predicts a deterministic linear target."""
    from pyspark.ml.feature import StandardScaler, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from flink_1_8_sourcecode_spark.ml.wrappers import fit_pipeline

    rows = [(float(i), float(2 * i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, "x double, label double")
    model = fit_pipeline(
        df,
        [
            VectorAssembler(inputCols=["x"], outputCol="raw"),
            StandardScaler(inputCol="raw", outputCol="features"),
            LinearRegression(featuresCol="features", labelCol="label"),
        ],
    )
    pred = model.transform(df).toPandas()
    assert (abs(pred.prediction - pred.label) < 1e-6).all()


def test_quantile_bucketizer_equi_depth(spark):
    from flink_1_8_sourcecode_spark.ml.wrappers import quantile_bucketizer

    c = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    out, cuts = quantile_bucketizer(c, "c_acctbal", n_buckets=4)
    assert len(cuts) == 3 and cuts == sorted(cuts)
    counts = {r["bucket"]: r["n"] for r in
              out.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(counts.values())
    # equi-depth: every quartile within a few rows of n/4 (ties at cuts)
    assert set(counts) == {0, 1, 2, 3}
    assert all(abs(v - n / 4) <= max(3, 0.02 * n) for v in counts.values()), counts
    with __import__("pytest").raises(ValueError):
        quantile_bucketizer(c, "c_acctbal", n_buckets=1)
