"""Thin pyspark.ml wrappers matching FlinkML's surface.

Reference file:line (under /root/reference/flink-libraries/flink-ml/src/
main/scala/org/apache/flink/ml/):
- regression/MultipleLinearRegression.scala -> LinearRegression
- classification/SVM.scala                  -> LinearSVC
- recommendation/ALS.scala                  -> pyspark.ml ALS
- nn/KNN.scala                              -> similarity.cosine_topk
- preprocessing/StandardScaler.scala        -> StandardScaler
- preprocessing/MinMaxScaler.scala          -> MinMaxScaler
- preprocessing/PolynomialFeatures.scala    -> PolynomialExpansion
- outlier/StochasticOutlierSelection.scala  -> sos_outlier (native impl)
- pipeline/{Transformer,Predictor,Chained*}.scala -> fit_pipeline
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.operators.similarity import cosine_topk


def _assemble(df: DataFrame, feature_cols: list[str], out: str = "features") -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(inputCols=feature_cols, outputCol=out).transform(df)


def linear_regression(
    df: DataFrame, feature_cols: list[str], label_col: str, **params
):
    """MultipleLinearRegression.scala parity. Returns (model, predictions)."""
    from pyspark.ml.regression import LinearRegression

    data = _assemble(df, feature_cols)
    model = LinearRegression(featuresCol="features", labelCol=label_col, **params).fit(data)
    return model, model.transform(data)


def svm_classifier(df: DataFrame, feature_cols: list[str], label_col: str, **params):
    """SVM.scala (CoCoA soft-margin SVM) parity via LinearSVC."""
    from pyspark.ml.classification import LinearSVC

    data = _assemble(df, feature_cols)
    model = LinearSVC(featuresCol="features", labelCol=label_col, **params).fit(data)
    return model, model.transform(data)


def als_recommender(
    ratings: DataFrame, user_col: str, item_col: str, rating_col: str, rank: int = 8, **params
):
    """recommendation/ALS.scala parity."""
    from pyspark.ml.recommendation import ALS

    model = ALS(
        userCol=user_col, itemCol=item_col, ratingCol=rating_col, rank=rank,
        coldStartStrategy="drop", seed=42, **params,
    ).fit(ratings)
    return model


def knn(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 5
) -> DataFrame:
    """nn/KNN.scala parity — exact cosine kNN on array<float|double>
    columns, reusing the engine's distributed similarity operator."""
    return cosine_topk(corpus, queries, id_col, vec_col, id_col, k=k)


def standard_scaler(df: DataFrame, feature_cols: list[str], with_mean: bool = True):
    from pyspark.ml.feature import StandardScaler

    data = _assemble(df, feature_cols)
    model = StandardScaler(
        inputCol="features", outputCol="scaled", withMean=with_mean, withStd=True
    ).fit(data)
    return model, model.transform(data)


def min_max_scaler(df: DataFrame, feature_cols: list[str]):
    from pyspark.ml.feature import MinMaxScaler

    data = _assemble(df, feature_cols)
    model = MinMaxScaler(inputCol="features", outputCol="scaled").fit(data)
    return model, model.transform(data)


def polynomial_features(df: DataFrame, feature_cols: list[str], degree: int = 2) -> DataFrame:
    from pyspark.ml.feature import PolynomialExpansion

    data = _assemble(df, feature_cols)
    return PolynomialExpansion(degree=degree, inputCol="features", outputCol="poly").transform(
        data
    )


def fit_pipeline(df: DataFrame, stages):
    """FlinkML pipeline parity (pipeline/ChainedTransformer.scala,
    ChainedPredictor.scala): chain transformers with an optional trailing
    predictor via pyspark.ml.Pipeline.  Returns the fitted PipelineModel;
    call .transform(df) for predictions."""
    from pyspark.ml import Pipeline

    return Pipeline(stages=list(stages)).fit(df)


def sos_outlier(
    df: DataFrame,
    id_col: str,
    feature_cols: list[str],
    perplexity: float = 4.0,
    max_iterations: int = 25,
    tolerance: float = 1e-5,
) -> DataFrame:
    """Stochastic Outlier Selection (outlier/StochasticOutlierSelection.scala;
    Janssens et al. 2012).  Returns (id, outlier_probability).

    Same three phases as the reference: pairwise euclidean dissimilarity,
    per-point Gaussian affinity with beta binary-searched to hit
    log(perplexity) entropy, row-normalized binding probabilities, and
    outlierness = prod_i (1 - p_ij) over each column j.

    Scale notes: SOS is inherently O(n^2) in pairs (the reference uses a
    full cross); this implementation shuffles pairs once and fits each
    point's beta in a vectorized pandas group, so it distributes, but it
    is meant for sampled subsets (~1e5 rows), not the full corpus.
    """
    import numpy as np
    import pandas as pd

    id_t = df.schema[id_col].dataType.simpleString()
    pts = df.select(
        F.col(id_col).alias("__i"),
        F.array(*[F.col(c).cast("double") for c in feature_cols]).alias("__v"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    dist = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("a.__v"), F.col("b.__v"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pairs = a.join(b, F.col("a.__i") != F.col("b.__i")).select(
        F.col("a.__i").alias("i"), F.col("b.__i").alias("j"), dist.alias("d")
    )
    log_perp = float(np.log(perplexity))

    def fit_beta(pdf: pd.DataFrame) -> pd.DataFrame:
        d = pdf["d"].to_numpy()
        beta, beta_min, beta_max = 1.0, -np.inf, np.inf
        aff = np.exp(-d * beta)
        for _ in range(max_iterations):
            s = aff.sum()
            h = np.log(s) + beta * float((d * aff).sum()) / s
            h_diff = h - log_perp
            if abs(h_diff) <= tolerance:
                break
            if np.isnan(h_diff):
                beta /= 10.0
            elif h_diff > 0:
                beta_min = beta
                beta = beta * 2.0 if np.isinf(beta_max) else (beta + beta_max) / 2.0
            else:
                beta_max = beta
                beta = beta / 2.0 if np.isinf(beta_min) else (beta + beta_min) / 2.0
            aff = np.exp(-d * beta)
        p = aff / aff.sum()
        return pd.DataFrame({"i": pdf["i"], "j": pdf["j"], "p": p})

    probs = pairs.groupBy("i").applyInPandas(fit_beta, f"i {id_t}, j {id_t}, p double")
    # outlierness of j = prod over i of (1 - p_ij), via exp-sum-log
    return probs.groupBy(F.col("j").alias(id_col)).agg(
        F.exp(F.sum(F.log(F.greatest(F.lit(1.0) - F.col("p"), F.lit(1e-300))))).alias(
            "outlier_probability"
        )
    )


def quantile_bucketizer(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 4,
    out_col: str = "bucket",
):
    """Equi-depth feature discretization (the QuantileDiscretizer /
    Bucketizer pattern): bucket b = number of quantile cut points
    strictly below the value, cuts at i/n_buckets percentiles (exact
    interpolated percentile, not approxQuantile — deterministic and
    engine-portable).  Returns ``(df + out_col, cuts)``.

    Cuts are rounded to 6 dp BEFORE comparison — exact-percentile
    interpolation formulas differ across engines by ULPs ((1-f)*lo+f*hi
    vs lo+f*(hi-lo)), and an unrounded cut that lands ON a data value
    would assign that row differently per engine.  Scale: one exact
    percentile aggregate (driver materializes n_buckets-1 doubles),
    then a map-only comparison chain.
    """
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    row = df.agg(
        *[
            F.round(F.percentile(value_col, F.lit(q)), 6).alias(f"__q{i}")
            for i, q in enumerate(qs)
        ]
    ).first()
    cuts = [row[f"__q{i}"] for i in range(len(qs))]
    b = F.lit(0)
    for c in cuts:
        b = b + (F.col(value_col) > F.lit(c)).cast("int")
    return df.withColumn(out_col, b), cuts
