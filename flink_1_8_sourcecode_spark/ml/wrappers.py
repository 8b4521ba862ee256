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
"""

from __future__ import annotations

from pyspark.sql import DataFrame

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
