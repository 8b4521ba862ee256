"""ML library — FlinkML capability parity (SURVEY.md §2.15).

FlinkML (flink-libraries/flink-ml/src/main/scala/org/apache/flink/ml/)
ships: SVM, multiple linear regression, ALS, kNN, standard/minmax
scalers, polynomial features, pipelines.  ``pyspark.ml`` provides all of
these natively — per the survey's directive these are thin wrappers
("wrap, don't build"); kNN (absent from pyspark.ml) reuses the engine's
similarity operator.
"""

from flink_1_8_sourcecode_spark.ml.wrappers import (
    als_recommender,
    knn,
    linear_regression,
    min_max_scaler,
    polynomial_features,
    standard_scaler,
    svm_classifier,
)

__all__ = [
    "als_recommender",
    "knn",
    "linear_regression",
    "min_max_scaler",
    "polynomial_features",
    "standard_scaler",
    "svm_classifier",
]
