"""Multimodal-column inventory (SURVEY.md §2.16) — declared as rows-only
checks (the decode kernel is a deterministic stub; the Spark-side
plumbing — schema, Arrow batch flow, explode pattern — is what's real).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.operators import multimodal
from flink_1_8_sourcecode_spark.queries import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return multimodal.attach_fake_media(docs, "doc_id", "text")


@register(
    "multimodal_decode_features",
    doc="Binary media column -> Arrow-batched mapInPandas feature "
    "extraction (decode stubbed deterministically; rows-only check).",
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.decode_features(_media(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    doc="Video frame sampling: metadata-driven frame explode, every 2nd "
    "frame kept (rows-only check).",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.frame_sample(_media(spark, sf_dir), every_nth=2)


@register(
    "multimodal_resize_plan",
    doc="Resize planning (pure metadata arithmetic, JVM-side): target "
    "dims bounded by max side 128 (rows-only check).",
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.resize_plan(_media(spark, sf_dir), max_side=128).select(
        "media_id", "target_width", "target_height"
    )
