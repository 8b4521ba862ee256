"""Kafka connector surface tests (FlinkKafkaConsumerBase.java:86 parity).

No broker exists here, so broker I/O is wiring-only; the serde and the
record-shape contract run for real against the fake_kafka_records
loopback — code written against it runs unchanged on a real topic.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_1_8_sourcecode_spark.catalog import table
from flink_1_8_sourcecode_spark.streaming import kafka, sources
from tests.conftest import SF_SMALL


def test_serde_roundtrip_batch(spark):
    """encode -> kafka record shape -> decode reproduces the input."""
    ev = table(spark, SF_SMALL, "events").select("event_id", "ts", "user_id", "value")
    recs = kafka.fake_kafka_records(
        ev, topic="events", key="user_id",
        value_cols=["event_id", "user_id", "value"], ts_col="ts",
    )
    assert [f.name for f in recs.schema.fields] == [
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType"
    ]
    decoded = kafka.decode_json_value(
        recs, "event_id long, user_id long, value double"
    )
    got = decoded.select("event_id", "user_id", "value").toPandas()
    exp = ev.select("event_id", "user_id", "value").toPandas()
    got = got.sort_values("event_id").reset_index(drop=True)
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert (got.event_id == exp.event_id).all()
    assert (abs(got.value - exp.value) < 1e-9).all()
    # partitioning is stable per key
    parts = recs.select("key", "partition").distinct().groupBy("key").count().toPandas()
    assert (parts["count"] == 1).all()


def test_serde_is_jvm_side(spark):
    """The JSON serde must stay in whole-stage codegen — no Python stage."""
    ev = table(spark, SF_SMALL, "events")
    recs = kafka.fake_kafka_records(
        ev, topic="t", key="user_id", value_cols=["event_id", "value"], ts_col="ts"
    )
    plan = kafka.decode_json_value(recs, "event_id long, value double") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_streaming_decode_over_loopback(spark, tmp_path):
    """Streaming path: file-source micro-batches shaped into kafka
    records, decoded, aggregated — the full consumer-side pipeline."""
    chunks = str(tmp_path / "kchunks")
    sources.write_event_chunks(spark, SF_SMALL, chunks, n_chunks=3)
    stream = sources.read_event_stream(spark, chunks)
    recs = kafka.fake_kafka_records(
        stream, topic="events", key="user_id",
        value_cols=["event_id", "user_id", "value"], ts_col="ts",
    )
    decoded = kafka.decode_json_value(recs, "event_id long, user_id long, value double")
    agg = decoded.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    q = agg.writeStream.format("memory").queryName("t_kafka_loop").outputMode("complete").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_kafka_loop").toPandas()
    exp = table(spark, SF_SMALL, "events").groupBy("user_id").count().toPandas()
    assert dict(zip(got.user_id, got.n)) == dict(zip(exp.user_id, exp["count"]))


def test_source_subscription_modes_validated(spark):
    with pytest.raises(ValueError):
        kafka.kafka_source(spark, "b:9092")  # no mode
    with pytest.raises(ValueError):
        kafka.kafka_source(spark, "b:9092", topics="t", pattern="t.*")  # two modes


def test_sink_exactly_once_refuses_silent_downgrade(spark):
    ev = table(spark, SF_SMALL, "events")
    with pytest.raises(NotImplementedError):
        kafka.kafka_sink(ev, "b:9092", "t", "/tmp/ck", semantic="exactly_once")


AVRO_EVENT = {
    "type": "record",
    "name": "event",
    "fields": [
        {"name": "event_id", "type": "long"},
        {"name": "user_id", "type": "long"},
        {"name": "value", "type": ["null", "double"]},
    ],
}


def test_avro_datum_serde_roundtrip_batch(spark):
    """AvroRowSerialization/DeserializationSchema parity: raw per-message
    datum bytes (no container framing), nullable field included."""
    src = spark.createDataFrame(
        [(1, 10, 0.5), (2, 20, None), (3, 10, -1.25)],
        "event_id long, user_id long, value double",
    )
    enc = kafka.encode_avro_value(src, ["event_id", "user_id", "value"], AVRO_EVENT)
    assert enc.columns == ["value"]
    dec = kafka.decode_avro_value(
        enc.withColumn("timestamp", F.current_timestamp()), AVRO_EVENT
    )
    got = sorted((r["event_id"], r["user_id"], r["value"]) for r in dec.collect())
    assert got == [(1, 10, 0.5), (2, 20, None), (3, 10, -1.25)]


def test_avro_streaming_decode_over_loopback(spark, tmp_path):
    """The Avro consumer pipeline end-to-end on a STREAM: micro-batched
    events -> avro datum bytes in kafka record shape -> decode -> agg."""
    chunks = str(tmp_path / "akchunks")
    sources.write_event_chunks(spark, SF_SMALL, chunks, n_chunks=3)
    stream = sources.read_event_stream(spark, chunks)
    enc = kafka.encode_avro_value(
        stream.select(
            F.col("user_id").alias("k"), "event_id", "user_id", "value", "ts"
        ),
        ["event_id", "user_id", "value"],
        AVRO_EVENT,
    )
    recs = kafka.fake_kafka_records(
        enc, topic="events", key="k", value_cols=None, ts_col="ts"
    )
    decoded = kafka.decode_avro_value(recs, AVRO_EVENT)
    agg = decoded.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    q = (agg.writeStream.format("memory").queryName("t_avro_loop")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_avro_loop").toPandas()
    exp = table(spark, SF_SMALL, "events").groupBy("user_id").count().toPandas()
    assert dict(zip(got.user_id, got.n)) == dict(zip(exp.user_id, exp["count"]))
