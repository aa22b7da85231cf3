"""Kafka source/sink surface (SURVEY.md S1/S2) without a broker.

No broker or connector jar exists in this environment, so these tests
pin everything that is checkable at analysis time: the option maps the
builders hand to Structured Streaming (subscribe csv, startingOffsets,
minPartitions, acks), the reader wiring (format + every option reaches
the DataStreamReader before load), and the wire-schema projection
semantics (CAST to string, null keys preserved) on a static frame with
the exact Kafka wire schema.
"""

from __future__ import annotations

from unittest import mock

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafka_spark_streaming_spark.sinks.kafka import (
    kafka_sink_options,
    to_kafka_records,
)
from kafka_spark_streaming_spark.sources.kafka import (
    DEFAULT_TOPIC,
    kafka_messages,
    kafka_source_options,
    kafka_stream_reader,
)


def test_source_options_topic_csv_passthrough():
    opts = kafka_source_options(
        "b1:9092,b2:9092", topics="page_visits,clicks", min_partitions=64
    )
    # the reference's -input_topic csv contract maps 1:1 onto subscribe
    assert opts["subscribe"] == "page_visits,clicks"
    assert opts["kafka.bootstrap.servers"] == "b1:9092,b2:9092"
    assert opts["startingOffsets"] == "latest"
    assert opts["minPartitions"] == "64"


def test_source_options_defaults():
    opts = kafka_source_options("b:9092")
    assert opts["subscribe"] == DEFAULT_TOPIC
    assert "minPartitions" not in opts


def test_sink_options_acks_one():
    opts = kafka_sink_options("b:9092", "out_topic")
    assert opts["topic"] == "out_topic"
    # reference: request.required.acks=1 (Streamer.scala:116)
    assert opts["kafka.acks"] == "1"


class _FakeReader:
    """Captures the format/option calls the builder makes."""

    def __init__(self):
        self.fmt = None
        self.opts: dict[str, str] = {}
        self.loaded = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.opts[k] = v
        return self

    def load(self):
        self.loaded = True
        raise RuntimeError("no broker in test env")


def test_stream_reader_builds_kafka_plan(spark):
    fake = _FakeReader()
    with mock.patch.object(
        type(spark), "readStream", property(lambda self: fake)
    ):
        try:
            kafka_stream_reader(
                spark, "b:9092", topics="a,b", min_partitions=8
            )
        except RuntimeError:
            pass
    assert fake.fmt == "kafka"
    assert fake.loaded, "builder must reach .load()"
    assert fake.opts == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "a,b",
        "startingOffsets": "latest",
        "minPartitions": "8",
    }


def test_stream_reader_reaches_datasource_resolution(spark):
    """Drive the REAL DataStreamReader (no mock), in whichever of the
    two environments we're in (ADVICE r4 #3 — must not invert when the
    connector jar IS on the classpath):

    - no spark-sql-kafka jar (this sandbox — no network to fetch it):
      `.load()` must fail inside Spark's DataSource.lookupDataSource
      with the kafka-specific guidance message, proving the builder's
      format + option map reaches source-resolution machinery intact;
    - jar present: resolution succeeds without a broker (load is lazy),
      and the stream must surface Kafka's wire schema — the exact
      shape kafka_messages() projects (also tested on a static frame).
    """
    from pyspark.errors import AnalysisException

    try:
        df = kafka_stream_reader(spark, "b:9092", topics="a,b", min_partitions=8)
    except AnalysisException as ei:
        msg = str(ei)
        assert "kafka" in msg.lower()
        assert "Failed to find" in msg or "DATA_SOURCE_NOT_FOUND" in msg
    else:
        fields = {f.name: f.dataType for f in df.schema.fields}
        assert isinstance(fields["key"], BinaryType)
        assert isinstance(fields["value"], BinaryType)
        assert "topic" in fields and "timestamp" in fields


_WIRE_SCHEMA = StructType(
    [
        StructField("key", BinaryType()),
        StructField("value", BinaryType()),
        StructField("topic", StringType()),
        StructField("timestamp", TimestampType()),
    ]
)


def test_wire_projection_casts_and_keeps_null_keys(spark):
    import datetime as dt

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    raw = spark.createDataFrame(
        [
            (b"k1", b"v1", "page_visits", ts),
            (None, b"v2", "clicks", ts),
        ],
        _WIRE_SCHEMA,
    )
    out = kafka_messages(raw)
    assert out.columns == ["key", "value", "topic", "ts"]
    rows = {r.value: r for r in out.collect()}
    assert rows["v1"].key == "k1"
    # null keys must survive the cast — the sink routes them to the
    # sentinel row (HbaseWriter.scala:58-60 intent)
    assert rows["v2"].key is None
    assert rows["v2"].topic == "clicks"


def test_to_kafka_records_projection(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, None)], "id int, msg string"
    )
    keyless = to_kafka_records(df, value_col="msg")
    assert keyless.columns == ["value"]
    keyed = to_kafka_records(df, key_col="id", value_col="msg")
    assert keyed.columns == ["key", "value"]
    assert dict(keyed.collect()) == {"1": "hello", "2": None}
