"""Kafka source (SURVEY.md S1) — Structured Streaming's direct model.

The reference uses KafkaUtils.createDirectStream with StringDecoders
over a comma-separated topic set (Streamer.scala:107-120,
KafkaStreamerToHbase.scala:70-83). Structured Streaming's Kafka source
is the same receiverless design — RDD partitions map 1:1 to Kafka
partitions, offsets tracked in the checkpoint (instead of nowhere,
which is what the reference did).

No broker exists in the test environment, so `kafka_stream_reader`
builds the plan but only fails at `.load()` analysis if the connector
jar is absent — tests cover the option construction and the projection
logic via the file-stream source instead (sources/files.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TOPIC = "page_visits"  # reference default, Streamer.scala:103


def kafka_source_options(
    brokers: str,
    topics: str = DEFAULT_TOPIC,
    starting_offsets: str = "latest",
    min_partitions: int | None = None,
) -> dict[str, str]:
    """Option map for the Kafka source.

    `topics` is a comma-separated list, matching the reference's
    `-input_topic` csv contract (Streamer.scala:109: split(",").toSet);
    Structured Streaming's `subscribe` takes the csv directly.
    """
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }
    if min_partitions is not None:
        # raise parallelism above #kafka-partitions at high volume
        opts["minPartitions"] = str(min_partitions)
    return opts


def kafka_stream_reader(
    spark: SparkSession, brokers: str, topics: str = DEFAULT_TOPIC, **kw
) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(brokers, topics, **kw).items():
        reader = reader.option(k, v)
    return kafka_messages(reader.load())


def kafka_messages(raw: DataFrame) -> DataFrame:
    """Kafka wire schema → the engine's message shape.

    CAST(key/value AS STRING) replaces the reference's StringDecoder
    type params (Streamer.scala:120). Keys may be null — downstream
    sinks route them to the sentinel row.
    """
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
        F.col("topic"),
        F.col("timestamp").alias("ts"),
    )
