"""Kafka sink (SURVEY.md S2).

The reference sends one summary string per batch from the driver
(KafkaProducer.scala:8-11, acks=1 per Streamer.scala:116) or a static
message per partition (KafkaStreamerToHbase.scala:89-95). Structured
Streaming's Kafka sink replaces both: `writeStream.format("kafka")`
writes executor-side with offsets checkpointed.

Broker-less test environment → builders only; application happens in
streaming/pipeline.py when kafka output is configured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kafka_sink_options(brokers: str, topic: str, acks: int = 1) -> dict[str, str]:
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        # reference: request.required.acks=1 (Streamer.scala:116)
        "kafka.acks": str(acks),
    }


def to_kafka_records(df: DataFrame, key_col: str | None = None,
                     value_col: str = "value") -> DataFrame:
    """Project to the (key, value) binary shape the Kafka sink expects.

    The reference's messages are keyless strings
    (KeyedMessage(topic, message), KafkaProducer.scala:10).
    """
    cols = [F.col(value_col).cast("string").alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def write_batch_to_kafka(batch_df: DataFrame, brokers: str, topic: str,
                         acks: int = 1) -> None:
    """Batch write path for use inside foreachBatch (requires the
    spark-sql-kafka connector jar at runtime)."""
    writer = batch_df.write.format("kafka")
    for k, v in kafka_sink_options(brokers, topic, acks).items():
        writer = writer.option(k, v)
    writer.save()
