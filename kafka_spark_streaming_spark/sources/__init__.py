from kafka_spark_streaming_spark.sources.files import file_stream_messages
from kafka_spark_streaming_spark.sources.kafka import (
    kafka_messages,
    kafka_stream_reader,
)

__all__ = ["file_stream_messages", "kafka_messages", "kafka_stream_reader"]
