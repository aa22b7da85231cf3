from kafka_spark_streaming_spark.sinks.foreach import RecordForeachWriter
from kafka_spark_streaming_spark.sinks.kafka import kafka_sink_options
from kafka_spark_streaming_spark.sinks.upsert import KeyedUpsertSink

__all__ = ["KeyedUpsertSink", "RecordForeachWriter", "kafka_sink_options"]
