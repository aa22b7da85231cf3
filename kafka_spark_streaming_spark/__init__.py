"""kafka_spark_streaming_spark — a PySpark-native analytics engine.

A brand-new engine with the query / data-processing capabilities of the
reference Spark-Streaming-to-HBase app (`lucasbak/kafka-spark-streaming`,
surveyed in SURVEY.md), re-expressed Spark-first:

- Structured Streaming (not DStreams) for the streaming surface
  (reference: src/main/scala/com/adaltas/www/Streamer.scala:120,
  KafkaStreamerToHbase.scala:83).
- DataFrame / Catalyst for every query: the optimizer does pushdown,
  pruning, join selection; we only declare logical plans.
- A keyed-upsert sink replicating the reference's HBase cell semantics
  (HbaseWriter.scala:22-82) on top of parquet.
- North-star LLM-data-pipeline operators (dedup, similarity search,
  text analysis, multimodal columns) designed for 100 TB scale.
"""

from kafka_spark_streaming_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
