from kafka_spark_streaming_spark.streaming.pipeline import StreamerPipeline

__all__ = ["StreamerPipeline"]
