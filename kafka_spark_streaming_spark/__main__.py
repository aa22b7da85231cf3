"""CLI entry point — the reference's Streamer option surface.

Mirrors Streamer.scala:27-43 (commons-cli options) so a user of the
reference can switch with the same flags, minus Kerberos plumbing
(SURVEY.md S6, out of scope):

    python -m kafka_spark_streaming_spark \
        -b broker1:9092 -input_topic page_visits -output_topic out \
        -table /path/to/sink -bulk

Without -b, the Kafka source is replaced by the file-stream stand-in
(--source-parquet, drained with availableNow) so the full pipeline runs
broker-free — the mode the test harness uses.
"""

from __future__ import annotations

import argparse
import sys
import tempfile


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kafka_spark_streaming_spark",
        description="PySpark-native streamer (reference-parity CLI)",
    )
    # reference option names, Streamer.scala:27-43
    p.add_argument("-b", dest="brokers", help="Kafka broker list")
    p.add_argument(
        "-input_topic",
        dest="input_topics",
        default="page_visits",
        help="comma-separated input topics (default page_visits)",
    )
    p.add_argument("-output_topic", dest="output_topic")
    p.add_argument("-table", dest="table", help="upsert sink path")
    p.add_argument("-bulk", dest="bulk", action="store_true")
    # engine-side additions (no Kafka in the harness)
    p.add_argument(
        "--source-parquet",
        dest="source_parquet",
        help="file-stream stand-in for the Kafka source",
    )
    p.add_argument("--checkpoint", dest="checkpoint")
    p.add_argument(
        "--available-now",
        dest="available_now",
        action="store_true",
        help="drain pending input then exit (test/backfill mode)",
    )
    p.add_argument("--summary-path", dest="summary_path")
    p.add_argument(
        "--per-record",
        dest="per_record",
        action="store_true",
        help=(
            "entry-point-2 parity (KafkaStreamerToHbase.scala:87-160, the"
            " pom main class): every record written from the executors via"
            " ForeachWriter into -table as (rowkey, cf, qualifier, value)"
            " TSV cells, instead of the per-batch Streamer summary"
        ),
    )
    return p


def _run_per_record(spark, args) -> int:
    """Entry point 2 (the reference's pom main class): all work on the
    executors, one put per record — KafkaStreamerToHbase.scala:156-160's
    `y.foreach(record => insertOneLineToHbase(rowkey, "messages",
    record.toString(), "cf1", table))`, as a ForeachWriter. Wall-clock
    rowkeys become the data-derived key (determinism rule shared with
    s_foreach_record_sink); record.toString() for a (k, v) tuple is
    "(k,v)" with nulls printed as "null"."""
    from pyspark.sql import functions as F

    from kafka_spark_streaming_spark.sinks.foreach import RecordForeachWriter

    if not args.table:
        print("--per-record needs -table (sink directory)", file=sys.stderr)
        return 2
    if args.brokers:
        from kafka_spark_streaming_spark.sources.kafka import (
            kafka_stream_reader,
        )

        messages = kafka_stream_reader(spark, args.brokers, args.input_topics)
    else:
        from kafka_spark_streaming_spark.sources.files import (
            file_stream_messages,
        )

        messages = file_stream_messages(spark, args.source_parquet)
    records = messages.select(
        F.coalesce(F.col("key"), F.lit("kafka empty message")).alias("rowkey"),
        F.lit("messages").alias("qualifier"),
        F.concat(
            F.lit("("),
            F.coalesce(F.col("key"), F.lit("null")),
            F.lit(","),
            F.col("value"),
            F.lit(")"),
        ).alias("value"),
    )
    writer = records.writeStream.foreach(RecordForeachWriter(args.table))
    writer = writer.option(
        "checkpointLocation",
        args.checkpoint or tempfile.mkdtemp(prefix="kss_cli_ckpt_"),
    )
    if args.available_now or not args.brokers:
        writer = writer.trigger(availableNow=True)
    else:
        # reference cadence: Seconds(1), KafkaStreamerToHbase.scala:56
        writer = writer.trigger(processingTime="1 second")
    q = writer.start()
    q.awaitTermination()
    return 0


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if not args.brokers and not args.source_parquet:
        print(
            "need -b (Kafka) or --source-parquet (file stand-in)",
            file=sys.stderr,
        )
        return 2

    from kafka_spark_streaming_spark.session import get_spark
    from kafka_spark_streaming_spark.streaming.pipeline import (
        StreamerConfig,
        StreamerPipeline,
    )

    spark = get_spark(app_name="kss-streamer")

    if args.per_record:
        return _run_per_record(spark, args)

    cfg = StreamerConfig(
        table_path=args.table,
        bulk=args.bulk,
        output_topic=args.output_topic,
        brokers=args.brokers,
        summary_path=args.summary_path,
    )
    pipe = StreamerPipeline(spark, cfg)

    if args.brokers:
        from kafka_spark_streaming_spark.sources.kafka import (
            kafka_stream_reader,
        )

        messages = kafka_stream_reader(spark, args.brokers, args.input_topics)
    else:
        from kafka_spark_streaming_spark.sources.files import (
            file_stream_messages,
        )

        messages = file_stream_messages(spark, args.source_parquet)

    checkpoint = args.checkpoint or tempfile.mkdtemp(prefix="kss_cli_ckpt_")
    q = pipe.start(
        messages,
        checkpoint=checkpoint,
        available_now=args.available_now or not args.brokers,
    )
    q.awaitTermination()
    for batch_id, n, n_distinct, summary in pipe.summaries:
        print(f"[batch {batch_id}] n={n} distinct={n_distinct} :: {summary}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
