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
    return p


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
