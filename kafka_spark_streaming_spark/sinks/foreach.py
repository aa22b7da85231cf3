"""Per-record executor-side sink (SURVEY.md S5).

The reference's second entry point writes every record from inside
foreachPartition on the executors (KafkaStreamerToHbase.scala:156-160),
re-creating connections per partition per batch. The idiomatic
Structured Streaming shape is a ForeachWriter: open(partition, epoch)
is the connection-setup hook, process(row) the per-record put, close
the teardown — Spark calls it on executors, once per partition per
epoch.

This file-backed implementation writes one file per (epoch, partition)
— overwriting on retry, so re-delivery is idempotent at the
(epoch, partition) granularity (better than the reference's
at-least-once-at-best story, SURVEY.md §4 fault tolerance row).
"""

from __future__ import annotations

import glob
import os


class RecordForeachWriter:
    """ForeachWriter protocol object for df.writeStream.foreach(...).

    Rows must have fields (rowkey, qualifier, value). In a real deploy
    `open` would create the HBase/Kafka connection from a pooled
    client; here it opens a file handle.
    """

    def __init__(self, out_dir: str, cf: str = "cf1"):
        self.out_dir = out_dir
        self.cf = cf
        self._fh = None
        self._tmp = None
        self._final = None

    def open(self, partition_id: int, epoch_id: int) -> bool:
        os.makedirs(self.out_dir, exist_ok=True)
        self._final = os.path.join(
            self.out_dir, f"epoch={epoch_id:08d}-part={partition_id:05d}.tsv"
        )
        # unique per attempt: with speculation (or a zombie attempt
        # surviving a retry) two attempts of the same (epoch, partition)
        # run concurrently — a shared tmp path would let the loser write
        # through the winner's renamed inode
        self._tmp = f"{self._final}.inprogress.{os.getpid()}-{id(self)}"
        # an attempt killed without close() (zombie executor) strands its
        # .inprogress file forever; the retry owns this (epoch, partition)
        # now, so best-effort-unlink siblings. A still-RUNNING concurrent
        # attempt may lose its tmp here — it then crashes at its own
        # close() and never commits, which is the correct loser outcome.
        for stale in glob.glob(f"{self._final}.inprogress.*"):
            try:
                os.remove(stale)
            except OSError:
                pass
        self._fh = open(self._tmp, "w", encoding="utf-8")
        return True

    def process(self, row) -> None:
        key = "" if row.rowkey is None else str(row.rowkey)
        val = "" if row.value is None else str(row.value)
        qual = "" if row.qualifier is None else str(row.qualifier)
        self._fh.write(f"{key}\t{self.cf}\t{qual}\t{val}\n")

    def close(self, error) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
            if error is None:
                os.replace(self._tmp, self._final)
            else:
                # best-effort: a concurrent retry's open() may already
                # have reclaimed this tmp — the task is failing anyway,
                # and a FileNotFoundError here would mask the real error
                try:
                    os.remove(self._tmp)
                except OSError:
                    pass


TSV_SCHEMA = "rowkey string, cf string, qualifier string, value string"


def read_sink(spark, out_dir: str):
    """Committed sink rows only — *.tsv; `.inprogress.*` attempt files
    (live writers, or zombies not yet reclaimed by a retry's open()) are
    excluded by the glob so a consumer never sees a partial file."""
    return (
        spark.read.schema(TSV_SCHEMA)
        .option("sep", "\t")
        .option("pathGlobFilter", "*.tsv")
        # CSV's default nullValue is "" — that would round-trip an
        # empty-string field (process() writes "" for None AND for "")
        # back as NULL, silently diverging from any oracle that groups
        # under ''. A NUL sentinel never occurs in the data, so empty
        # fields read back as '' exactly as written.
        .option("nullValue", "\x00")
        .csv(out_dir)
    )
