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
import time

# Writer-side field encoding: the sink is tab-separated /
# newline-terminated, and the reader disables CSV quoting entirely, so
# the only bytes that can break framing are the separator, record
# terminators, and the escape introducer itself. Percent-encode exactly
# those four (%, \t, \n, \r); everything else — quotes, backslashes,
# arbitrary JSON broker payloads in the --per-record CLI mode — passes
# through verbatim. decode_sink_field() inverts this in Catalyst.
_ENC = [("%", "%25"), ("\t", "%09"), ("\n", "%0A"), ("\r", "%0D")]

# With quoting disabled an unquoted empty field parses as NULL (and a
# row of only separators is dropped as all-null), so empty fields get a
# whole-field sentinel instead. Unforgeable: user data "%_" encodes to
# "%25_", never to the bare token.
_EMPTY_TOK = "%_"

# A retry's open() may only reclaim a sibling .inprogress file this
# much older than now: a zombie attempt's file has a stale mtime, while
# a live concurrent racer's (speculation, overlapping retry) is fresh —
# reclaiming only aged files keeps zombie cleanup without the
# mutual-destruction window where two racers unlink each other's tmp
# and both crash at close().
_RECLAIM_AGE_S = 60.0


def _encode_field(s: str) -> str:
    for raw, enc in _ENC:
        s = s.replace(raw, enc)
    return s if s else _EMPTY_TOK


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
        # now, so best-effort-unlink AGED siblings only — a live
        # concurrent attempt's tmp has a fresh mtime and is left alone
        # (see _RECLAIM_AGE_S).
        now = time.time()
        for stale in glob.glob(f"{self._final}.inprogress.*"):
            try:
                if now - os.path.getmtime(stale) >= _RECLAIM_AGE_S:
                    os.remove(stale)
            except OSError:
                pass
        self._fh = open(self._tmp, "w", encoding="utf-8")
        return True

    def process(self, row) -> None:
        key = _encode_field("" if row.rowkey is None else str(row.rowkey))
        val = _encode_field("" if row.value is None else str(row.value))
        qual = _encode_field(
            "" if row.qualifier is None else str(row.qualifier)
        )
        cf = _encode_field(self.cf)
        self._fh.write(f"{key}\t{cf}\t{qual}\t{val}\n")

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


def decode_sink_field(col):
    """Invert _encode_field in Catalyst. The whole-field empty sentinel
    is checked against the RAW field first; then decode order matters:
    the framing bytes first (none of their decoded outputs can create a
    new %XX sequence consumed by a later step), '%25' → '%' strictly
    last."""
    from pyspark.sql import functions as F

    raw = F.col(col) if isinstance(col, str) else col
    c = raw
    for plain, enc in (
        ("\t", "%09"),
        ("\n", "%0A"),
        ("\r", "%0D"),
        ("%", "%25"),
    ):
        c = F.call_function("replace", c, F.lit(enc), F.lit(plain))
    return F.when(raw == F.lit(_EMPTY_TOK), F.lit("")).otherwise(c)


def read_sink(spark, out_dir: str):
    """Committed sink rows only — *.tsv; `.inprogress.*` attempt files
    (live writers, or zombies not yet reclaimed by a retry's open()) are
    excluded by the glob so a consumer never sees a partial file."""
    raw = (
        spark.read.schema(TSV_SCHEMA)
        .option("sep", "\t")
        # the writer percent-encodes the only bytes that can break
        # framing; CSV quote/escape handling must therefore be OFF, or
        # a field that merely STARTS with '"' (any JSON broker payload
        # in the --per-record CLI mode) would be re-interpreted as a
        # quoted region. NUL never occurs in the encoded data.
        .option("quote", "\x00")
        .option("escape", "\x00")
        .option("pathGlobFilter", "*.tsv")
        # CSV's default nullValue is "" — that would round-trip an
        # empty-string field (process() writes "" for None AND for "")
        # back as NULL, silently diverging from any oracle that groups
        # under ''. A NUL sentinel never occurs in the data, so empty
        # fields read back as '' exactly as written.
        .option("nullValue", "\x00")
        .csv(out_dir)
    )
    return raw.select(
        *[decode_sink_field(c).alias(c) for c in raw.columns]
    )
