"""Multimodal columns (north star, BASELINE.json:6).

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct. The container has no media libraries, so the decode
step is STUBBED (deterministic fake registered by default, and a
clearly-marked NotImplementedError path for real codecs) — but the
Spark-side plumbing is real and tested: schema, binary handling,
Arrow batch shape through mapInPandas, partition behavior.

At scale: binary payloads ride in the same parquet row groups as their
metadata; filters on metadata prune row groups before any byte of
media is read (predicate pushdown on the struct fields), and decode
runs as Arrow-batched Python with spark.sql.execution.arrow
.maxRecordsPerBatch bounding executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_spark_streaming_spark.operators.registry import register
from kafka_spark_streaming_spark.tables import table

FEATURE_DIM = 8


def media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic media table: (doc_id, payload binary,
    meta struct<n_bytes, mime, width, height>).

    Deliberately NOT spread (tables.spread_scan): at fixture scale the
    A/B showed every consumer 1.25-1.5x SLOWER with a pre-Arrow
    exchange — fanning 32 Python workers over 5000 tiny payloads costs
    more than the single-worker fold saves (r21 measurement). At real
    scale the corpus arrives multi-split and parallelizes by itself."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length("text").cast("bigint").alias("n_bytes"),
            F.when(F.col("doc_id") % 3 == 0, "image/png")
            .when(F.col("doc_id") % 3 == 1, "audio/wav")
            .otherwise("video/mp4")
            .alias("mime"),
            ((F.col("doc_id") % 16) * 64 + 64).cast("int").alias("width"),
            ((F.col("doc_id") % 9) * 64 + 64).cast("int").alias("height"),
        ).alias("meta"),
    )


# --- manifest projection (oracle-checked binary/metadata handling) -------
@register(
    "m_media_manifest",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           CAST((doc_id % 16) * 64 + 64 AS INT) AS width,
           CAST((doc_id % 9) * 64 + 64 AS INT) AS height
    FROM documents
    """,
)
def m_media_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_manifest(spark, sf_dir)
    return m.select(
        "doc_id",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


# --- decode / feature-extract (Arrow-batched Python) ---------------------
def decode_media(payload: bytes, mime: str):
    """Real decode would dispatch on mime to PIL/ffmpeg/torchaudio —
    none of which exist in this container."""
    raise NotImplementedError(
        "media codecs unavailable in this environment; use "
        "fake_features (deterministic stub) for the pipeline plumbing"
    )


def fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a feature extractor: normalized
    8-bin byte histogram. Keeps the full pipeline testable."""
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b >> 5] += 1
    total = len(payload) or 1
    return [c / total for c in counts]


def media_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    Arrow batch path a decoder would use (one pdf per Arrow batch,
    payload bytes → fixed-dim feature vector). Array-returning internal
    helper; the *registered* query explodes to scalars because the
    driver's pandas canon cannot sort/hash list cells."""
    m = media_manifest(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "mime": [m_["mime"] for m_ in pdf["meta"]],
                    "features": feats,
                }
            )

    return m.mapInPandas(
        extract, schema="doc_id long, mime string, features array<double>"
    )


# The fake extractor is a byte histogram; the corpus is pure ASCII at
# every sf (verified), so byte == character and DuckDB can recompute the
# exact feature values char-wise — a full value-level oracle for the
# Arrow extraction path. (On a non-ASCII corpus this oracle would need
# encode()-level byte access instead.)
@register(
    "m_media_features",
    f"""
    WITH chars AS (
      SELECT doc_id, ascii(unnest(string_split(text, ''))) >> 5 AS bin
      FROM documents
    ), counts AS (
      SELECT doc_id, bin, COUNT(*) AS c FROM chars GROUP BY doc_id, bin
    ), bins AS (
      SELECT d.doc_id, length(d.text) AS total, r.range AS pos
      FROM documents d, range({FEATURE_DIM}) r
    )
    SELECT b.doc_id,
           CASE WHEN b.doc_id % 3 = 0 THEN 'image/png'
                WHEN b.doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           CAST(b.pos AS INT) AS pos,
           CAST(COALESCE(c.c, 0) AS DOUBLE)
             / CAST(greatest(b.total, 1) AS DOUBLE) AS value
    FROM bins b LEFT JOIN counts c
      ON c.doc_id = b.doc_id AND c.bin = b.pos
    """,
)
def m_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = media_feature_vectors(spark, sf_dir)
    return feats.select(
        "doc_id",
        "mime",
        F.posexplode("features").alias("pos", "value"),
    ).select("doc_id", "mime", F.col("pos").cast("int").alias("pos"), "value")


# --- per-mime stats over extracted features ------------------------------
# f3 = share of bytes in bin 3 (codes 96-127: lowercase ASCII) — the
# non-degenerate bin on this corpus. Exact oracle via the same char-wise
# recomputation as m_media_features.
@register(
    "m_mime_feature_stats",
    """
    WITH f3 AS (
      SELECT doc_id,
             CAST(length(text) - length(regexp_replace(text, '[`a-z{{|}}~\x7f]', '', 'g')) AS DOUBLE)
               / CAST(greatest(length(text), 1) AS DOUBLE) AS f3
      FROM documents
    )
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS mime,
           COUNT(*) AS n,
           round(AVG(f3), 6) AS avg_f3
    FROM f3 GROUP BY 1
    """,
)
def m_mime_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = media_feature_vectors(spark, sf_dir)
    return (
        feats.select(
            "mime", F.element_at("features", 4).alias("f3")
        )
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("f3"), 6).alias("avg_f3"),
        )
    )


# --- frame sampling (video → k frames, row explosion in Python) ----------
def fake_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Deterministic stand-in for ffmpeg frame extraction: slice the
    payload into n evenly-spaced chunks. Real decode goes through
    decode_media (NotImplementedError here — codecs absent)."""
    if not payload:
        return []
    step = max(len(payload) // n_frames, 1)
    return [payload[i * step : (i + 1) * step] for i in range(n_frames)]


# Deterministic slicing stub + ASCII corpus ⇒ DuckDB reproduces every
# frame byte-for-byte (substr on chars == slice on bytes), md5 included.
@register(
    "m_frame_sample",
    """
    WITH v AS (
      SELECT doc_id, text, greatest(length(text) // 4, 1) AS step
      FROM documents WHERE doc_id % 3 = 2 AND length(text) > 0
    )
    SELECT doc_id,
           CAST(r.range AS INT) AS frame_idx,
           CAST(octet_length(encode(substr(text, CAST(r.range * step + 1 AS INT), CAST(step AS INT))))
                AS BIGINT) AS frame_bytes,
           md5(substr(text, CAST(r.range * step + 1 AS INT), CAST(step AS INT))) AS frame_md5
    FROM v, range(4) r
    """,
)
def m_frame_sample(spark: SparkSession, sf_dir: str, n_frames: int = 4) -> DataFrame:
    """Frame sampling over video rows: mapInPandas explodes each video
    payload into (doc_id, frame_idx, frame binary, n_bytes) rows — the
    Arrow-batched row-expansion shape a real ffmpeg sampler uses. At
    100 TB the explosion factor (frames/video) multiplies output
    partitions, so the input stays partitioned by doc_id and frames
    inherit it — no shuffle added by the sampler itself."""
    m = media_manifest(spark, sf_dir).filter(
        F.col("meta.mime") == "video/mp4"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_frame = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, frame in enumerate(fake_frames(payload, n_frames)):
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_frame.append(frame)
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_idx": out_idx,
                    "frame": out_frame,
                }
            )

    frames = m.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame binary"
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame").cast("bigint").alias("frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    )


# --- resize plumbing (stubbed codec, real schema/batch path) -------------
# Crop/pad arithmetic + metadata math is fully closed-form — exact oracle.
@register(
    "m_resize_stub",
    """
    SELECT doc_id,
           CAST(least(octet_length(encode(text)), 4096) AS BIGINT)
               AS resized_bytes,
           CAST(least(64, (doc_id % 16) * 64 + 64) AS INT) AS out_w,
           CAST(least(64, (doc_id % 9) * 64 + 64) AS INT) AS out_h
    FROM documents WHERE doc_id % 3 = 0
    """,
)
def m_resize_stub(spark: SparkSession, sf_dir: str,
                  target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Image-resize pipeline shape: images → (doc_id, resized binary,
    out_w, out_h). The pixel work is a deterministic stub (PIL absent);
    the Arrow batching, binary columns, and metadata math are real."""
    m = media_manifest(spark, sf_dir).filter(
        F.col("meta.mime") == "image/png"
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                # stub: crop/pad payload to the target "pixel count"
                (p[: target_w * target_h] if p else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "resized": resized,
                    "out_w": [min(target_w, m_["width"]) for m_ in pdf["meta"]],
                    "out_h": [min(target_h, m_["height"]) for m_ in pdf["meta"]],
                }
            )

    out = m.mapInPandas(
        resize, schema="doc_id long, resized binary, out_w int, out_h int"
    )
    return out.select(
        "doc_id",
        F.octet_length("resized").cast("bigint").alias("resized_bytes"),
        "out_w",
        "out_h",
    )


# --- audio chunking (overlapping windows, mapInPandas) -------------------
# The framing step ahead of any spectrogram/ASR featurizer: each audio
# payload becomes 50%-overlapping fixed-size windows (64-byte chunks,
# 32-byte hop, capped at 6 — stand-ins for 25 ms / 10 ms frames).
# Chunking is pure payload arithmetic, so it runs as a deterministic
# Arrow-batched mapInPandas over rows partitioned by doc_id — the
# explosion inherits the input partitioning, no shuffle — and DuckDB
# reproduces every chunk byte-for-byte via substr on the ASCII corpus.
_CHUNK, _HOP, _MAX_CHUNKS = 64, 32, 6


@register(
    "m_audio_chunks",
    f"""
    WITH a AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n
      FROM documents WHERE doc_id % 3 = 1 AND length(text) > 0)
    SELECT doc_id, CAST(r.range AS INT) AS chunk_idx,
           CAST(octet_length(encode(substr(
                 text, CAST(r.range * {_HOP} + 1 AS INT), {_CHUNK})))
             AS BIGINT) AS chunk_bytes,
           md5(substr(text, CAST(r.range * {_HOP} + 1 AS INT), {_CHUNK}))
             AS chunk_md5
    FROM a, range({_MAX_CHUNKS}) r
    WHERE r.range * {_HOP} < a.n
    """,
)
def m_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_manifest(spark, sf_dir).filter(
        (F.col("meta.mime") == "audio/wav") & (F.col("meta.n_bytes") > 0)
    )

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_chunk = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(_MAX_CHUNKS):
                    start = i * _HOP
                    if start >= len(payload):
                        break
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_chunk.append(payload[start : start + _CHUNK])
            yield pd.DataFrame(
                {"doc_id": out_doc, "chunk_idx": out_idx, "chunk": out_chunk}
            )

    chunks = m.mapInPandas(
        chunk, schema="doc_id long, chunk_idx int, chunk binary"
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.octet_length("chunk").cast("bigint").alias("chunk_bytes"),
        F.md5("chunk").alias("chunk_md5"),
    )
