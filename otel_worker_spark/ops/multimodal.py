"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The real decode (image/audio/video libraries) is NOT available in this
container, so the decode kernel is stubbed two ways:

- ``decode_stub="fake"`` (default): a deterministic fake that derives
  "features" from the payload bytes — real Spark plumbing (schema,
  partitioning, Arrow batch shapes) with fake math, so the pipeline is
  fully testable;
- ``decode_stub="raise"``: the production placeholder that raises
  ``NotImplementedError`` where a real ``PIL.Image.open`` /
  ``torchaudio.load`` call would go.

The Spark-side shape is exactly what a production multimodal pipeline
needs: binary column in, fixed-size feature struct out, one Arrow
batch at a time, no per-row Python calls outside the vectorized
numpy section, and ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounding executor memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "width int, height int, intensity_sum long, mean_intensity double, "
    "feature array<float>"
)

FEATURE_DIM = 8


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Adapter: treat each document's text bytes as an opaque media
    payload with typed metadata — the multimodal table shape
    (payload binary, media_type, doc_id)."""
    return documents.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
    )


def extract_features(media: DataFrame, decode_stub: str = "fake") -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Batch shape: pdf.payload is a pandas Series of bytes; the fake
    decode does vectorized numpy over the byte buffers. A real decoder
    drops in at the marked call site without touching the plumbing.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "real media decode (PIL/torchaudio/ffmpeg) is not "
                    "available in this environment"
                )
            # One vectorized pass over the WHOLE batch: all payloads
            # concatenated into a single byte buffer, per-row segments
            # addressed by offsets (reduceat for sums, one global
            # bincount for every row's histogram at once). No per-row
            # Python; a real decoder replaces the marked section.
            n = len(pdf)
            lens = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            buf = np.frombuffer(b"".join(pdf["payload"]), dtype=np.uint8)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # --- real decoder goes here (PIL.Image.open etc.) ---
            widths = np.maximum(1, np.sqrt(lens).astype(np.int64))
            heights = np.maximum(1, lens // widths)
            # exact integer byte sums (the hash-verifiable quantity the
            # DuckDB oracle reproduces; mean is the derived float)
            sums = np.zeros(n, dtype=np.int64)
            nonempty = lens > 0
            if buf.size:
                seg_sums = np.add.reduceat(buf.astype(np.int64), starts[nonempty])
                sums[nonempty] = seg_sums
            means = np.where(nonempty, sums / np.maximum(1, lens), 0.0)
            # 8-bucket byte histogram per row: bucket = byte >> 5
            # (identical to np.histogram(bins=8, range=(0, 256)))
            row_idx = np.repeat(np.arange(n), lens)
            hist = np.bincount(
                row_idx * FEATURE_DIM + (buf >> 5), minlength=n * FEATURE_DIM
            ).reshape(n, FEATURE_DIM)
            feats = (hist / np.maximum(1, lens)[:, None]).astype(np.float32)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": pd.Series(lens, dtype="int32"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "intensity_sum": pd.Series(sums, dtype="int64"),
                    "mean_intensity": pd.Series(means, dtype="float64"),
                    "feature": pd.Series(list(feats)),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def media_features_exact(documents: DataFrame) -> DataFrame:
    """The oracle-checkable per-document projection (r1 verdict item
    7): every column is exact-integer math over the payload bytes, so
    a DuckDB oracle reproduces it bit-for-bit (the fixture payloads
    are ASCII text bytes — ascii codepoint == byte) and the op gets
    rows+schema+hash verification instead of a rows-only check."""
    return extract_features(documents_as_media(documents)).select(
        "doc_id", "media_type", "n_bytes", "width", "height", "intensity_sum"
    )


def media_features_exact_sql() -> str:
    return """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
       CAST(length(text) AS INT) AS n_bytes,
       CAST(greatest(1, floor(sqrt(length(text)))) AS INT) AS width,
       CAST(greatest(1, length(text) // CAST(greatest(1, floor(sqrt(length(text)))) AS BIGINT)) AS INT) AS height,
       CAST(coalesce(list_sum([ascii(c) for c in string_split(text, '')]), 0) AS BIGINT) AS intensity_sum
FROM documents
"""


def media_feature_summary(documents: DataFrame) -> DataFrame:
    """documents → media adapter → feature extraction → per-type
    aggregate (the end-to-end multimodal flow).

    Every output column is exact-integer math (integer sums are
    order-independent across partitions; the intensity ratio is a
    floor-scaled integer over the group's integer totals), so the
    DuckDB oracle verifies the whole flow with rows+schema+hash —
    a float ``avg()`` here would hash-diverge on summation order."""
    feats = extract_features(documents_as_media(documents))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("intensity_sum").alias("total_intensity"),
            F.expr(
                "CAST(floor(1000000.0 * sum(intensity_sum) / sum(n_bytes)) AS BIGINT)"
            ).alias("intensity_per_byte_u"),
        )
        .orderBy("media_type")
    )


def media_feature_summary_sql() -> str:
    return """
SELECT media_type, count(*) AS n_docs,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       CAST(sum(intensity_sum) AS BIGINT) AS total_intensity,
       CAST(floor(1000000.0 * sum(intensity_sum) / sum(n_bytes)) AS BIGINT) AS intensity_per_byte_u
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'audio/wav' END AS media_type,
         length(text) AS n_bytes,
         coalesce(list_sum([ascii(c) for c in string_split(text, '')]), 0) AS intensity_sum
  FROM documents
) t
GROUP BY media_type ORDER BY media_type
"""
