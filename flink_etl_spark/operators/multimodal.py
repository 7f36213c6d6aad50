"""Multimodal column plumbing: opaque binary media + typed metadata.

Design (extension surface, SURVEY.md §2.12): media travels as a
`BINARY` column with typed metadata columns beside it; decode /
feature-extraction runs as Arrow-batched `mapInPandas` so bytes never
round-trip through Python row-at-a-time.

The decode step itself is STUBBED — the container has no image/audio
codecs — behind `decode_media`, which by default raises
NotImplementedError and with `fake=True` produces a deterministic fake
feature vector from the bytes. The Spark-side plumbing (schema,
partition shape, UDF signature, Arrow batch handling) is real and
tested; swapping the stub for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: schema of a decoded-feature record (one per media row)
DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def make_media_table(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a media table from documents: payload = utf-8 bytes of the
    text (a deterministic stand-in for image/audio blobs), plus typed
    metadata. Real pipelines read `binaryFile` sources or parquet BINARY
    columns; everything downstream only sees (binary, metadata)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass: sizes and a hex fingerprint prefix of the
    payload — the kind of cheap triage (corrupt/empty/oversized blobs)
    that should never touch Python."""
    hexed = F.lower(F.hex(F.col("payload")))
    return media.select(
        "media_id",
        "mime",
        F.length(F.col("payload")).cast("long").alias("n_bytes"),
        F.substring(hexed, 1, 16).alias("head_hex"),
        F.expr("right(lower(hex(payload)), 8)").alias("tail_hex"),
    )


def decode_media(media: DataFrame, fake: bool = True, batch_hint: int | None = None) -> DataFrame:
    """Decode/feature-extract media via Arrow-batched mapInPandas.

    `fake=True` (tests / codec-less containers): deterministic fake
    decode — width/height derived from byte length, an 8-dim feature
    vector from byte-value moments. `fake=False` raises
    NotImplementedError where a real codec (PIL / torchaudio / ffmpeg)
    would be called.

    Scale: mapInPandas streams Arrow batches per partition — no
    collect, no per-row Python crossing; repartition upstream so one
    batch's blobs fit executor memory (e.g. 64 MB of payload per batch).
    """

    def decode_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
        # NOTE: this closure must be fully self-contained (no references
        # to flink_etl_spark module globals): executor Python workers do
        # not have the repo on sys.path when the engine is driven from an
        # external harness, and cloudpickle serializes module-level
        # references by name, not value.
        import pandas as pd

        def fake_features(payload: bytes) -> list[float]:
            if not payload:
                return [0.0] * 8
            n = len(payload)
            total = sum(payload)
            mean = total / n
            var = sum((b - mean) ** 2 for b in payload) / n
            return [
                float(n),
                round(mean, 6),
                round(var, 6),
                float(max(payload)),
                float(min(payload)),
                float(payload[0]),
                float(payload[-1]),
                float(total % 997),
            ]

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires image/audio codecs absent "
                    "from this container; use fake=True for plumbing tests"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n_bytes,
                    # deterministic fake geometry from payload size
                    "width": (n_bytes % 640) + 1,
                    "height": (n_bytes % 480) + 1,
                    "features": [fake_features(bytes(p)) for p in payloads],
                }
            )
            yield out

    return media.mapInPandas(decode_batches, DECODE_SCHEMA)
