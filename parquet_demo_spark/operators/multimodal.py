"""Multimodal column surface (charter): opaque binary payloads + typed
metadata, with decode/feature-extraction as Arrow-batched Python stages.

Design for 100 TB of images/audio/video:

- The payload is an opaque ``binary`` column beside typed metadata
  (kind, n_bytes, checksum) — never parsed by the JVM, only moved.
  Parquet stores it chunked+compressed; column pruning means metadata
  queries never touch the bytes.
- Decode / resize / frame-sample run in ``mapInPandas``: Arrow batches
  stream through Python with bounded memory (maxRecordsPerBatch), one
  Python worker per core per executor — the only sane place for codec
  libraries in a Spark job.
- The codec step itself is STUBBED here (no image/audio libs in this
  container): ``decode_media_stub`` raises NotImplementedError, and the
  tested path uses a deterministic fake decoder whose outputs are pure
  arithmetic on the payload bytes — so the Spark-side plumbing (schema,
  batching, UDF signature) is real and oracle-checkable end to end.

The binary payloads are derived from documents.text (utf-8 bytes) since
the fixtures carry no media; the pipeline is payload-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_demo_spark.catalog import load
from parquet_demo_spark.registry import register

MEDIA_SCHEMA = (
    "doc_id bigint, kind string, payload binary, n_bytes bigint, checksum string"
)

FEATURE_SCHEMA = (
    "doc_id bigint, kind string, n_bytes bigint, width bigint, height bigint, "
    "n_frames bigint"
)


def build_media_table(spark: SparkSession, sf: str) -> DataFrame:
    """documents.text → opaque binary payload + typed metadata columns."""
    docs = load(spark, sf, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def decode_media_stub(payload: bytes, kind: str) -> dict:
    """Real codec hook — not available in this container.

    In production this dispatches to PIL/libav/etc. per ``kind`` and
    returns decoded tensors; the Spark-side contract (called per row
    inside the mapInPandas batch loop) is what the engine tests.
    """
    raise NotImplementedError(
        "media codecs not bundled; use extract_features(..., fake=True) "
        "for the deterministic test decoder"
    )


def _fake_decode(n_bytes: int, kind: str) -> tuple[int, int, int]:
    """Deterministic stand-in decoder: pure arithmetic on payload size."""
    width = 1 + n_bytes % 64
    height = 1 + n_bytes % 48
    n_frames = 1 + n_bytes % 8 if kind == "video" else 1
    return width, height, n_frames


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batch streaming)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if fake:
                sizes = pdf["payload"].map(len)
                decoded = [
                    _fake_decode(n, k) for n, k in zip(sizes, pdf["kind"])
                ]
            else:  # pragma: no cover - requires codec libs
                decoded = [
                    decode_media_stub(p, k)
                    for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            out = pd.DataFrame(
                decoded, columns=["width", "height", "n_frames"]
            )
            out.insert(0, "n_bytes", sizes.values)
            out.insert(0, "kind", pdf["kind"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_bytes bigint"


def sample_frames(media: DataFrame) -> DataFrame:
    """Frame sampling: one output row per (video, frame) — the
    UDTF-shaped mapInPandas stage (rows expand). The fake decoder emits
    n_frames rows with deterministic per-frame byte counts; a real
    decoder would yield actual frame tensors in their place."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, kind, n_bytes in zip(
                pdf["doc_id"], pdf["kind"], pdf["n_bytes"]
            ):
                if kind != "video":
                    continue
                _, _, n_frames = _fake_decode(int(n_bytes), kind)
                for i in range(n_frames):
                    rows.append((int(doc_id), i, int(n_bytes) // n_frames))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes"]
            )

    return media.select("doc_id", "kind", "n_bytes").mapInPandas(
        batches, FRAME_SCHEMA
    )


@register(
    "q54b_multimodal_frames",
    oracle="""
    WITH vids AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(1 + octet_length(encode(text)) % 8 AS BIGINT) AS n_frames
      FROM documents
      WHERE CAST(doc_id % 3 AS INTEGER) = 2  -- 'video' kind
    )
    SELECT doc_id,
           CAST(f AS BIGINT) AS frame_idx,
           CAST(n_bytes // n_frames AS BIGINT) AS frame_bytes
    FROM vids CROSS JOIN unnest(range(0, 8)) AS t(f)
    WHERE f < n_frames
    ORDER BY doc_id, frame_idx LIMIT 500
    """,
    doc="Multimodal frame sampling: per-video frame rows out of "
    "mapInPandas (row-expanding UDTF shape) — the plumbing a real "
    "frame extractor drops into.",
)
def q54b(spark: SparkSession, sf: str) -> DataFrame:
    media = build_media_table(spark, sf)
    return (
        sample_frames(media)
        .orderBy("doc_id", "frame_idx")
        .limit(500)
    )


@register(
    "q54_multimodal_metadata",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum
    FROM documents ORDER BY doc_id LIMIT 200
    """,
    doc="Multimodal metadata pass: opaque binary payload column + typed "
    "metadata (kind/size/md5) — the bytes never leave the JVM; column "
    "pruning keeps metadata queries payload-free.",
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    media = build_media_table(spark, sf)
    return (
        media.select("doc_id", "kind", "n_bytes", "checksum")
        .orderBy("doc_id")
        .limit(200)
    )


@register(
    "q55_multimodal_features",
    oracle="""
    SELECT doc_id, kind, n_bytes,
           CAST(1 + n_bytes % 64 AS BIGINT) AS width,
           CAST(1 + n_bytes % 48 AS BIGINT) AS height,
           CAST(CASE WHEN kind = 'video' THEN 1 + n_bytes % 8 ELSE 1 END
                AS BIGINT) AS n_frames
    FROM (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INTEGER)
                  WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents)
    ORDER BY doc_id LIMIT 200
    """,
    doc="Multimodal decode/feature-extract through mapInPandas (Arrow "
    "batches, bounded memory): deterministic fake decoder exercises the "
    "real plumbing — schema, batch shape, per-kind dispatch; the codec "
    "call is the stubbed seam (decode_media_stub).",
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    media = build_media_table(spark, sf)
    feats = extract_features(media, fake=True)
    return feats.orderBy("doc_id").limit(200)
