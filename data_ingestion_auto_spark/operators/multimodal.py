"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(LLM-data-pipeline extension).

Design (the part that matters at 100 TB):
- media is an opaque `binary` column with a typed metadata struct
  (media_type, width/height or sample_rate/duration, codec) — the schema
  travels with the data, decode stays lazy
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  `mapInPandas` operators: one Python worker per partition, whole record
  batches across the boundary, decode amortized per batch
- partitioning: media tables partition by (media_type, shard); the binary
  payload never enters a shuffle — feature extraction projects to small
  typed columns FIRST, and only those shuffle

The actual codec work (PIL/ffmpeg/librosa) is NOT in this container, so
`decode_image` raises NotImplementedError by design; `fake_decode_features`
is the deterministic stand-in that keeps every Spark-side seam (schema,
batching, UDF signature) real and testable. Swapping in a real decoder
changes only the body of one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, payload_bytes long, payload_sha int, "
    "feat_mean double, feat_dim int"
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: the text bytes stand
    in for an encoded payload; metadata derived deterministically. Keeps
    the binary-column path exercisable without image fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "media_type"
        ),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 32 + 1).cast("int").alias("n_frames"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decode boundary — image libs are not in this container.

    STUB (by design): swap in PIL/torchvision here; everything Spark-side
    (schema, batching, partitioning) is already real.
    """
    raise NotImplementedError("image codec not available in this environment")


def fake_decode_features(payload: bytes) -> tuple[int, float, int]:
    """Deterministic stand-in for decode+feature-extract: digest-derived
    pseudo-features (stable across engines/runs)."""
    h = hashlib.sha256(payload).digest()
    feat_dim = 16
    feat_mean = sum(h[:feat_dim]) / feat_dim / 255.0
    return int.from_bytes(h[:4], "big") % 100000, feat_mean, feat_dim


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow record batches in, small typed
    feature rows out. The binary column dies here — only compact features
    continue into shuffles/joins."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload"].map(len),
                    "payload_sha": [f[0] for f in feats],
                    "feat_mean": [f[1] for f in feats],
                    "feat_dim": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(op, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: explode the frame index space from
    metadata (n_frames), select every_n-th — the real sampler would seek
    into the payload per selected index inside mapInPandas; the plan shape
    (explode → filter → per-frame rows) is the production one."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(F.expr("sequence(0, meta.n_frames - 1)")).alias("frame_idx"),
        )
        .filter((F.col("frame_idx") % every_n) == 0)
    )
