"""Multimodal-column queries (rows-only where Python UDF paths are
involved; the pure-plumbing aggregates get oracles via portable
derivations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal as M
from .helpers import T, sort_cut
from .registry import query


@query(
    "media_metadata_stats",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         length(text) AS payload_bytes,
         CAST(n_chars % 640 + 16 AS INTEGER) AS width,
         CAST(n_chars % 32 + 1 AS INTEGER) AS n_frames
  FROM documents
)
SELECT media_type, count(*) AS n, CAST(sum(payload_bytes) AS BIGINT) AS total_bytes,
       min(width) AS min_width, max(width) AS max_width, CAST(sum(n_frames) AS BIGINT) AS total_frames
FROM media GROUP BY 1 ORDER BY media_type
""",
    tags=("multimodal", "metadata"),
)
def media_metadata_stats(spark, sf_dir):
    """Typed-metadata aggregation over the media table (binary payload
    untouched — column pruning drops it at the scan; at 100 TB this query
    never reads the heavy bytes)."""
    media = M.media_from_documents(T(spark, sf_dir, "documents"))
    return (
        media.select(
            "media_type",
            F.length("payload").alias("payload_bytes"),
            F.col("meta.width").alias("width"),
            F.col("meta.n_frames").alias("n_frames"),
        )
        .groupBy("media_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("payload_bytes").alias("total_bytes"),
            F.min("width").alias("min_width"),
            F.max("width").alias("max_width"),
            F.sum("n_frames").alias("total_frames"),
        )
        .orderBy("media_type")
    )


@query(
    "media_feature_extraction",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         text, sha256(text) AS h
  FROM documents
),
parsed AS (
  SELECT media_id, media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
         CAST(list_sum(list_transform(generate_series(1, 8),
              i -> CAST(strpos('0123456789abcdef', substr(h, i, 1)) - 1 AS BIGINT)
                   * (CAST(1 AS BIGINT) << (4 * (8 - i))))) AS BIGINT) AS sha32,
         CAST(list_sum(list_transform(generate_series(1, 16),
              i -> (strpos('0123456789abcdef', substr(h, 2*i-1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1))) AS BIGINT) AS bytesum
  FROM media
)
SELECT media_id, media_type, payload_bytes,
       CAST(sha32 % 100000 AS INTEGER) AS payload_sha,
       CAST(bytesum AS DOUBLE) / 16 / 255.0 AS feat_mean,
       CAST(16 AS INTEGER) AS feat_dim
FROM parsed ORDER BY media_id
""",
    tags=("multimodal", "mapInPandas"),
)
def media_feature_extraction(spark, sf_dir):
    """Arrow-batched mapInPandas decode/feature plumbing (deterministic
    fake decoder; real codecs are a one-function swap). Binary column dies
    at extraction — only small typed features flow on.

    Hash-verified (round-3 verdict #6): the stand-in decoder is
    digest-derived (sha256), so DuckDB replays it exactly — the first 4
    digest bytes parsed from hex give payload_sha, the first-16-byte sum
    gives feat_mean ((s/16)/255.0: /16 is an exponent shift so the only
    rounding is the final /255.0, identical IEEE in both engines). The
    hash match therefore verifies the REAL mapInPandas operator, not a
    SQL restatement."""
    media = M.media_from_documents(T(spark, sf_dir, "documents"))
    # sort_cut: orderBy's range sampler would run the mapInPandas
    # feature extraction twice; per-media output is data-sized, so cut
    # lineage and keep the parallel range sort (plans/helpers.py, r13)
    return sort_cut(M.extract_features(media), "media_id")


@query(
    "video_frame_sampling",
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         CAST(n_chars % 32 + 1 AS INTEGER) AS n_frames
  FROM documents
)
SELECT media_id, frame_idx FROM (
  SELECT media_id, unnest(generate_series(0, n_frames - 1)) AS frame_idx
  FROM media WHERE media_type = 'video'
) t
WHERE frame_idx % 4 = 0
ORDER BY media_id, frame_idx
""",
    tags=("multimodal", "frames"),
)
def video_frame_sampling(spark, sf_dir):
    """Frame-sampling plan: explode metadata frame indices, keep every 4th
    (seek-and-decode happens per selected frame in the real sampler).
    Oracle checks the plan's row space exactly."""
    media = M.media_from_documents(T(spark, sf_dir, "documents"))
    return sort_cut(M.frame_sample_plan(media, every_n=4), "media_id", "frame_idx")
