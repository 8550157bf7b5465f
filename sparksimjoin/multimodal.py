"""Multimodal column plumbing (task brief): image/audio/video as
opaque ``binary`` columns with typed metadata. The Spark-side
machinery — schema, Arrow batch shape, ``mapInPandas`` signatures,
partition sizing — is real and tested; the actual codec calls are
stubbed (image/audio libraries are not in this container) behind a
deterministic fake keyed on content hash, with the real call site
marked.

Pattern at scale: media rows are large -> keep them in their own
table keyed by (doc_id, media_idx), repartition by size budget before
the decode stage, and let the pandas UDF stream per-batch (Arrow)
rather than per-row."""

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
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "features array<float>, decode_status string"
)


def _fake_decode(payload: bytes, kind: str, feat_dim: int = 8) -> list[float]:
    """Deterministic stand-in for the real decoder. REAL IMPLEMENTATION
    would be e.g. PIL.Image.open / torchaudio.load / pyav frame
    sampling here; not available in this container."""
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:feat_dim]]


def decode_features(media: DataFrame, feat_dim: int = 8, strict: bool = False) -> DataFrame:
    """mapInPandas decode/feature-extract stage. ``strict=True``
    raises NotImplementedError at the decode call site (the honest
    behavior without codec libs); default uses the deterministic fake
    so the distributed plumbing is testable end-to-end.

    DEPLOYMENT NOTE: on real media, run with ``strict=True`` until a
    real decoder is plugged in at the marked call site — the default
    fake produces hash-derived pseudo-features that are only useful
    for exercising the pipeline, and silently treating them as real
    image/audio features would corrupt any downstream model."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media codecs unavailable in this environment; "
                    "plug PIL/torchaudio/pyav here"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda p: 0 if p is None else len(p)).astype("int32"),
                    "sha256": payloads.map(
                        lambda p: None if p is None else hashlib.sha256(p).hexdigest()
                    ),
                    "features": payloads.map(
                        lambda p: None if p is None else _fake_decode(bytes(p), "", feat_dim)
                    ),
                    # 'stub_sha256', never 'ok': the stand-in output
                    # is self-identifying so hash-derived pseudo-
                    # features can never be mistaken for real media
                    # features downstream (a real decoder emits 'ok')
                    "decode_status": payloads.map(
                        lambda p: "null" if p is None else "stub_sha256"
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (decode stubbed, schedule real). Pure Spark:
    explode a generated timestamp sequence from metadata."""
    v = media.where(F.col("kind") == "video")
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return v.select(
        "media_id",
        F.explode(ts).alias("frame_ts_ms"),
        F.sha2(F.concat(F.sha2(F.col("payload"), 256), F.lit(":"),
                        F.col("media_id").cast("string")), 256).alias("frame_key"),
    )
