"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas functions over ``mapInPandas`` so each task
processes whole record batches without JVM<->Python row churn.

The actual codecs (PIL/ffmpeg/soundfile) are NOT present in this
container, so the decode step is stubbed: ``decode_stub=True`` produces
a deterministic fake decode (content-hash-seeded), otherwise
NotImplementedError surfaces at task level. The Spark-side plumbing —
schema, batch iteration, partitioning, output shapes — is real and
tested; swapping in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, digest string, "
    "feature array<double>"
)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a synthetic media table from the documents table: the
    utf-8 text bytes stand in for an opaque encoded payload."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 30).cast("int").alias("n_frames"),
            F.lit("synthetic").alias("format"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image/audio decode: a fixed-
    length float vector seeded by the payload digest."""
    digest = hashlib.sha256(payload).digest()
    seed = np.frombuffer(digest[:8], dtype=np.uint64)[0]
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM)


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + featurize each media payload via mapInPandas.

    Real codecs are unavailable here; with ``decode_stub=False`` this
    raises NotImplementedError inside the task (the production hook
    point). Output: FEATURES_SCHEMA.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media codecs are not available in this environment; "
                    "plug a decoder in place of _fake_decode"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: _fake_decode(bytes(b)).tolist()
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Image-resize plumbing: recompute metadata + pass the payload
    through the (stubbed) resize kernel. The Spark-side shape — narrow
    map, payload column in/out, metadata struct rewrite — is exactly
    what a real PIL/opencv kernel drops into.

    Output: media schema with meta.width/height set to the target and
    a ``scale_x/scale_y`` column pair recording the transform.
    """
    img = media.filter(F.col("kind") == "image")
    return img.select(
        "media_id",
        "kind",
        "payload",  # stub: real kernel would re-encode here
        F.struct(
            F.lit(target_w).alias("width"),
            F.lit(target_h).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
            F.col("meta.format").alias("format"),
        ).alias("meta"),
        (F.lit(target_w) / F.greatest(F.col("meta.width"), F.lit(1))).alias("scale_x"),
        (F.lit(target_h) / F.greatest(F.col("meta.height"), F.lit(1))).alias("scale_y"),
    )


def sample_frames(media: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit one row per
    sampled frame index (decode stubbed, shapes real).

    Output: (media_id, frame_idx).
    """
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_nth),
                )
            ).alias("frame_idx"),
        )
    )
