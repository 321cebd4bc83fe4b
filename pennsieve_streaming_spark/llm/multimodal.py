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
    """Deterministic stand-in for a non-decodable payload (no codec for
    its format in this container): a fixed-length float vector seeded by
    the payload digest."""
    digest = hashlib.sha256(payload).digest()
    seed = np.frombuffer(digest[:8], dtype=np.uint64)[0]
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM)


def _decode_features(payload: bytes, decode_stub: bool) -> list[float]:
    """REAL decode for PNG payloads (pure-numpy codec, llm/png.py) and
    WAV/PCM audio (llm/wav.py); other formats use the deterministic
    stub, or raise when ``decode_stub=False`` (the production hook for
    ffmpeg/pillow for the remaining codecs)."""
    from pennsieve_streaming_spark.llm import gif, jpeg, png, rawimg, video, wav

    if video.is_avi(payload):
        try:
            frames, fps = video.decode_avi_mjpeg(payload)
            return video.video_features(frames, fps, FEATURE_DIM).tolist()
        except (video.VideoError, jpeg.JpegError):
            pass  # non-MJPEG AVI falls through to the stub
    if png.is_png(payload):
        return png.image_features(png.decode_png(payload), FEATURE_DIM).tolist()
    if gif.is_gif(payload):
        try:
            frame, _n_frames = gif.decode_gif(payload)
            return png.image_features(frame, FEATURE_DIM).tolist()
        except gif.GifError:
            pass  # malformed/exotic GIF falls through to the stub
    if jpeg.is_jpeg(payload):
        try:
            return png.image_features(
                jpeg.decode_jpeg(payload), FEATURE_DIM
            ).tolist()
        except jpeg.JpegError:
            pass  # arithmetic-coded/lossless JPEG falls through to the
            # stub (baseline AND progressive now decode natively)
    if rawimg.is_bmp(payload):
        try:
            return png.image_features(
                rawimg.decode_bmp(payload), FEATURE_DIM
            ).tolist()
        except rawimg.RawImageError:
            pass  # compressed/exotic DIB falls through to the stub
    if rawimg.is_netpbm(payload):
        try:
            return png.image_features(
                rawimg.decode_netpbm(payload), FEATURE_DIM
            ).tolist()
        except rawimg.RawImageError:
            pass
    if wav.is_wav(payload):
        try:
            samples, rate = wav.decode_wav(payload)
            return wav.audio_features(samples, rate, FEATURE_DIM).tolist()
        except wav.WavError:
            pass  # malformed/unsupported RIFF falls through to the stub
    if not decode_stub:
        raise NotImplementedError(
            "no codec for this payload format in this environment; "
            "PNG/GIF/JPEG (baseline + progressive)/BMP/PGM/PPM images, WAV "
            "(PCM + G.711 + IMA ADPCM) audio, and MJPEG/AVI video "
            "decode natively; others (arithmetic-coded JPEG, "
            "inter-frame video codecs) need ffmpeg/pillow plugged "
            "into _decode_features"
        )
    return _fake_decode(payload).tolist()


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + featurize each media payload via mapInPandas.

    PNG payloads get a REAL pixel decode (llm/png.py) and a 16-d pixel
    summary feature; other formats use the content-hash stub (or raise
    with ``decode_stub=False``). Output: FEATURES_SCHEMA.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
                        lambda b: _decode_features(bytes(b), decode_stub)
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Image resize over mapInPandas: PNG payloads are REALLY decoded,
    nearest-neighbor resized, and re-encoded (llm/png.py); payloads in
    formats without a codec here pass through unchanged with rewritten
    metadata (the PIL/opencv hook point).

    Output: media schema with meta.width/height set to the target and
    a ``scale_x/scale_y`` column pair recording the transform.
    """
    img = media.filter(F.col("kind") == "image")
    out_schema = T.StructType(
        list(MEDIA_SCHEMA.fields)
        + [
            T.StructField("scale_x", T.DoubleType(), True),
            T.StructField("scale_y", T.DoubleType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pennsieve_streaming_spark.llm import png

        for pdf in batches:
            payloads = []
            metas = []
            sx, sy = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                raw = bytes(payload)
                meta = dict(meta)
                if png.is_png(raw):
                    arr = png.decode_png(raw)
                    src_h = arr.shape[0]
                    src_w = arr.shape[1]
                    raw = png.encode_png(
                        png.resize_nearest(arr, target_w, target_h)
                    )
                    meta["format"] = "png"
                else:
                    src_w = max(meta.get("width") or 1, 1)
                    src_h = max(meta.get("height") or 1, 1)
                meta["width"], meta["height"] = target_w, target_h
                payloads.append(raw)
                metas.append(meta)
                sx.append(target_w / src_w)
                sy.append(target_h / src_h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                    "scale_x": sx,
                    "scale_y": sy,
                }
            )

    return img.mapInPandas(run, schema=out_schema)


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
