"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, partition-friendly
batch iteration (mapInPandas), UDF signatures, deterministic fake
features. The actual codec work (PIL/librosa/ffmpeg) is NOT in this
container, so decode is stubbed: `decode_stub=True` produces
deterministic fake outputs with the right shapes; `decode_stub=False`
raises NotImplementedError at the exact point a codec library would be
called. Swapping in a real decoder changes ONE function body, none of
the distributed plumbing.

Design for 100 TB of media:
- binary payloads stay columnar (parquet binary) — never exploded to rows;
- decode/feature-extract run via mapInPandas so each Arrow batch is
  processed vectorised, with batch size bounding executor memory;
- metadata (format/width/height/duration) lives in a sibling struct
  column so filters prune files WITHOUT touching the binary column
  (column pruning keeps media bytes unread for metadata-only queries).
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
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = "media_id long, format string, n_bytes long, feature_hash string, thumb_w int, thumb_h int"


def attach_media_columns(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake media table from documents: payload =
    utf-8 bytes standing in for image bytes; meta from content. Stands in
    for `spark.read.parquet(media_table)`."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, "png").when(F.col(id_col) % 3 == 1, "jpeg").otherwise("webp").alias("format"),
            ((F.col(id_col) % 16) * 64 + 64).cast("int").alias("width"),
            ((F.col(id_col) % 9) * 64 + 64).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a codec: 'feature' = md5 of bytes."""
    return {"feature_hash": hashlib.md5(payload).hexdigest()}


def decode_and_featurize(
    media: DataFrame, target: tuple[int, int] = (64, 64), decode_stub: bool = True
) -> DataFrame:
    """mapInPandas decode + resize + feature extraction. Arrow batches in,
    feature rows out; binary column is read only here (metadata queries
    never touch it)."""
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg, not present in this image"
                )
            feats = [_fake_decode(bytes(p))["feature_hash"] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature_hash": feats,
                    "thumb_w": [min(tw, m["width"]) for m in pdf["meta"]],
                    "thumb_h": [min(th, m["height"]) for m in pdf["meta"]],
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a deterministic frame index
    list per media item (decode of each frame would happen in
    decode_and_featurize). Shows the row-explosion pattern with bounded
    fan-out."""
    n_frames = (F.col("meta.n_bytes") / 100).cast("int") + 1
    idx = F.explode(F.sequence(F.lit(0), F.least(n_frames, F.lit(300)), F.lit(every_n)))
    return media.select("media_id", idx.alias("frame_idx"))


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("codec", T.StringType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_channels", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def attach_audio_columns(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake AUDIO table from documents: payload bytes stand
    in for PCM frames; meta carries codec/sample-rate/channels and a
    duration derived as if the payload were 16-bit PCM
    (duration_ms = bytes * 1000 / (rate * channels * 2), integer-
    truncated). Same columnar design as the image table: duration/codec
    filters prune without touching payload bytes."""
    payload = F.encode(F.col(text_col), "utf-8")
    rate = (
        F.when(F.col(id_col) % 3 == 0, 8000)
        .when(F.col(id_col) % 3 == 1, 16000)
        .otherwise(44100)
        .cast("int")
    )
    channels = F.when(F.col(id_col) % 2 == 0, 1).otherwise(2).cast("int")
    n_bytes = F.octet_length(payload).cast("long")
    duration = F.expr(
        "(octet_length(encode(text, 'utf-8')) * 1000) div "
        "((CASE WHEN doc_id % 3 = 0 THEN 8000 WHEN doc_id % 3 = 1 THEN 16000 ELSE 44100 END) "
        "* (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 2 END) * 2)"
    ).cast("long")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.when(F.col(id_col) % 3 == 0, "wav")
            .when(F.col(id_col) % 3 == 1, "mp3")
            .otherwise("flac")
            .alias("codec"),
            rate.alias("sample_rate"),
            channels.alias("n_channels"),
            n_bytes.alias("n_bytes"),
            duration.alias("duration_ms"),
        ).alias("meta"),
    )


def audio_segment_plan(
    audio: DataFrame, segment_ms: int = 50, max_segments: int = 300
) -> DataFrame:
    """Fixed-duration audio segmentation plumbing: per item emit
    (media_id, seg_idx, start_ms, end_ms) rows for segment_ms windows
    over the metadata duration — the audio analogue of
    frame_sample_plan, with the same bounded fan-out (<= max_segments
    rows per item regardless of file length). Pure column arithmetic
    off the metadata struct: planning touches ZERO payload bytes, so at
    100 TB the segment plan is a metadata-only scan that each decode
    task then uses to seek into its payload range."""
    n_seg = F.least(
        ((F.col("meta.duration_ms") + segment_ms - 1) / segment_ms).cast("long"),
        F.lit(max_segments).cast("long"),
    )
    seg = F.explode(
        F.when(n_seg > 0, F.sequence(F.lit(0).cast("long"), n_seg - 1)).otherwise(
            F.array().cast("array<long>")
        )
    )
    return audio.select("media_id", F.col("meta.duration_ms").alias("dur"), seg.alias("seg_idx")).select(
        "media_id",
        "seg_idx",
        (F.col("seg_idx") * segment_ms).alias("start_ms"),
        F.least(F.col("seg_idx") * segment_ms + segment_ms, F.col("dur")).alias("end_ms"),
    )
