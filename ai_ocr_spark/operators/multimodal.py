"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as `binary` columns exactly like the
pipeline's `html` column. The container has no image/audio codecs, so
the *decode* step is a deterministic fake behind a clearly-marked gate
(real magic bytes -> NotImplementedError); everything Spark-side — the
synthetic media source, schemas, Arrow batch shapes, mapInPandas
signatures, partitioning — is real and tested.

Fake container formats (deterministic, self-describing ASCII headers):

  IMG1;<width>;<height>;<payload bytes>     "image"
  AUD1;<sample_rate>;<n_samples>;<payload>  "audio"
  VID1;<n_frames>;<64-byte frames...>       "video"

Feature extraction is numpy-vectorized over each payload (byte
histogram -> 8 coarse bins, L1-normalized) — the same batch shape a real
decoder (PIL/ffmpeg) would use at scale.

The driver contract registers the `*_q` projections below: array columns
are flattened/stringified so result frames are hashable, and every value
is exact integer math or a single IEEE division of exact integers — which
makes a bit-for-bit DuckDB oracle possible (operators/oracles.py
reconstructs the payload bytes via hex(encode(text)) and replays the same
histogram/checksum/RMS arithmetic in SQL).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

# magic prefixes of *real* formats we refuse to fake-decode
_REAL_MAGIC = (b"\x89PNG", b"\xff\xd8\xff", b"GIF8", b"RIFF", b"fLaC", b"\x00\x00\x00")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("media", T.BinaryType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
        T.StructField("error", T.StringType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("n_sampled", T.IntegerType()),
        T.StructField("frame_checksums", T.ArrayType(T.LongType())),
        T.StructField("error", T.StringType()),
    ]
)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents: doc_id % 3 picks
    the modality, the payload is the utf-8 text behind a typed header.
    Pure JVM expressions (concat/encode) — no Python in the source."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    body = F.coalesce(F.col("text"), F.lit(""))
    width = (F.col("doc_id") % 512 + 64).cast("string")
    height = (F.col("doc_id") % 384 + 48).cast("string")
    img = F.concat(F.lit("IMG1;"), width, F.lit(";"), height, F.lit(";"), body)
    aud = F.concat(
        F.lit("AUD1;16000;"), F.length(body).cast("string"), F.lit(";"), body
    )
    vid = F.concat(F.lit("VID1;"), (F.col("doc_id") % 32 + 4).cast("string"), F.lit(";"), body)
    kind = F.col("doc_id") % 3
    media = F.when(kind == 0, img).when(kind == 1, aud).otherwise(vid)
    mtype = (
        F.when(kind == 0, F.lit("image"))
        .when(kind == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        "doc_id", mtype.alias("media_type"), F.encode(media, "UTF-8").alias("media")
    )


def _decode_header(payload: bytes) -> tuple[str, list[int], bytes]:
    """Parse `TAG1;a;b;rest` headers. Real codec magic -> NotImplementedError
    (the documented stub boundary — wire a real decoder here on a cluster
    with codecs installed)."""
    if payload[:4] in _REAL_MAGIC or any(payload.startswith(m) for m in _REAL_MAGIC):
        raise NotImplementedError(
            "real image/audio codecs are not available in this environment"
        )
    tag, rest = payload[:4].decode("ascii", "replace"), payload[5:]
    nums: list[int] = []
    for _ in range(2 if tag in ("IMG1", "AUD1") else 1):
        idx = rest.find(b";")
        if idx < 0:  # missing delimiter would silently mis-slice below
            raise ValueError(f"malformed {tag} header: missing ';'")
        nums.append(int(rest[:idx]))
        rest = rest[idx + 1 :]
    return tag, nums, rest


def _byte_histogram_features(payload: bytes) -> list[float]:
    """8-bin L1-normalized byte histogram — the deterministic stand-in
    for a real embedding; numpy-vectorized over the payload bytes."""
    import numpy as np

    if not payload:
        return [0.0] * 8
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 5, minlength=8).astype(np.float64)
    return (hist / hist.sum()).tolist()


def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-stub + feature-extract over the media table via ONE
    mapInPandas stage (binary in, typed struct out — the exact Arrow
    plumbing a real decoder would use)."""
    media = media_from_documents(spark, sf_dir).filter(
        F.col("media_type") == "image"
    )

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, mtype, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["media"]
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    _tag, (w, h), rest = _decode_header(payload)
                    out.append(
                        {
                            "doc_id": doc_id,
                            "media_type": mtype,
                            "width": w,
                            "height": h,
                            "n_bytes": len(rest),
                            "features": _byte_histogram_features(rest),
                            "error": None,
                        }
                    )
                except Exception as e:  # capture, never abort the batch
                    out.append(
                        {
                            "doc_id": doc_id,
                            "media_type": mtype,
                            "width": None,
                            "height": None,
                            "n_bytes": len(payload),
                            "features": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over fake video payloads: every 4th 64-byte frame,
    per-frame additive checksum (numpy-vectorized reshape+sum)."""
    media = media_from_documents(spark, sf_dir).filter(
        F.col("media_type") == "video"
    )

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    _tag, (n_frames,), rest = _decode_header(payload)
                    frame_len = 64
                    usable = (len(rest) // frame_len) * frame_len
                    frames = np.frombuffer(rest[:usable], dtype=np.uint8).reshape(
                        -1, frame_len
                    )
                    sampled = frames[::4]
                    sums = sampled.sum(axis=1, dtype=np.int64) % 65536
                    out.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": int(len(frames)),
                            "n_sampled": int(len(sampled)),
                            "frame_checksums": sums.tolist(),
                            "error": None,
                        }
                    )
                except Exception as e:  # capture, never abort the batch
                    out.append(
                        {
                            "doc_id": doc_id,
                            "n_frames": None,
                            "n_sampled": None,
                            "frame_checksums": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature plumbing: header decode + numpy-vectorized signal
    stats (RMS/peak over the payload interpreted as u8 PCM). Same
    mapInPandas shape a real soundfile/librosa decoder would use."""
    media = media_from_documents(spark, sf_dir).filter(
        F.col("media_type") == "audio"
    )

    def stats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(payload) if payload is not None else b""
                try:
                    _tag, (sr, n), rest = _decode_header(payload)
                    pcm = np.frombuffer(rest, dtype=np.uint8).astype(np.float64) - 128.0
                    rms = float(np.sqrt((pcm * pcm).mean())) if len(pcm) else 0.0
                    peak = int(np.abs(pcm).max()) if len(pcm) else 0
                    out.append(
                        {
                            "doc_id": doc_id,
                            "sample_rate": sr,
                            "n_samples": n,
                            "duration_s": n / sr if sr else 0.0,
                            "rms": rms,
                            "peak": peak,
                            "error": None,
                        }
                    )
                except Exception as e:  # capture, never abort the batch
                    out.append(
                        {
                            "doc_id": doc_id,
                            "sample_rate": None,
                            "n_samples": None,
                            "duration_s": None,
                            "rms": None,
                            "peak": None,
                            "error": f"{type(e).__name__}: {e}",
                        }
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(stats, schema=AUDIO_STATS_SCHEMA)


# --- driver-contract projections (hashable frames + DuckDB-twin shapes) ------

N_FEATURE_BINS = 8


def mm_image_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape for mm_image_features: the feature array flattened to
    f0..f7 scalar doubles (count/total — exact integers through one IEEE
    division, so DuckDB reproduces each bit) and ints widened to long."""
    df = mm_image_features(spark, sf_dir)
    return df.select(
        "doc_id",
        "media_type",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "n_bytes",
        *[F.col("features")[i].alias(f"f{i}") for i in range(N_FEATURE_BINS)],
        "error",
    )


def mm_frame_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape for mm_frame_sample: checksums (exact ints) joined to
    one comparable string, ints widened to long."""
    df = mm_frame_sample(spark, sf_dir)
    return df.select(
        "doc_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("n_sampled").cast("long").alias("n_sampled"),
        F.array_join(
            F.transform("frame_checksums", lambda c: c.cast("string")), ","
        ).alias("frame_checksums"),
        "error",
    )


def mm_audio_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver shape for mm_audio_stats: all-scalar already; ints widened
    to long (DuckDB emits BIGINT)."""
    df = mm_audio_stats(spark, sf_dir)
    return df.select(
        "doc_id",
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("n_samples").cast("long").alias("n_samples"),
        "duration_s",
        "rms",
        F.col("peak").cast("long").alias("peak"),
        "error",
    )
