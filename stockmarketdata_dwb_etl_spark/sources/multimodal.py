"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a typed metadata
struct; decode / feature-extraction runs as Arrow-batched ``mapInPandas``
so the heavy per-item work streams through executors in columnar batches
(never a row-at-a-time Python UDF, never a driver collect).

The actual codec step is STUBBED (this container ships no image/audio
libraries): ``decode_payload`` raises ``NotImplementedError`` for real
codecs and the feature extractor uses a clearly-marked deterministic fake
(sha256-derived bytes) — the Spark-side plumbing (schema, batching,
partitioning, UDF signature) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stockmarketdata_dwb_etl_spark.catalog import load_table

MEDIA_TYPES = ("image", "audio", "video")

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table from documents: payload = utf-8 bytes of
    the text (stand-in for encoded media), media_type cycled by doc_id,
    metadata struct alongside."""
    docs = load_table(spark, sf_dir, "documents")
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, MEDIA_TYPES[0])
        .when(F.col("doc_id") % 3 == 1, MEDIA_TYPES[1])
        .otherwise(MEDIA_TYPES[2])
    )
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        media_type.alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("int").alias("n_bytes"),
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_payload(media_type: str, payload: bytes) -> bytes:
    """Real codec entry point — intentionally unimplemented in this
    container (no PIL/ffmpeg). The pipeline calls the deterministic fake
    below instead; swap this in when codecs are available."""
    raise NotImplementedError(
        f"real {media_type} decoding requires codec libraries not present "
        "in this environment"
    )


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic FAKE decode: sha256-derived unit-interval floats.
    Stands in for (decode → resize/frame-sample → embed)."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` streams columnar batches through the executor Python
    workers; output schema is declared so downstream plans stay typed. The
    decode step is the documented deterministic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": pdf["payload"].map(_fake_decode_features),
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_bytes", T.IntegerType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one video payload → ``n_frames`` frame rows — the
    one-to-many Arrow batch shape of real frame extraction (a row-expanding
    ``mapInPandas``, so a 2-hour video never materializes as one row
    downstream). The codec is the documented deterministic fake: the
    payload is split into ``n_frames`` contiguous chunks standing in for
    (demux → seek → decode frame); swap :func:`decode_payload` in when
    codecs exist. Frames re-concatenate to the exact payload (tested)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "frame": [],
                "frame_bytes": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                step = (n + n_frames - 1) // n_frames if n else 0
                for i in range(n_frames):
                    chunk = bytes(payload[i * step : (i + 1) * step])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame"].append(chunk)
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return media.select("doc_id", "payload").mapInPandas(run, FRAMES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("orig_bytes", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("resized_bytes", T.IntegerType()),
    ]
)


def resize_payloads(media: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Resize/resample normalization: every payload mapped to a fixed-size
    representation — the (decode → resize to W×H → re-encode) step of an
    image pipeline, as an Arrow-batched ``mapInPandas``. The codec is the
    documented deterministic fake: payloads longer than ``target_bytes``
    are evenly strided down to exactly ``target_bytes`` (every k-th byte —
    the downsampling analog), shorter ones cycle-padded up (upsampling
    analog); swap :func:`decode_payload` in when codecs exist. Output size
    is uniform by construction, which is the property the downstream
    training batcher needs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = []
            for payload in pdf["payload"]:
                n = len(payload)
                if n >= target_bytes:
                    idx = [i * n // target_bytes for i in range(target_bytes)]
                    out = bytes(payload[i] for i in idx)
                else:
                    reps = (target_bytes + n - 1) // n if n else 0
                    out = bytes((payload * reps)[:target_bytes]) if n else b"\0" * target_bytes
                resized.append(out)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "orig_bytes": pdf["payload"].map(len).astype("int32"),
                    "resized": resized,
                    "resized_bytes": [len(r) for r in resized],
                }
            )

    return media.select("doc_id", "media_type", "payload").mapInPandas(
        run, RESIZED_SCHEMA
    )
