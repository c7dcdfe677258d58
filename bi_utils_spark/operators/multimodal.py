"""Multimodal (binary media) column operators (SURVEY.md §2.14 X7).

Images/audio/video ride Spark as opaque ``binary`` columns next to a
typed metadata struct — the layout used by large-scale multimodal
training pipelines (and by ``binaryFile``-format datasets). The
Spark-side plumbing here is real and tested: schemas, Arrow batch
shape, partition sizing, mapInPandas signatures. The codec layer
(image decode, resampling, frame extraction) is STUBBED — the
decode libraries (PIL/ffmpeg/torchaudio) are not in this container —
behind ``DecoderRegistry``: tests register deterministic fakes; a
production deployment registers real codecs with the same signature.

Scale notes: media rows are fat (MBs); the operators below keep them
out of shuffles entirely (map-only pipelines), and metadata-only
plans never touch the binary column thanks to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("duration_ms", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

# A decoder takes raw bytes and returns a feature vector (list[float]).
Decoder = Callable[[bytes], list[float]]


class DecoderRegistry:
    """Pluggable codec layer. Real deployments register PIL/ffmpeg
    decoders; this container registers deterministic fakes in tests."""

    _decoders: dict[str, Decoder] = {}

    @classmethod
    def register(cls, modality: str, fn: Decoder) -> None:
        cls._decoders[modality] = fn

    @classmethod
    def get(cls, modality: str) -> Decoder:
        if modality not in cls._decoders:
            raise NotImplementedError(
                f"no decoder registered for modality {modality!r} — "
                "media codecs are stubbed in this environment"
            )
        return cls._decoders[modality]


def deterministic_fake_decoder(dim: int = 8) -> Decoder:
    """Deterministic stand-in decoder: sha256-seeded unit-scale floats.
    Same bytes → same features, cross-process stable (no RNG state)."""

    def decode(payload: bytes) -> list[float]:
        digest = hashlib.sha256(payload or b"").digest()
        return [b / 255.0 for b in digest[:dim]]

    return decode


def extract_features(
    df: DataFrame,
    modality_col: str = "modality",
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 8,
    batch_size: int = 64,
) -> DataFrame:
    """Decode payloads → feature vectors via Arrow-batched mapInPandas.

    Map-only (no shuffle); each Arrow batch holds ``batch_size`` rows
    so executor memory stays bounded even with multi-MB payloads —
    set ``spark.sql.execution.arrow.maxRecordsPerBatch`` accordingly
    in production. Decoder lookup is per-batch, not per-row.
    """
    out_schema = f"{id_col} string, modality string, features array<double>"
    # Snapshot the registry into the closure: executors run in fresh
    # Python workers where driver-side registrations don't exist.
    decoders = dict(DecoderRegistry._decoders)  # noqa: SLF001

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for modality, payload in zip(pdf[modality_col], pdf[payload_col]):
                decoder = decoders.get(modality)
                if decoder is None:
                    raise NotImplementedError(
                        f"no decoder registered for modality {modality!r} — "
                        "media codecs are stubbed in this environment"
                    )
                feats.append(decoder(bytes(payload) if payload is not None else b""))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "modality": pdf[modality_col],
                    "features": feats,
                }
            )

    # Repartition-free: preserve input partitioning; bound batch size.
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return df.mapInPandas(run, schema=out_schema)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only panel — must never read ``payload`` (column
    pruning keeps the fat column out of the scan; verify with
    .explain → ReadSchema)."""
    return df.groupBy("modality").agg(
        F.count("*").alias("n"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.avg(F.col("meta.duration_ms")).alias("avg_duration_ms"),
    )


def payload_sizes(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-modality payload volume (binary length is metadata-cheap)."""
    return df.groupBy("modality").agg(
        F.count("*").alias("n"),
        F.sum(F.length(F.col(payload_col))).alias("total_bytes"),
        F.max(F.length(F.col(payload_col))).alias("max_bytes"),
    )


# A transcoder takes raw bytes (+ params) and returns transformed bytes.
Transcoder = Callable[[bytes, dict], bytes]


class TranscoderRegistry:
    """Pluggable byte→byte media transforms (resize, re-encode). Same
    contract as DecoderRegistry: fakes in this container, real codecs
    (PIL/ffmpeg) in production."""

    _fns: dict[str, Transcoder] = {}

    @classmethod
    def register(cls, name: str, fn: Transcoder) -> None:
        cls._fns[name] = fn

    @classmethod
    def get(cls, name: str) -> Transcoder:
        if name not in cls._fns:
            raise NotImplementedError(
                f"no transcoder registered for {name!r} — media codecs are "
                "stubbed in this environment"
            )
        return cls._fns[name]


def deterministic_fake_resize(payload: bytes, params: dict) -> bytes:
    """Stand-in 'resize': truncate/pad bytes to width*height/64 — wrong
    pixels, right plumbing (bounded output size, deterministic)."""
    target = max(1, int(params.get("width", 64)) * int(params.get("height", 64)) // 64)
    out = (payload or b"\x00")[:target]
    return out + b"\x00" * (target - len(out))


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    transcoder: str = "resize",
    payload_col: str = "payload",
    batch_size: int = 64,
) -> DataFrame:
    """Re-encode payloads to a target size via Arrow-batched mapInPandas.

    Map-only: no shuffle, binary stays executor-local; output schema
    replaces the payload and stamps the new dimensions into ``meta``.
    """
    fns = dict(TranscoderRegistry._fns)  # noqa: SLF001 — snapshot for executors
    out_schema = (
        "media_id string, modality string, mime_type string, payload binary, "
        "meta struct<width: int, height: int, duration_ms: int, sample_rate: int>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = fns.get(transcoder)
        if fn is None:
            raise NotImplementedError(
                f"no transcoder registered for {transcoder!r} — media codecs "
                "are stubbed in this environment"
            )
        params = {"width": width, "height": height}
        for pdf in batches:
            payloads = [
                fn(bytes(p) if p is not None else b"", params)
                for p in pdf[payload_col]
            ]
            meta = [
                {"width": width, "height": height,
                 "duration_ms": m["duration_ms"] if m is not None else None,
                 "sample_rate": m["sample_rate"] if m is not None else None}
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "mime_type": pdf["mime_type"],
                    "payload": payloads,
                    "meta": meta,
                }
            )

    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return df.mapInPandas(run, schema=out_schema)


def deterministic_fake_frames(payload: bytes, n_frames: int) -> list[bytes]:
    """Stand-in frame sampler: n_frames even byte-slices of the payload
    (stable across processes; real impl = ffmpeg keyframe extraction)."""
    data = payload or b"\x00"
    step = max(1, len(data) // n_frames)
    return [data[i * step : (i + 1) * step] or b"\x00" for i in range(n_frames)]


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    payload_col: str = "payload",
    id_col: str = "media_id",
    batch_size: int = 16,
) -> DataFrame:
    """Sample ``n_frames`` per video payload → one row per frame
    (media_id, frame_idx, frame binary).

    Map-only with batch-bounded memory: each Arrow batch holds at most
    ``batch_size`` source rows, so peak executor memory is
    batch_size × payload + n_frames slices. Downstream per-frame
    feature extraction reuses extract_features on the frame column.
    """
    out_schema = f"{id_col} string, frame_idx int, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                fs = deterministic_fake_frames(
                    bytes(payload) if payload is not None else b"", n_frames
                )
                for i, fr in enumerate(fs):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    return df.mapInPandas(run, schema=out_schema)
