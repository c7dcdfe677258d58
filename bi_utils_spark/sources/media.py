"""Media-directory source: Spark's ``binaryFile`` format → the
MEDIA_SCHEMA layout (operators/multimodal.py).

The standard ingestion path for image/audio/video corpora stored as
files: each file becomes one row (path, modificationTime, length,
content) read in parallel — one file per task, payloads never
shuffled. Modality and MIME type are derived from the extension;
decode happens downstream via ``DecoderRegistry`` (real BMP/WAV
codecs in-repo; PIL/ffmpeg in production).

Scale notes:
- `binaryFile` refuses files larger than
  ``spark.sql.sources.binaryFile.maxLength`` (int32-bounded); shard
  oversized media upstream or raise the conf.
- use ``path_glob`` to prune at listing time (cheaper than a filter
  after reading payloads) and partition media directories by
  modality/date so listing itself stays bounded at 10⁹-file corpora.
- metadata-only queries on the result (counts, sizes) prune the
  ``payload`` column — binaryFile supports column pruning, so stats
  never read file bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EXT_MODALITY: dict[str, tuple[str, str]] = {
    "bmp": ("image", "image/bmp"),
    "png": ("image", "image/png"),
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "gif": ("image", "image/gif"),
    "wav": ("audio", "audio/wav"),
    "mp3": ("audio", "audio/mpeg"),
    "flac": ("audio", "audio/flac"),
    "ogg": ("audio", "audio/ogg"),
    "mp4": ("video", "video/mp4"),
    "mkv": ("video", "video/x-matroska"),
    "avi": ("video", "video/x-msvideo"),
    "webm": ("video", "video/webm"),
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    path_glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read a directory of media files as a MEDIA_SCHEMA-shaped frame:
    (media_id, modality, mime_type, payload, meta, length,
    modified_at). Unknown extensions get modality 'binary' /
    mime 'application/octet-stream' rather than being dropped —
    filter on modality downstream if needed."""
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    raw = reader.load(path)
    ext = F.lower(F.regexp_extract(F.col("path"), r"\.([^./\\]+)$", 1))
    modality = F.lit("binary")
    mime = F.lit("application/octet-stream")
    for e, (mod, mt) in EXT_MODALITY.items():
        modality = F.when(ext == e, F.lit(mod)).otherwise(modality)
        mime = F.when(ext == e, F.lit(mt)).otherwise(mime)
    return raw.select(
        F.col("path").alias("media_id"),
        modality.alias("modality"),
        mime.alias("mime_type"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
        F.col("length").alias("length"),
        F.col("modificationTime").alias("modified_at"),
    )
