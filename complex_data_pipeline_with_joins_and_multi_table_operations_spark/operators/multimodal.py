"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions via
mapInPandas.

The container has no image/audio codecs, so the actual decode step is a
clearly-marked stub (NotImplementedError for real decoding, plus a
deterministic fake-feature path so the Spark-side plumbing — schema,
batching, partitioning, UDF signature — is real and tested end-to-end).

Scale notes: mapInPandas streams Arrow batches; binary payloads never
materialize on the driver. Batch size is controlled by
spark.sql.execution.arrow.maxRecordsPerBatch; for 10 MB media blobs set it
low (e.g. 64) so a batch fits executor memory. Partition the media table
by content size bucket so skewed blob sizes don't imbalance tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),  # opaque encoded bytes
        StructField("meta_codec", StringType()),
        StructField("meta_source", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Build a media-shaped table from the documents fixture: the text
    bytes stand in for an encoded payload. Proves the binary-column
    plumbing with data the container actually has."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("content"),
        F.lit("fake/v1").alias("meta_codec"),
        F.col("source").alias("meta_source"),
    )


def decode_media(content: bytes, media_type: str):
    """Real decoding requires codec libraries not present in this
    container. The engine's contract: plug a decoder in here."""
    raise NotImplementedError(
        "media decoding requires image/audio codec libraries (PIL/ffmpeg); "
        "not available in this environment — use extract_features' "
        "deterministic fake path"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary content.

    Computes real byte-level features (length, md5) plus deterministic
    fake decode outputs (width/height derived from the content digest).
    Arrow-batched: each pandas DataFrame chunk is one Arrow batch.
    """

    def _extract(batches):
        # fully self-contained: cloudpickle ships this closure to Python
        # workers by value; any reference to module globals would force the
        # workers to import this package (which isn't on their PYTHONPATH
        # when the driving process runs from elsewhere)
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            digests = [
                _hashlib.md5(c if c is not None else b"") for c in pdf["content"]
            ]
            raw = [d.digest() for d in digests]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "content_md5": [d.hexdigest() for d in digests],
                    "fake_width": [64 + r[0] % 192 for r in raw],
                    "fake_height": [64 + r[1] % 192 for r in raw],
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def media_features(documents: DataFrame) -> DataFrame:
    """End-to-end: documents → media table → mapInPandas features.
    byte_len/content_md5 are oracle-checkable against the source text."""
    return extract_features(documents_as_media(documents))


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("thumbnail", BinaryType()),  # out_width*out_height*3 bytes
    ]
)


def resize_images(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Thumbnail/resize plumbing over image rows (mapInPandas).

    A real deployment decodes via PIL/libvips inside the batch fn; this
    container has no codecs, so the pixel step is a deterministic fake
    (RGB bytes cycled from the content digest) while everything Spark-side
    is real: image-only pushdown filter, Arrow batching, fixed-size binary
    output column, executor-local decode memory (one batch at a time).
    """

    def _resize(batches):
        # self-contained closure (workers don't share the driver sys.path)
        import hashlib as _hashlib

        import pandas as _pd

        n_px = width * height * 3
        for pdf in batches:
            thumbs = []
            for c in pdf["content"]:
                seed = _hashlib.md5(c if c is not None else b"").digest()
                reps = n_px // len(seed) + 1
                thumbs.append((seed * reps)[:n_px])
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "out_width": width,
                    "out_height": height,
                    "thumbnail": thumbs,
                }
            )

    imgs = media.filter(F.col("media_type") == "image")
    return imgs.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_s", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(media: DataFrame, every_s: int = 10, max_frames: int = 5) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    (1:N mapInPandas — the batch fn yields more rows than it consumes,
    which is exactly how a real ffmpeg-backed sampler fans out).

    Fake decode: frame count is derived from payload size (1 frame per
    4 KiB, capped), frame digests from (content, frame_idx) — stable
    across runs and engines.
    """

    def _sample(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ts_s": [], "frame_md5": []}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                payload = c if c is not None else b""
                n = min(len(payload) // 4096 + 1, max_frames)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_ts_s"].append(i * every_s)
                    out["frame_md5"].append(
                        _hashlib.md5(payload + i.to_bytes(4, "big")).hexdigest()
                    )
            yield _pd.DataFrame(out)

    vids = media.filter(F.col("media_type") == "video")
    return vids.mapInPandas(_sample, schema=FRAME_SCHEMA)


CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("chunk_idx", IntegerType()),
        StructField("start_s", IntegerType()),
        StructField("end_s", IntegerType()),
        StructField("chunk_md5", StringType()),
    ]
)


def audio_chunks(media: DataFrame, chunk_s: int = 30, max_chunks: int = 4) -> DataFrame:
    """Fixed-window audio chunking for ASR-style pipelines: audio rows
    fan out 1:N into ``chunk_s``-second segments (duration faked from
    payload size at a nominal 16 kB/s; a real build decodes headers).
    Same mapInPandas fan-out shape as video frame sampling — one Arrow
    batch in, N rows out, no driver involvement."""

    def _chunk(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out = {
                "media_id": [], "chunk_idx": [], "start_s": [], "end_s": [],
                "chunk_md5": [],
            }
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                payload = c if c is not None else b""
                dur = len(payload) // 16000 + 1
                n = min((dur + chunk_s - 1) // chunk_s, max_chunks)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(i)
                    out["start_s"].append(i * chunk_s)
                    out["end_s"].append(min((i + 1) * chunk_s, dur))
                    out["chunk_md5"].append(
                        _hashlib.md5(payload + b"|" + i.to_bytes(4, "big")).hexdigest()
                    )
            yield _pd.DataFrame(out)

    auds = media.filter(F.col("media_type") == "audio")
    return auds.mapInPandas(_chunk, schema=CHUNK_SCHEMA)
