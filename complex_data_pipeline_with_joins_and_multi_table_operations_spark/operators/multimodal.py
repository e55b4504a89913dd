"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions via
mapInPandas.

The container has no image/audio codec libraries, so decoding splits in
two: TOY CODECS DECODE FOR REAL — P6 PPM images and PCM RIFF/WAVE audio
are parsed by pure-Python decoders (decode_ppm/decode_wav below, driven
end-to-end by encode_toy_media → decode_toy_media over format-conformant
synthetic payloads) — while every other format stays a clearly-marked
stub (NotImplementedError in decode_media, plus the deterministic
fake-feature path so the Spark-side plumbing — schema, batching,
partitioning, UDF signature — is exercised on arbitrary binaries too).

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


def decode_ppm(content: bytes) -> dict:
    """Pure-Python P6 PPM decode: parse the `P6\\n<w> <h>\\n<maxval>\\n`
    header, return dims + the raw RGB body. A REAL (if toy) codec — no
    libraries needed, so the decode step stops being a stub for images
    in this format."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        fields.append(int(content[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    body = content[i : i + w * h * 3]
    if maxval != 255 or len(body) != w * h * 3:
        raise ValueError("truncated or non-8-bit PPM body")
    return {"width": w, "height": h, "body": body}


def decode_wav(content: bytes) -> dict:
    """Pure-Python RIFF/WAVE PCM decode: verify the RIFF container, walk
    the chunk list to `fmt ` and `data` (the real chunk-walking a codec
    does — no fixed 44-byte assumption), return rate/samples + body."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, body = 12, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack(
            "<I", content[pos + 4 : pos + 8]
        )[0]
        chunk = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            body = chunk
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or body is None or fmt[0] != 1:
        raise ValueError("missing fmt/data chunk or non-PCM encoding")
    block_align = fmt[4]
    return {
        "sample_rate": fmt[2],
        "n_samples": len(body) // block_align,
        "body": body,
    }


def pil_available() -> bool:
    """True when Pillow is importable in this interpreter — the
    vendor-detection seam (same pattern as sources/io.py
    iceberg_available): real codecs route through the library when
    present, and absence produces a precise error instead of an
    ImportError mid-batch."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def soundfile_available() -> bool:
    """True when libsndfile (via the soundfile package) is importable."""
    try:
        import soundfile  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(content: bytes, media_type: str):
    """Dispatching decoder. PPM images and PCM WAV audio decode for real
    (pure Python, above). Every other format routes through the
    vendor-detected codec libraries when importable — Pillow for images
    (JPEG/PNG/...), soundfile/libsndfile for audio (FLAC/OGG/...) — and
    raises a precise error naming the missing library plus the toy-codec
    fallback when not (this container ships neither; the seam is
    interface-tested with injected stand-in modules)."""
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:4] == b"RIFF":
        return decode_wav(content)
    if media_type == "image":
        if pil_available():
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(content)).convert("RGB")
            return {
                "width": img.width,
                "height": img.height,
                "body": img.tobytes(),
            }
        raise NotImplementedError(
            "decoding non-PPM images requires Pillow (pip install pillow); "
            "it is not importable in this environment — only the toy P6 "
            "PPM codec decodes here, or use extract_features' "
            "deterministic fake path"
        )
    if media_type == "audio":
        if soundfile_available():
            import io

            import soundfile as _sf

            data, rate = _sf.read(io.BytesIO(content), dtype="int16")
            return {
                "sample_rate": int(rate),
                "n_samples": int(data.shape[0]),
                "body": data.tobytes(),
            }
        raise NotImplementedError(
            "decoding non-PCM-WAV audio requires soundfile/libsndfile "
            "(pip install soundfile); it is not importable in this "
            "environment — only the toy PCM WAV codec decodes here, or "
            "use extract_features' deterministic fake path"
        )
    raise NotImplementedError(
        f"no decoder for media_type {media_type!r}: toy codecs (P6 PPM, "
        "PCM WAV) decode anywhere; 'image'/'audio' route through "
        "Pillow/soundfile when importable"
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


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("codec", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("body_bytes", LongType()),
        StructField("body_sum", LongType()),
    ]
)


def encode_toy_media(documents: DataFrame) -> DataFrame:
    """Synthesize REAL encoded media payloads from the documents fixture:
    even doc_ids become P6 PPM images, odd ones PCM WAV audio, with dims
    and duration derived from md5(text) so every byte is deterministic.
    The payloads are genuine format-conformant files (any external PPM/WAV
    reader opens them) — the fixture the toy codecs decode end-to-end."""

    def _encode(batches):
        # self-contained closure: workers cannot import this package, so
        # the encoders live inline (decode_ppm/decode_wav mirror them at
        # module scope for driver-side use)
        import hashlib as _hashlib
        import struct as _struct

        import pandas as _pd

        for pdf in batches:
            ids, codecs, blobs = [], [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                seed = _hashlib.md5(
                    (text if isinstance(text, str) else "").encode("utf-8")
                ).digest()
                if did % 2 == 0:
                    w = 4 + seed[0] % 13
                    h = 4 + seed[1] % 13
                    n = w * h * 3
                    body = (seed * (n // 16 + 1))[:n]
                    blob = b"P6\n%d %d\n255\n" % (w, h) + body
                    codec = "ppm"
                else:
                    n_samples = 256 + (seed[2] + 256 * seed[3]) % 4000
                    data = (seed * ((2 * n_samples) // 16 + 1))[: 2 * n_samples]
                    sr = 8000
                    blob = (
                        b"RIFF"
                        + _struct.pack("<I", 36 + len(data))
                        + b"WAVE"
                        + b"fmt "
                        + _struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
                        + b"data"
                        + _struct.pack("<I", len(data))
                        + data
                    )
                    codec = "wav"
                ids.append(did)
                codecs.append(codec)
                blobs.append(blob)
            yield _pd.DataFrame(
                {"media_id": ids, "codec": codecs, "content": blobs}
            )

    return documents.select("doc_id", "text").mapInPandas(
        _encode,
        schema=StructType(
            [
                StructField("media_id", LongType()),
                StructField("codec", StringType()),
                StructField("content", BinaryType()),
            ]
        ),
    )


def decode_toy_media(media: DataFrame) -> DataFrame:
    """REAL decode over binary media rows (mapInPandas): parse each
    payload's actual header bytes (PPM text header / RIFF chunk walk),
    then compute stats from the DECODED body — dims, sample counts, byte
    length, exact byte sum. Nothing is read from metadata columns; a
    corrupted payload would change the output, which is what makes the
    cross-engine oracle a round-trip proof (encode → decode must
    reconstruct exactly the synthesis parameters the oracle derives
    from md5 directly)."""

    def _decode(batches):
        # self-contained: inline copies of decode_ppm / decode_wav
        import struct as _struct

        import pandas as _pd

        def ppm(content):
            fields, i = [], 2
            while len(fields) < 3:
                while i < len(content) and content[i : i + 1].isspace():
                    i += 1
                j = i
                while j < len(content) and not content[j : j + 1].isspace():
                    j += 1
                fields.append(int(content[i:j]))
                i = j
            i += 1
            w, h, _maxval = fields
            return w, h, content[i : i + w * h * 3]

        def wav(content):
            pos, fmt, body = 12, None, None
            while pos + 8 <= len(content):
                cid = content[pos : pos + 4]
                size = _struct.unpack("<I", content[pos + 4 : pos + 8])[0]
                chunk = content[pos + 8 : pos + 8 + size]
                if cid == b"fmt ":
                    fmt = _struct.unpack("<HHIIHH", chunk[:16])
                elif cid == b"data":
                    body = chunk
                pos += 8 + size + (size % 2)
            return fmt[2], len(body) // fmt[4], body

        for pdf in batches:
            out = {k.name: [] for k in DECODED_SCHEMA.fields}
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                if c[:2] == b"P6":
                    w, h, body = ppm(c)
                    row = ("ppm", w, h, None, None)
                else:
                    sr, ns, body = wav(c)
                    row = ("wav", None, None, sr, ns)
                out["media_id"].append(mid)
                out["codec"].append(row[0])
                out["width"].append(row[1])
                out["height"].append(row[2])
                out["sample_rate"].append(row[3])
                out["n_samples"].append(row[4])
                out["body_bytes"].append(len(body))
                out["body_sum"].append(sum(body))
            yield _pd.DataFrame(out)

    return media.mapInPandas(_decode, schema=DECODED_SCHEMA)


def decoded_media_stats(documents: DataFrame) -> DataFrame:
    """End-to-end toy-codec pipeline: documents → format-conformant
    PPM/WAV payloads → REAL header parse + body stats. Every output
    value is a pure function of md5(text), so DuckDB mirrors it without
    ever touching a binary — agreement proves the encode→decode round
    trip byte-exactly."""
    return decode_toy_media(encode_toy_media(documents))
