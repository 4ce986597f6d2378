"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio libraries, so the actual decode is a
clearly marked stub (`decode_image_real` raises NotImplementedError; the
pipeline uses a deterministic fake). Everything Spark-side — schema,
Arrow batch shape, ``mapInPandas`` signature, partitioning — is real and
tested, so swapping in a real decoder is a one-function change.

Scale note: decode runs as Arrow-batched ``mapInPandas`` (the one place
Python is unavoidable); batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch`` and partitioning stays
whatever the upstream scan chose — no shuffle is introduced.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

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

IMAGE_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", StringType()),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic opaque binary payload + typed metadata to
    each document (stand-in for a real image/audio column; derived from
    the text's md5 so it is stable across engines and runs)."""
    from faconne_spark.session import spread

    return spread(docs).select(
        "doc_id",
        F.expr("cast(unhex(md5(text)) as binary)").alias("payload"),
        F.expr(
            "case when doc_id % 3 = 0 then 'image/png' "
            "when doc_id % 3 = 1 then 'audio/wav' else 'video/mp4' end"
        ).alias("media_type"),
    )


def decode_image_real(payload: bytes) -> tuple:
    """Real decoder hook — requires an image library not present in
    this container."""
    raise NotImplementedError(
        "image decode requires PIL/libvips; wire this in on a cluster "
        "image that ships a decoder"
    )


def _decode_fake(payload: bytes) -> tuple:
    """Deterministic fake decode: pretend the first bytes encode
    dimensions. Keeps the full pipeline runnable + testable."""
    w = 16 + payload[0] % 64
    h = 16 + payload[1] % 64
    return w, h


def extract_media_meta(
    media: DataFrame, use_real_decoder: bool = False, decoder=None
) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    ``decoder`` (payload -> (w, h)) is the swap-in seam for a real
    codec: the callable is captured by value in the mapInPandas closure,
    so it reaches the Python workers (a module-global monkeypatch would
    not). Default: :func:`decode_image_real` when ``use_real_decoder``
    else the deterministic fake."""
    decode = decoder or (
        decode_image_real if use_real_decoder else _decode_fake
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                raw = bytes(payload)
                w, h = decode(raw)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": mtype,
                        "n_bytes": len(raw),
                        "width": w,
                        "height": h,
                        "checksum": hashlib.md5(raw).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA])

    return media.mapInPandas(batches, IMAGE_META_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized", BinaryType()),
        StructField("resized_bytes", LongType()),
    ]
)


def resize_image_real(payload: bytes, w: int, h: int) -> bytes:
    """Real resize hook — needs PIL/libvips (not in this container)."""
    raise NotImplementedError(
        "image resize requires PIL/libvips; wire in on a cluster image"
    )


def _resize_fake(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake: tile the payload to w*h bytes (stable stand-in
    for a decoded-resized-reencoded image; size scales with w*h like a
    real bitmap would)."""
    need = w * h
    if not payload:
        return b"\x00" * need
    reps = need // len(payload) + 1
    return (payload * reps)[:need]


def resize_media(
    media: DataFrame, width: int = 32, height: int = 32,
    use_real_codec: bool = False, codec=None,
) -> DataFrame:
    """Batch resize over the binary column (images only; other media
    passes through with NULL output). Arrow-batched ``mapInPandas``; no
    shuffle — partitioning is whatever the upstream scan chose, and at
    100 TB batch size is bounded by arrow.maxRecordsPerBatch so peak
    memory is batch_rows × (payload + w×h).

    ``codec`` ((payload, w, h) -> bytes) is the real-codec swap-in seam
    (captured by value into the worker closure)."""
    resize = codec or (
        resize_image_real if use_real_codec else _resize_fake
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype.startswith("image/"):
                    raw = bytes(payload)
                    out = resize(raw, width, height)
                    rows.append((doc_id, mtype, width, height, out, len(out)))
                else:
                    rows.append((doc_id, mtype, None, None, None, None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZE_SCHEMA]
            )

    return media.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_bytes", LongType()),
    ]
)


def sample_frames_real(payload: bytes, every_n: int) -> list:
    """Real frame extraction hook — needs ffmpeg/pyav."""
    raise NotImplementedError("frame sampling requires ffmpeg/pyav")


def _sample_frames_fake(payload: bytes, every_n: int) -> list:
    """Deterministic fake: treat the payload as 4-byte frames, keep
    every n-th. Exercises the real 1→N row-explosion shape."""
    frames = [payload[i : i + 4] for i in range(0, len(payload), 4)]
    return [(i, f) for i, f in enumerate(frames) if i % every_n == 0]


def sample_media_frames(
    media: DataFrame, every_n: int = 2, use_real_codec: bool = False,
    codec=None,
) -> DataFrame:
    """Frame sampling for video/audio media: one input row → N frame
    rows (``mapInPandas`` may change cardinality, the natural fit for
    decode-explode; a Spark-side ``explode`` would need the decoded
    array materialised as one giant row first).

    ``codec`` ((payload, every_n) -> [(idx, frame)]) is the real-codec
    swap-in seam (captured by value into the worker closure)."""
    sample = codec or (
        sample_frames_real if use_real_codec else _sample_frames_fake
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype.startswith(("video/", "audio/")):
                    raw = bytes(payload)
                    frames = sample(raw, every_n)
                    for idx, fr in frames:
                        rows.append((doc_id, idx, fr, len(fr)))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA])

    return media.mapInPandas(batches, FRAME_SCHEMA)
