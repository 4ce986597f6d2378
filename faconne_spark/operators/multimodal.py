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


def extract_media_meta(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                raw = bytes(payload)
                if use_real_decoder:
                    w, h = decode_image_real(raw)  # pragma: no cover
                else:
                    w, h = _decode_fake(raw)
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
