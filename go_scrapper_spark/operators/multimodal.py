"""Multimodal column plumbing (training-data pipeline tier).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signature, partitioning — is real and tested; the actual media decode
is STUBBED: decode libraries (PIL/ffmpeg/...) are not in this
container, so ``decode_image_meta`` computes a deterministic fake
(byte-length-derived) metadata record, and ``decode_image_real``
raises NotImplementedError until a decoder is installed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_DDL = "doc_id long, n_bytes long, fake_width int, fake_height int, mode string"


def attach_payload(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Stand-in binary payload column (utf-8 bytes of the text).
    A real corpus carries WARC/image bytes here."""
    return docs.select(F.col(id_col), F.col(text_col).cast("binary").alias("payload"))


def decode_image_real(payload: bytes) -> dict:
    """Real decoder hook. Install PIL/libvips and implement; the
    surrounding Spark plumbing is unchanged."""
    raise NotImplementedError(
        "media decode libraries are not available in this environment; "
        "use decode_image_meta (deterministic stub) for pipeline tests"
    )


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        n = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n.astype("int64"),
                "fake_width": (n % 640).astype("int32"),
                "fake_height": (n % 480).astype("int32"),
                "mode": pd.Series(["stub"] * len(pdf), index=pdf.index),
            }
        )


def image_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column — the
    decode/feature-extract stage shape. Swap ``_decode_batches``'s body
    for a real decoder without touching the plan."""
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _decode_batches, schema=IMAGE_META_DDL
    )
