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

import importlib.util
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# feature detection: the round a decoder library lands in the image,
# the real-decode path activates with zero code changes (and its
# skip-marked tests in tests/test_trainingdata_ops.py start running)
HAS_PIL = importlib.util.find_spec("PIL") is not None

IMAGE_META_DDL = "doc_id long, n_bytes long, fake_width int, fake_height int, mode string"


def attach_payload(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Stand-in binary payload column (utf-8 bytes of the text).
    A real corpus carries WARC/image bytes here."""
    return docs.select(F.col(id_col), F.col(text_col).cast("binary").alias("payload"))


def decode_image_real(payload: bytes) -> dict:
    """Real decoder hook, active whenever PIL is importable (HAS_PIL).
    Returns the same record shape as the stub (width/height/mode from
    the actual image); the surrounding Spark plumbing is unchanged."""
    if not HAS_PIL:
        raise NotImplementedError(
            "media decode libraries are not available in this environment; "
            "use decode_image_meta (deterministic stub) for pipeline tests"
        )
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return {
            "n_bytes": len(payload),
            "width": im.width,
            "height": im.height,
            "mode": im.mode,
        }


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


# ---------------------------------------------------------------- audio

AUDIO_FEATURES_DDL = (
    "doc_id long, n_units long, fake_sample_rate int, window_idx long, energy long"
)


def audio_features(docs_with_payload: DataFrame, window: int = 32,
                   n_windows: int = 4) -> DataFrame:
    """Audio feature-extract stage shape: decode (stubbed as utf-8) →
    per-window band energy, ONE ROW PER WINDOW (a clip fans out to
    ``n_windows`` scalar rows — the exploded shape video_frame_sample
    uses; array-typed output columns are banned from oracle-gated
    queries because order-insensitive value hashing needs scalar,
    hashable cells). The fake "band energies" are md5-derived exact
    integers over fixed character windows, so the DuckDB oracle
    reproduces them bit-for-bit; a real deployment swaps the window
    energies for FFT band sums without touching the plan (same
    mapInPandas signature and schema)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "n_units": [], "fake_sample_rate": [],
                   "window_idx": [], "energy": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # NULL payloads normalize to the empty clip (the oracle
                # SQL coalesces to '' the same way)
                s = bytes(payload).decode("utf-8") if payload is not None else ""
                n = len(s)
                for w in range(n_windows):
                    chunk = s[w * window:(w + 1) * window]
                    h = hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    out["doc_id"].append(doc_id)
                    out["n_units"].append(n)
                    out["fake_sample_rate"].append(8000 + (n % 8) * 1000)
                    out["window_idx"].append(w)
                    out["energy"].append(int(h[:12], 16))
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_DDL
    )


# ---------------------------------------------------------------- video

VIDEO_FRAMES_DDL = "doc_id long, frame_idx long, frame_sig string"


def video_frame_sample(docs_with_payload: DataFrame, frame_chars: int = 10,
                       stride: int = 7) -> DataFrame:
    """Frame-sampling stage shape: decode (stubbed) → explode each clip
    to one row per SAMPLED frame (every ``stride``-th of the clip's
    fake frames; frame = a ``frame_chars`` slice, signature = its md5).
    The Arrow batch shape is the real one — input rows fan out to
    variable row counts inside mapInPandas — and the sampling math is
    exact for the oracle. A real deployment replaces slice-md5 with a
    keyframe decoder; partitioning and schema stay."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"doc_id": [], "frame_idx": [], "frame_sig": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = bytes(payload).decode("utf-8") if payload is not None else ""
                n_frames = len(s) // frame_chars
                for i in range(0, n_frames, stride):
                    chunk = s[i * frame_chars:(i + 1) * frame_chars]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_sig"].append(
                        hashlib.md5(chunk.encode("utf-8")).hexdigest()
                    )
            if rows["doc_id"]:
                yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_sig"])

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        batches, schema=VIDEO_FRAMES_DDL
    )
