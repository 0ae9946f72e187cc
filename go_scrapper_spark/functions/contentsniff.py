"""Content-type sniffing over binary payloads (multimodal tier).

A 100 TB crawl corpus stores fetched bodies as opaque ``binary``; the
first routing decision every downstream pipeline makes is "what IS
this" — servers lie in Content-Type headers, so production pipelines
sniff magic bytes (the approach of RFC-less `file(1)` and the WHATWG
MIME sniffing standard). This is that stage as a single codegen'd
expression: hex-prefix matching against the canonical signatures, with
an HTML/text heuristic fallback. No Python, no UDF — the whole sniff
is one `CASE` chain over ``hex(substring(bin, 1, 8))``, so it runs at
scan speed and pushes through whole-stage codegen.

Signatures (public magic-byte tables):
  89504E47            PNG      FFD8FF             JPEG
  474946383761|3961   GIF87a/89a
  25504446            PDF      504B0304           ZIP family
  1F8B                GZIP     52494646           RIFF (WAV/AVI)
  4F676753            OGG      664C6143           FLAC
  00000018/20 + 66747970  MP4 (ftyp at offset 4)
  574152432F          "WARC/" record header
  3C21444F|3C68746D|3C48544D|3C21646F  HTML markers
fallback: ascii-printable prefix → text/plain, else octet-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_type_col(bin_col) -> F.Column:
    """binary column → sniffed MIME string, one codegen'd CASE chain."""
    hx = F.upper(F.hex(F.substring(bin_col, 1, 12)))

    def pre(p: str):
        return hx.startswith(p)

    return (
        F.when(bin_col.isNull() | (F.length(bin_col) == 0), F.lit("empty"))
        .when(pre("89504E47"), F.lit("image/png"))
        .when(pre("FFD8FF"), F.lit("image/jpeg"))
        .when(pre("474946383761") | pre("474946383961"), F.lit("image/gif"))
        .when(pre("25504446"), F.lit("application/pdf"))
        .when(pre("504B0304"), F.lit("application/zip"))
        .when(pre("1F8B"), F.lit("application/gzip"))
        .when(pre("52494646"), F.lit("audio/riff"))
        .when(pre("4F676753"), F.lit("audio/ogg"))
        .when(pre("664C6143"), F.lit("audio/flac"))
        # MP4: 'ftyp' at byte offset 5 (after the 4-byte box size)
        .when(
            F.upper(F.hex(F.substring(bin_col, 5, 4))) == "66747970",
            F.lit("video/mp4"),
        )
        .when(pre("574152432F"), F.lit("application/warc"))
        .when(
            pre("3C21444F43545950") | pre("3C21646F63747970")
            | pre("3C68746D6C") | pre("3C48544D4C"),
            F.lit("text/html"),
        )
        # text heuristic: first bytes all printable ASCII (0x20-0x7E,
        # tab/LF/CR) → text/plain; expressed as a regex over the hex
        # pairs so it stays JVM-side
        .when(
            F.regexp_count(
                F.hex(F.substring(bin_col, 1, 12)),
                F.lit("^(0[9AD]|[2-6][0-9A-F]|7[0-9A-E])+$"),
            )
            > 0,
            F.lit("text/plain"),
        )
        .otherwise(F.lit("application/octet-stream"))
    )


def sniff_content_types(df: DataFrame, bin_col: str = "payload",
                        id_col: str = "doc_id") -> DataFrame:
    """(id, payload binary) → (id, content_type, n_bytes)."""
    return df.select(
        F.col(id_col),
        content_type_col(F.col(bin_col)).alias("content_type"),
        F.coalesce(F.length(F.col(bin_col)), F.lit(0))
        .cast("long")
        .alias("n_bytes"),
    )
