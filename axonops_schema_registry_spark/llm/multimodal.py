"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched decode / feature-extraction over ``mapInPandas``.

The Spark-side contract is real and tested: schema, batching shape, UDF
signatures, partitioning notes.  The actual media kernels (image decode,
audio resample, video frame-sample) are STUBBED — PIL/librosa/ffmpeg are
not in this container.  ``decode_features(..., stub=True)`` runs a
deterministic fake derived from the payload bytes so the pipeline is
end-to-end testable; ``stub=False`` raises NotImplementedError at the
exact point a real kernel would plug in.

Scale notes: payloads stay opaque ``binary`` columns all the way to the
decode stage (no driver round-trip); decode runs ``mapInPandas`` so one
Python worker handles one Arrow batch of payloads at a time.  For 100 TB
media tables, repartition by size-class first so batches have uniform
decode cost, and keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
small enough that a batch of decoded frames fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Typed metadata carried next to every payload.
MULTIMODAL_META_DDL = ("struct<modality:string,mime:string,"
                       "source_uri:string,n_bytes:bigint>")

DECODED_SCHEMA_DDL = ("doc_id bigint, n_bytes bigint, width int, height int, "
                      "n_frames int")


def attach_payload(df: DataFrame, id_col: str, text_col: str,
                   modality: str = "image") -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed metadata.

    (With real media the payload would arrive from ``spark.read.format
    ("binaryFile")`` or a parquet binary column; here the driver corpus's
    text bytes stand in.)
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.concat(F.lit("synthetic://"), F.col(id_col).cast("string"))
        .alias("source_uri"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )
    return df.select(F.col(id_col).alias("doc_id"),
                     payload.alias("payload"), meta.alias("meta"))


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video header parse."""
    n = len(payload)
    return n % 640, (n * 7) % 480, n % 30


def decode_features(df: DataFrame, stub: bool = True) -> DataFrame:
    """Arrow-batched decode / feature extraction over payload batches.

    Real kernels (PIL.Image.open / librosa.load / pyav frame sampling)
    would replace ``_fake_decode`` — the mapInPandas batching, schema and
    memory shape are exactly what they need.
    """
    if not stub:
        raise NotImplementedError(
            "media decode kernels (PIL/librosa/ffmpeg) are not available "
            "in this environment; run with stub=True")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                "width": [f[0] for f in feats],
                "height": [f[1] for f in feats],
                "n_frames": [f[2] for f in feats],
            })

    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA_DDL)
