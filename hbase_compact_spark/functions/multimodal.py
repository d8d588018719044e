"""Multimodal column plumbing (LLM-pipeline extension surface).

Images/audio/video ride through the engine as opaque `binary` columns
plus typed metadata. The Spark-side mechanics are fully real — schema,
Arrow-batched `mapInPandas`, partition-preserving flow; only the
codec calls are stubbed (`decode_image` raises NotImplementedError:
no imaging/audio libraries ship in this environment), with a
deterministic byte-level feature extractor standing in so the
pipeline is end-to-end testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from hbase_compact_spark.shipping import ensure_package_on_executors

PAYLOAD_META_SCHEMA = "doc_id long, n_bytes long, payload_md5 string"


def decode_image(payload: bytes) -> "object":
    """Real decode would go through PIL/libvips; the environment ships
    neither, so this is a clearly-marked stub. The surrounding Spark
    plumbing (binary column -> Arrow batch -> per-batch decode) is the
    production shape."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; see extract_payload_meta for the byte-level path"
    )


def sample_frames(payload: bytes, every_n: int = 1000) -> list[bytes]:
    """Deterministic stand-in for video frame sampling: fixed-stride
    byte windows. Keeps the operator testable without codecs."""
    return [payload[i : i + 16] for i in range(0, len(payload), every_n)]


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of the text
    here; in production the bytes come off object storage)."""
    from pyspark.sql import functions as F

    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


FRAME_META_SCHEMA = "doc_id long, n_frames long, frames_md5 string"


def extract_frame_meta(df: DataFrame, every_n: int = 100) -> DataFrame:
    """Frame-sampling pipeline shape: binary payload -> fixed-stride
    frame windows (the deterministic codec stand-in, sample_frames) ->
    per-document frame count + digest. A real video path swaps
    sample_frames for a decoder; partitioning, batching and schema
    stay identical."""
    ensure_package_on_executors(df.sparkSession)

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = pdf["payload"].map(
                lambda b: sample_frames(bytes(b), every_n=every_n)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": frames.map(len).astype("int64"),
                    "frames_md5": frames.map(
                        lambda fs: hashlib.md5(b"".join(fs)).hexdigest()
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        frame_batches, schema=FRAME_META_SCHEMA
    )


def extract_payload_meta(df: DataFrame) -> DataFrame:
    """Typed metadata for a binary `payload` column via Arrow-batched
    mapInPandas: (doc_id, n_bytes, payload_md5). This is the template
    every real decoder follows — per-batch vectorized work, bounded
    memory, schema declared up front."""
    ensure_package_on_executors(df.sparkSession)

    def meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_md5": pdf["payload"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        meta_batches, schema=PAYLOAD_META_SCHEMA
    )
