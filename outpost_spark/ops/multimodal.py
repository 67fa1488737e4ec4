"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the Spark-side plumbing is real; codec work is stubbed because
image/audio libraries are not available in this environment):

- A multimodal table carries ``(id, modality, content binary, meta map)``.
- Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages: each batch arrives as a pandas DataFrame whose
  ``content`` column holds raw bytes; the UDF returns feature rows with a
  declared schema, so downstream operators stay columnar.
- At 100 TB the binary column dominates I/O: the feature schema is
  projected immediately after decode and the binary column is dropped, so
  only features shuffle.  Partitioning by (modality, date) keeps decode
  tasks homogeneous — no skew from mixing 1 KB thumbnails with 1 GB video.

``decode_image`` / ``decode_audio`` raise ``NotImplementedError`` (clearly
marked stubs); ``fake_features`` is the deterministic stand-in used by
tests and the catalog so the pipeline shape is exercised end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "id bigint, modality string, n_bytes bigint, checksum string, feat array<double>"


def decode_image(content: bytes) -> "object":
    """STUB — real implementation needs an image codec (PIL/opencv),
    not available in this container."""
    raise NotImplementedError("image decoding requires an image codec library")


def decode_audio(content: bytes) -> "object":
    """STUB — real implementation needs an audio codec (soundfile/ffmpeg)."""
    raise NotImplementedError("audio decoding requires an audio codec library")


def _fake_feature_vector(content: bytes, dims: int = 4) -> list[float]:
    """Deterministic stand-in for a decoder+featurizer: md5-derived values
    in [0,1).  Keeps tests meaningful without codec libraries."""
    h = hashlib.md5(content).digest()
    return [int.from_bytes(h[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(dims)]


def fake_features_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: binary content -> (n_bytes, checksum, feat[4])."""
    for pdf in batches:
        content = pdf["content"]
        yield pd.DataFrame(
            {
                "id": pdf["id"],
                "modality": pdf["modality"],
                "n_bytes": content.map(len),
                "checksum": content.map(lambda b: hashlib.md5(b).hexdigest()),
                "feat": content.map(_fake_feature_vector),
            }
        )


def extract_features(multimodal_df: DataFrame) -> DataFrame:
    """Binary table -> feature table via Arrow-batched mapInPandas.

    Input columns: id (bigint), modality (string), content (binary).
    The binary column is consumed inside the stage and never shuffled.
    """
    return multimodal_df.select("id", "modality", "content").mapInPandas(
        fake_features_batches, FEATURE_SCHEMA
    )


def documents_as_multimodal(documents: DataFrame) -> DataFrame:
    """Adapter for tests: treat document text bytes as opaque blobs."""
    source = F.col("source") if "source" in documents.columns else F.lit("")
    return documents.select(
        F.col("doc_id").alias("id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.create_map(F.lit("source"), source).alias("meta"),
    )
