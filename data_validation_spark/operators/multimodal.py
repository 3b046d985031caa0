"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns next to a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``.  The decode step itself is
STUBBED in this environment (no image/audio libraries in the container):
``decode_image_features`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic byte-level feature set
stands in so the Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is fully real and testable.

At scale: binary payloads dominate I/O, so every operator here projects
only (id, payload) — never drag payload columns through unrelated
stages — and feature outputs are small fixed-width rows that shuffle
cheaply.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id string, payload binary, media_type string, "
                "width int, height int, n_frames int")

FEATURE_SCHEMA = ("doc_id string, n_bytes long, checksum long, "
                  "byte_mean double, byte_entropy double")


def synth_media_df(spark, df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media table: payload = UTF-8 bytes of the text,
    metadata derived from its length.  Exercises the binary-column path
    end-to-end without real media files."""
    return df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.length(text_col) % 640 + 1).cast("int").alias("width"),
        (F.length(text_col) % 480 + 1).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"))


def _byte_features(payload: bytes) -> tuple[int, int, float, float]:
    arr = np.frombuffer(payload or b"", dtype=np.uint8)
    if arr.size == 0:
        return 0, 0, 0.0, 0.0
    counts = np.bincount(arr, minlength=256).astype(np.float64)
    p = counts[counts > 0] / arr.size
    entropy = float(-(p * np.log2(p)).sum())
    checksum = int(np.uint64(arr.astype(np.uint64).sum() * 0x9E3779B9)
                   & np.uint64(0x7FFF_FFFF_FFFF_FFFF))
    return int(arr.size), checksum, float(arr.mean()), entropy


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + feature-extract over the payload column.

    ``fake=False`` is the production signature (PIL/libvips decode) and
    raises in this container; ``fake=True`` computes deterministic
    byte-level features so the distributed plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "real image decode requires an image library not present in "
            "this container; call with fake=True for the deterministic "
            "byte-feature stand-in")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_byte_features(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats, columns=["n_bytes", "checksum",
                                               "byte_mean", "byte_entropy"])
            out.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield out

    return df.select("doc_id", "payload").mapInPandas(
        extract, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.
    Frame *decode* is stubbed (see module docstring); the row-explosion
    shape, which is what matters for partition sizing, is real."""
    return (df
            .withColumn("frame_idx", F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1,
                                                F.lit(0)), F.lit(every_n))))
            .select("doc_id", "frame_idx", "media_type"))


def resize_metadata(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) — pure Catalyst;
    the pixel resample itself belongs to the stubbed decode kernel."""
    scale = F.least(F.lit(float(max_side)) / F.col("width"),
                    F.lit(float(max_side)) / F.col("height"),
                    F.lit(1.0))
    return df.select(
        "doc_id", "width", "height",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"))
