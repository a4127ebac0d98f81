"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a metadata struct; the
Spark-side machinery (schema, partition-friendly batch shapes, Arrow-batched
Pandas UDFs over mapInPandas) is real and tested.  The actual codec step is
STUBBED: this container ships no image/audio libraries, so `decode_*` with
``real=True`` raises NotImplementedError, while the default deterministic
fake derives features from the raw bytes (byte histograms / strided
samples) — exercising exactly the same dataflow a real decoder would.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("kind", StringType()),          # image | audio | video
    StructField("payload", BinaryType()),
    StructField("meta", StructType([
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ])),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", IntegerType()),
    StructField("hist", ArrayType(LongType())),
    StructField("features", ArrayType(FloatType())),
])


def synth_assets(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Deterministic synthetic assets: payload = utf-8 bytes of the text,
    metadata derived from the id.  Stands in for a real binary column."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("raw").alias("format"),
            ((F.col(id_col) % 64 + 1) * 16).cast("int").alias("width"),
            ((F.col(id_col) % 48 + 1) * 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            ((F.col(id_col) % 30 + 1) * 1000).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _byte_histogram(buf: bytes, bins: int = 16) -> np.ndarray:
    """Raw bin counts over [0, 256); with the default 16 bins the bin index
    is exactly the high nibble of each byte (SQL-checkable via hex())."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(bins, dtype=np.int64)
    hist, _ = np.histogram(arr, bins=bins, range=(0, 256))
    return hist


def extract_features(assets: DataFrame, bins: int = 16,
                     real: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    ``real=True`` is the marked integration point for an actual decoder
    (PIL / torchaudio / pyav) — unavailable in this container."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:
            raise NotImplementedError(
                "real image/audio/video decode requires codec libraries "
                "not present in this environment; the deterministic "
                "byte-histogram fake exercises the same dataflow")
        for pdf in batches:
            hists = [
                _byte_histogram(p if p is not None else b"", bins)
                for p in pdf["payload"]
            ]
            feats = [
                (h / h.sum()).astype(np.float32).tolist() if h.sum() else
                np.zeros(bins, dtype=np.float32).tolist()
                for h in hists
            ]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "n_bytes": [len(p or b"") for p in pdf["payload"]],
                "hist": [h.tolist() for h in hists],
                "features": feats,
            })

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        fn, FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, fps: float = 1.0,
                      max_frames: int = 8) -> DataFrame:
    """Deterministic frame-sampling plan for video assets: which
    millisecond offsets a decoder would extract — pure column algebra."""
    videos = assets.filter(F.col("kind") == "video")
    n = F.least(
        F.floor(F.col("meta.duration_ms") / F.lit(1000.0 / fps)).cast("int"),
        F.lit(max_frames),
    )
    return videos.select(
        "asset_id",
        F.col("meta.duration_ms").alias("duration_ms"),
        F.transform(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
            lambda i: (i * F.lit(int(1000 / fps))).cast("int"),
        ).alias("frame_offsets_ms"),
    )


def resize_spec(assets: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize plan for image assets (the arithmetic a
    resize kernel needs, computed JVM-side)."""
    images = assets.filter(F.col("kind") == "image")
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.lit(target) / F.least(w, h)
    return images.select(
        "asset_id", w.alias("width"), h.alias("height"),
        F.round(w * scale).cast("int").alias("new_width"),
        F.round(h * scale).cast("int").alias("new_height"),
    )
