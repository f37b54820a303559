"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this environment):
``fake_decode`` derives deterministic pseudo-pixels from the payload hash so
the Spark-side plumbing — schema, batching, partitioning, UDF signature —
is real and testable; swap ``_decode_impl`` for PIL/libav in production.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY; mapInPandas
processes Arrow record batches (no per-row pickling); feature vectors come
back as array<float> ready for the similarity operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, data binary, "
    "meta struct<format: string, width: int, height: int, n_frames: int>"
)

FEATURE_DIM = 16


def attach_media_meta(df: DataFrame, data_col: str, fmt: str = "fake") -> DataFrame:
    """Wrap a binary column with typed metadata derived from the payload."""
    data = F.col(data_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(fmt).alias("format"),
            (F.length(data) % 64 + 1).cast("int").alias("width"),
            (F.length(data) % 48 + 1).cast("int").alias("height"),
            (F.length(data) % 8 + 1).cast("int").alias("n_frames"),
        ),
    )


def _decode_impl(payload: bytes, dtype=np.float32) -> np.ndarray:
    """STUB decoder: deterministic pseudo-pixels from the payload digest.

    Production implementations plug PIL/torchvision/libav here; everything
    around this function (batching, schema, partitioning) is real.
    """
    digest = hashlib.sha256(payload).digest()
    rng = np.frombuffer(digest, dtype=np.uint8).astype(dtype)
    return np.resize(rng, FEATURE_DIM) / dtype(255.0)


def decode_features(
    df: DataFrame, id_col: str, data_col: str, dtype: str = "float"
) -> DataFrame:
    """binary → array<float|double> feature vectors via Arrow-batched
    mapInPandas. ``dtype='float'`` is the production shape (fp32 vectors);
    ``'double'`` makes the stub's arithmetic bit-identical to any engine
    computing byte/255 in IEEE double (used by the oracle-paired catalog
    query — fp32 and fp64 round differently at 6 d.p. for 3 of 256 byte
    values, so cross-engine checks need the double path)."""

    np_dtype = {"float": np.float32, "double": np.float64}[dtype]
    schema = f"{id_col} bigint, features array<{dtype}>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_impl(bytes(b), np_dtype) if b is not None else None
                for b in pdf[data_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, data_col).mapInPandas(batches, schema)


def frame_sample(df: DataFrame, id_col: str, data_col: str, every: int = 2) -> DataFrame:
    """Video-style frame sampling plumbing: explode per-frame slices of the
    payload (stub: fixed-width byte windows), keeping every ``every``-th."""
    data = F.col(data_col)
    n_frames = (F.length(data) % 8 + 1).cast("int")
    idx = F.sequence(F.lit(0), n_frames - 1)
    sampled = F.filter(idx, lambda i: i % every == 0)
    frames = F.transform(
        sampled,
        lambda i: F.struct(
            i.alias("frame_no"),
            F.substring(data, i * 16 + 1, 16).alias("frame_bytes"),
        ),
    )
    return df.select(
        id_col, F.explode(frames).alias("frame")
    ).select(id_col, "frame.frame_no", "frame.frame_bytes")


def decode_or_raise(payload: bytes) -> np.ndarray:
    """The honest production signature: raises until a real codec is wired."""
    raise NotImplementedError(
        "image/audio decoding requires PIL/libav, not present in this "
        "environment; use decode_features (deterministic stub) for plumbing"
    )
