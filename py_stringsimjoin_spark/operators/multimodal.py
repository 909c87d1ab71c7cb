"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with a typed metadata struct; the
decode / feature-extraction kernels are Arrow-batched ``mapInPandas`` stages.
The actual codec work is STUBBED (image/audio libraries are not available in
this container): ``decode_fn=None`` uses a deterministic fake decoder so the
Spark-side contract — schema, batch shape, partitioning, null routing — is
real and tested; pass a real decode_fn (e.g. PIL/librosa-based) in production.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str, fmt: str) -> DataFrame:
    """Cheap JVM-side metadata (sizes from the bytes themselves; dims/duration
    left NULL until decode)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_decode(payload: bytes, feat_dim: int) -> np.ndarray:
    """Deterministic fake decoder: md5-seeded pseudo-features. Stands in for
    a real image/audio decode; same bytes → same features on every
    executor/retry."""
    h = hashlib.md5(payload or b"").digest()
    seed = int.from_bytes(h[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.rand(feat_dim).astype(np.float32)


def extract_media_features(
    df: DataFrame,
    id_col: str,
    binary_col: str,
    feat_dim: int = 16,
    decode_fn=None,
) -> DataFrame:
    """(id, features: array<float>, n_bytes). ``decode_fn(bytes)->np.ndarray``
    plugs in a real codec; default is the deterministic stub."""
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    fn_decode = decode_fn or (lambda b: _fake_decode(b, feat_dim))

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats, nbytes = [], []
            for b in pdf[binary_col]:
                payload = bytes(b) if b is not None else b""
                feats.append(fn_decode(payload).tolist())
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "features": feats, "n_bytes": nbytes}
            )

    return df.select(id_col, binary_col).mapInPandas(fn, schema)


def frame_sample_plan(
    df: DataFrame, id_col: str, binary_col: str, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: emits (id, frame_idx, frame_ts_ms) rows
    per media item; the actual frame decode is NotImplemented without a codec."""
    raise NotImplementedError(
        "video frame decode requires a codec library not present in this "
        "container; the plumbing (schema + explode of frame timestamps) is "
        "trivially layered on extract_media_features once one is available"
    )
