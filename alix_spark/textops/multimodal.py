"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a struct of metadata;
decode / feature-extract run as Arrow-batched mapInPandas stages. The
actual codec libraries are not in this container, so the decode step is
STUBBED: `decode_features(..., real_decode=True)` raises
NotImplementedError; the default produces deterministic fake features
from the payload bytes so the Spark-side plumbing (schema, batching,
partitioning) is real and testable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from alix_spark.util import ensure_py_files

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def as_media_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap a text table as a media table (payload = utf-8 bytes) —
    the plumbing fixture used until real image/audio payloads exist."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_features(
    media: DataFrame, feat_dim: int = 8, real_decode: bool = False
) -> DataFrame:
    """(media_id, n_bytes, features array<double>) via mapInPandas.

    real_decode=True is the integration point for PIL/ffmpeg-style
    decoding — unavailable here, so it raises. The stub emits
    deterministic features: byte-histogram moments of the payload,
    so output is stable across runs and cluster sizes.
    """
    if real_decode:
        raise NotImplementedError(
            "media codecs not available in this environment; "
            "plug PIL/torchaudio/ffmpeg here on a real cluster"
        )

    ensure_py_files(media.sparkSession)

    def gen(it):
        for pdf in it:
            feats = []
            for buf in pdf["media"]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.float64)
                if arr.size == 0:
                    feats.append([0.0] * feat_dim)
                    continue
                hist = np.bincount((arr // (256 // feat_dim)).astype(np.int64), minlength=feat_dim)
                feats.append((hist[:feat_dim] / arr.size).round(6).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    return media.mapInPandas(gen, schema)
