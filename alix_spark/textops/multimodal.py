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
    the plumbing fixture used until real image/audio payloads exist.

    String ids (urls) hash to a stable long via ``xxhash64`` — a bare
    ``cast('long')`` would turn every non-numeric key into a NULL
    media_id and silently merge all rows in downstream joins."""
    id_is_str = isinstance(df.schema[id_col].dataType, T.StringType)
    media_id = (
        F.xxhash64(F.col(id_col)) if id_is_str
        else F.col(id_col).cast("long")
    )
    return df.select(
        media_id.alias("media_id"),
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

    if not 1 <= feat_dim <= 256:
        raise ValueError(f"feat_dim must be in [1, 256], got {feat_dim}")

    def gen(it):
        for pdf in it:
            feats = []
            for buf in pdf["media"]:
                # NULL payload (failed fetch) = empty payload
                arr = np.frombuffer(
                    bytes(buf) if buf is not None else b"", dtype=np.uint8
                ).astype(np.float64)
                if arr.size == 0:
                    feats.append([0.0] * feat_dim)
                    continue
                # equal-width bins over [0, 256): integer bin arithmetic
                # (256 // feat_dim) silently dropped the high bytes for
                # non-divisor dims (and divided by zero above 256)
                bins = np.minimum(
                    (arr * feat_dim / 256.0).astype(np.int64), feat_dim - 1
                )
                hist = np.bincount(bins, minlength=feat_dim)
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


# ----------------------------------------------------- image pipeline

IMAGE_META_SCHEMA = (
    "media_id long, width int, height int, channels int, pixels binary"
)


def decode_image(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """binary payload → decoded raster (media_id, width, height,
    channels, pixels) via mapInPandas.

    The codec itself is STUBBED (no PIL/libjpeg in this container —
    ``real_decode=True`` raises at the integration point); the stub
    derives a deterministic fake raster from the payload bytes so every
    downstream stage (resize, embedding, batching, partitioning) runs
    on real Spark plumbing with stable outputs."""
    if real_decode:
        raise NotImplementedError("plug PIL.Image.open here on a real cluster")
    ensure_py_files(media.sparkSession)

    def gen(it):
        for pdf in it:
            w_, h_, c_, px = [], [], [], []
            for buf in pdf["media"]:
                arr = np.frombuffer(
                    bytes(buf) if buf is not None else b"", dtype=np.uint8
                )
                # fake decode: payload bytes tiled into a 32x32x3 raster
                side = 32
                need = side * side * 3
                tiled = np.resize(arr if arr.size else np.zeros(1, np.uint8), need)
                w_.append(side)
                h_.append(side)
                c_.append(3)
                px.append(tiled.tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"], "width": w_, "height": h_,
                    "channels": c_, "pixels": px,
                }
            )

    return media.mapInPandas(gen, IMAGE_META_SCHEMA)


def resize_images(decoded: DataFrame, size: int = 8) -> DataFrame:
    """Raster → size×size via block-mean pooling (pure numpy — this
    stage is real, not stubbed). Returns (media_id, width, height,
    channels, pixels)."""
    ensure_py_files(decoded.sparkSession)

    def gen(it):
        for pdf in it:
            out = []
            for mid, w, h, ch, pix in zip(
                pdf["media_id"], pdf["width"], pdf["height"],
                pdf["channels"], pdf["pixels"],
            ):
                a = np.frombuffer(bytes(pix), dtype=np.uint8).reshape(h, w, ch)
                fh, fw = h // size, w // size
                if fh == 0 or fw == 0:
                    raise ValueError(
                        f"resize target {size} exceeds raster "
                        f"{h}x{w} — block-mean "
                        "pooling only downsamples (an empty-slice mean "
                        "would emit NaN-garbage pixels silently)"
                    )
                pooled = (
                    a[: fh * size, : fw * size]
                    .reshape(size, fh, size, fw, ch)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                out.append((mid, size, size, int(ch), pooled.tobytes()))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "channels", "pixels"]
            )

    return decoded.mapInPandas(gen, IMAGE_META_SCHEMA)


def frame_sample(
    media: DataFrame, n_frames: int = 4, real_decode: bool = False
) -> DataFrame:
    """Video payload → evenly-spaced frame rasters
    (media_id, frame_idx, width, height, channels, pixels) — one output
    row per sampled frame (the mapInPandas 1→N fan-out shape). Decode
    stubbed like :func:`decode_image`; frame extraction points are the
    real plumbing (even spacing over the payload)."""
    if real_decode:
        raise NotImplementedError("plug ffmpeg/pyav here on a real cluster")
    ensure_py_files(media.sparkSession)
    schema = (
        "media_id long, frame_idx int, width int, height int, "
        "channels int, pixels binary"
    )

    def gen(it):
        for pdf in it:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["media"]):
                arr = np.frombuffer(
                    bytes(buf) if buf is not None else b"", dtype=np.uint8
                )
                side, need = 16, 16 * 16 * 3
                if arr.size == 0:
                    # empty media → n_frames zero rasters, consistent
                    # with decode_features' zero vector (dropping the
                    # media_id entirely would read as "missing" rather
                    # than "empty" to any downstream join)
                    zero = bytes(need)
                    for fi in range(n_frames):
                        rows.append((mid, fi, side, side, 3, zero))
                    continue
                starts = np.linspace(0, max(arr.size - need, 0), n_frames).astype(int)
                for fi, s in enumerate(starts):
                    frame = np.resize(arr[s : s + need], need)
                    rows.append((mid, fi, side, side, 3, frame.tobytes()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height",
                         "channels", "pixels"],
            )

    return media.mapInPandas(gen, schema)


def image_embedding(resized: DataFrame, dim: int = 16) -> DataFrame:
    """Pooled raster → unit-norm embedding vector: per-channel mean and
    std (the channel-wise moments), then block means over the full
    flattened raster to fill ``dim`` — every pixel contributes (a
    deterministic stand-in for a CNN forward pass; the Spark shape is
    identical). Returns (media_id, embedding)."""
    if not 1 <= dim <= 4096:
        # fail fast on the driver like decode_features' feat_dim guard
        # (review batch 34): dim=0 silently yielded empty embeddings,
        # dim<0 a cryptic worker-side array_split error
        raise ValueError("image_embedding: dim must be in [1, 4096]")
    ensure_py_files(resized.sparkSession)

    def gen(it):
        for pdf in it:
            ids, vecs = [], []
            for mid, ch, pix in zip(
                pdf["media_id"], pdf["channels"], pdf["pixels"]
            ):
                a = np.frombuffer(bytes(pix), dtype=np.uint8).astype(np.float64)
                px = a.reshape(-1, ch) if a.size else np.zeros((1, ch))
                moments = np.concatenate([px.mean(axis=0), px.std(axis=0)])
                if dim <= moments.size:
                    v = moments[:dim]
                else:
                    chunks = np.array_split(a, dim - moments.size)
                    v = np.concatenate([
                        moments,
                        np.array([c.mean() if c.size else 0.0 for c in chunks]),
                    ])
                n = np.linalg.norm(v)
                vecs.append((v / n if n > 0 else v).round(6).tolist())
                ids.append(mid)
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return resized.mapInPandas(
        gen, "media_id long, embedding array<double>"
    )
