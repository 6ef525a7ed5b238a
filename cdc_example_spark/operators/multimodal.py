"""Multimodal columns: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` stages.
The Spark-side plumbing — schemas, batch shapes, partitioning — is
real and tested; the actual codec step is stubbed because this
container ships no image/audio libraries:

- :func:`decode_media` raises ``NotImplementedError`` unless a real
  decoder import succeeds (clearly marked stub);
- :func:`extract_features_stub` is the deterministic fake: a byte-level
  feature extractor with the exact shape a real embedding stage has
  (bytes in → fixed-dim float vector out), so downstream similarity /
  dedup operators are testable end to end.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media row: payload + typed metadata (FIXTURES-style declared schema).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def to_media(df: DataFrame, id_col: str, payload_col: str, media_type: str = "text") -> DataFrame:
    """Wrap any column as an opaque binary media payload with metadata."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_media(df: DataFrame) -> DataFrame:
    """Real codec stage — STUB. Decoding images/audio requires PIL /
    torchaudio / av, none of which ship in this environment."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "media decoding requires an image/audio codec library; "
            "use extract_features_stub() for the deterministic fake path"
        ) from exc
    raise NotImplementedError("real decoder wiring lands with the codec dependency")


def extract_features_stub(df: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Deterministic fake feature extractor over binary payloads.

    mapInPandas: each Arrow batch becomes a pandas DataFrame; features
    are a dim-bucket byte histogram, L1-normalized — fake semantics,
    real plumbing (this is byte-for-byte the shape of a decode +
    embed stage: binary in, array<float> out, per-partition batching,
    no shuffle).
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("n_bytes", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def _extract(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload if payload is not None else b"", dtype=np.uint8)
                if arr.size == 0:
                    feats.append([0.0] * dim)
                    continue
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float64)
                feats.append((hist / hist.sum()).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return df.mapInPandas(_extract, schema)


def sample_frames_stub(df: DataFrame, n_frames: int = 4, frame_bytes: int = 32) -> DataFrame:
    """Deterministic fake frame sampler for "video" payloads.

    Emits ``n_frames`` evenly spaced byte slices per payload — the
    explode-shaped stage (1 row in, k rows out) a real video pipeline
    has, with stable frame indices for downstream joins.
    """
    idx = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    exploded = df.select("media_id", "n_bytes", "payload", idx)
    # evenly spaced offsets; substring on binary is positional (1-based)
    offset = (F.col("frame_idx") * F.greatest(
        (F.col("n_bytes") - frame_bytes) / F.lit(max(n_frames - 1, 1)), F.lit(0)
    )).cast("long")
    return exploded.select(
        "media_id",
        "frame_idx",
        F.expr(f"substring(payload, cast(frame_idx * greatest((n_bytes - {frame_bytes}) / {max(n_frames - 1, 1)}, 0) as int) + 1, {frame_bytes})").alias("frame"),
    )


def resize_stub(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """Deterministic fake resize over binary payloads.

    mapInPandas with the exact contract of a real image resize stage:
    payload in → smaller payload + recorded output size out, per-row,
    no shuffle, Arrow-batched. The fake semantics are byte-level
    nearest-neighbor downsampling — every payload shrinks to exactly
    ``target_bytes`` by evenly-spaced byte picks (shorter payloads are
    zero-padded), so output sizes are schema-checkable and the
    "resized" bytes are reproducible on any engine. A real deployment
    swaps the NumPy body for PIL/libvips; the plumbing (schema, batch
    iteration, vectorized slicing) stays.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("resized", BinaryType()),
            StructField("out_bytes", LongType()),
        ]
    )

    def _resize(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload if payload is not None else b"", dtype=np.uint8)
                if arr.size == 0:
                    out.append(bytes(target_bytes))
                    continue
                # nearest-neighbor sampling at evenly spaced positions
                idx = np.minimum(
                    (np.arange(target_bytes) * arr.size // target_bytes),
                    arr.size - 1,
                )
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "resized": out,
                    "out_bytes": [len(b) for b in out],
                }
            )

    return df.mapInPandas(_resize, schema)
