"""Multimodal column plumbing (north-star: image/audio/video at 100TB).

Design: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside (modality, mime, width/height/duration, source URI).
Decode / feature-extraction / resize / frame-sampling run as Arrow-batched
pandas functions over ``mapInPandas`` — one batch of payloads in, one
batch of features out, so the Python boundary is crossed per-batch, never
per-row, and the operator parallelizes like any other scan.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this environment, so the
decode step is STUBBED: ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a deterministic hash-derived feature vector
stands in for real decoding. Everything around the stub — schema,
partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata struct carried next to every binary payload column.
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("modality", T.StringType()),   # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("uri", T.StringType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(
    df: DataFrame, payload_expr, modality: str, mime: str, key: str
) -> DataFrame:
    """Wrap an expression producing bytes into the engine's media layout:
    (media_id, payload binary, meta struct)."""
    return df.select(
        F.col(key).alias("media_id"),
        payload_expr.cast("binary").alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("uri"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+featurizer: md5-seeded
    pseudo-features in [0, 1). Stable across runs/engines/partitionings."""
    digest = hashlib.md5(payload or b"").digest()
    out = []
    while len(out) < dim:
        digest = hashlib.md5(digest).digest()
        out.extend(b / 255.0 for b in digest)
    return out[:dim]


def decode_media(payload: bytes, modality: str, fake: bool = False) -> list[float]:
    """Decode one payload to a feature vector.

    Real decoding requires codec libraries not present in this container —
    the production implementation plugs in here (PIL for image, soundfile/
    librosa for audio, pyav frame sampling for video).
    """
    if not fake:
        raise NotImplementedError(
            f"no {modality} codec available in this environment; "
            "use fake=True for the deterministic test featurizer"
        )
    return _fake_features(payload)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Batch feature extraction over media rows via mapInPandas.

    Input: (media_id, payload, meta). Output: FEATURES_SCHEMA. Batches
    stream through Arrow; repartition upstream by byte-size (not row
    count) when payloads are large — 10k×5MB images per task will not fit
    in an Arrow batch at 100TB.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(p, m["modality"] if m is not None else "unknown", fake=fake)
                for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": [
                        (m["modality"] if m is not None else None) for m in pdf["meta"]
                    ],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame sampling: 1→N rows (media_id, frame_idx, frame_ms,
    features). Frame decode stubbed like decode_media; the explode +
    per-frame feature shape is the real contract."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ms", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if not fake:
                    decode_media(payload, "video", fake=False)  # raises
                dur = (meta["duration_ms"] if meta is not None else None) or 3000
                for idx, ms in enumerate(range(0, int(dur), every_ms)):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": idx,
                            "frame_ms": ms,
                            "features": _fake_features(
                                (payload or b"") + idx.to_bytes(4, "big")
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ms", "features"])

    return df.mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Image resize: payload → payload', metadata width/height updated.

    Real implementation decodes + resamples via PIL (stubbed per
    environment); the fake path re-hashes the payload with the target
    dims so output bytes are deterministic and dimension-dependent. The
    Spark-side contract — binary in/binary out per Arrow batch, metadata
    struct rewritten — is the real, tested part.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                for _, m in zip(pdf["payload"], pdf["meta"]):
                    decode_media(None, m["modality"] if m is not None else "image", fake=False)
            out = pdf.copy()
            out["payload"] = [
                hashlib.md5(
                    (p or b"") + f"|{width}x{height}".encode()
                ).digest()
                for p in pdf["payload"]
            ]
            out["meta"] = [
                None
                if m is None
                else {**dict(m.asDict() if hasattr(m, "asDict") else m), "width": width, "height": height}
                for m in pdf["meta"]
            ]
            yield out

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META_TYPE),
        ]
    )
    return df.mapInPandas(run, schema=schema)
