"""Multimodal column plumbing (north-star: image/audio/video at 100TB).

Design: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside (modality, mime, width/height/duration, source URI).
Decode / feature-extraction / resize / frame-sampling run as Arrow-batched
pandas functions over ``mapInPandas`` — one batch of payloads in, one
batch of features out, so the Python boundary is crossed per-batch, never
per-row, and the operator parallelizes like any other scan.

Codec status: PPM (P6) images decode and resize FOR REAL — the format is
a trivial header + raw RGB bytes, so a pure-numpy codec needs no external
library (`_parse_ppm` / `_encode_ppm`). Compressed formats (JPEG/PNG,
audio, video) need codec libraries (PIL/librosa/ffmpeg) that are NOT in
this environment, so for those ``decode_media`` raises NotImplementedError
unless ``fake=True`` (deterministic hash-derived features stand in).
Everything around the codecs — schema, partitioning, UDF signature, batch
shape — is real and tested either way.
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
    pseudo-features in [0, 1). Stable across runs/engines/partitionings.

    The chain hashes HEX STRINGS (not raw digests) deliberately: every
    step is then expressible in any SQL engine (md5(md5(x))...), which is
    what lets q_multimodal_pipeline carry a DuckDB oracle instead of a
    rows-only check."""
    hexd = hashlib.md5(payload or b"").hexdigest()
    out: list[float] = []
    while len(out) < dim:
        hexd = hashlib.md5(hexd.encode()).hexdigest()
        out.extend(int(hexd[i : i + 2], 16) / 255.0 for i in range(0, 32, 2))
    return out[:dim]


def _parse_ppm(payload: bytes):
    """Parse a binary PPM (P6) image to an (h, w, 3) uint8 array, or None
    when the payload is not P6. Pure numpy — no codec library needed."""
    import re

    if not payload or not payload.startswith(b"P6"):
        return None
    m = re.match(rb"P6\s+(?:#[^\n]*\s+)?(\d+)\s+(\d+)\s+(\d+)[ \t\r\n]", payload)
    if m is None:
        return None
    import numpy as np

    w, h, maxval = int(m.group(1)), int(m.group(2)), int(m.group(3))
    if maxval != 255:
        return None  # 16-bit PPM out of scope
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=m.end())
    if data.size < w * h * 3:
        return None
    return data.reshape(h, w, 3)


def _encode_ppm(img) -> bytes:
    """(h, w, 3) uint8 array → binary PPM (P6) bytes."""
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def _ppm_features(img, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic real features from decoded pixels: dims + per-channel
    mean/std + global min/max/median + luma mean + quadrant means."""
    import numpy as np

    f = img.astype("float64")
    h, w = img.shape[0], img.shape[1]
    luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    half_h, half_w = max(h // 2, 1), max(w // 2, 1)
    out = [
        float(w),
        float(h),
        *(float(f[:, :, c].mean()) for c in range(3)),
        *(float(f[:, :, c].std()) for c in range(3)),
        float(f.min()),
        float(f.max()),
        float(np.median(f)),
        float(luma.mean()),
        float(f[:half_h, :half_w].mean()),
        float(f[:half_h, half_w:].mean()) if w > 1 else float(f.mean()),
        float(f[half_h:, :half_w].mean()) if h > 1 else float(f.mean()),
        float(f[half_h:, half_w:].mean()) if h > 1 and w > 1 else float(f.mean()),
    ]
    return out[:dim]


def decode_media(payload: bytes, modality: str, fake: bool = False) -> list[float]:
    """Decode one payload to a feature vector.

    PPM (P6) payloads decode for real (pure numpy). Compressed formats
    require codec libraries not present in this container — the
    production implementation plugs in here (PIL for image, soundfile/
    librosa for audio, pyav frame sampling for video).
    """
    img = _parse_ppm(payload)
    if img is not None:
        return _ppm_features(img)
    if not fake:
        raise NotImplementedError(
            f"no {modality} codec available in this environment "
            "(only uncompressed PPM decodes natively); "
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
                            # text-friendly frame seed (not raw idx
                            # bytes): _fake_features' portability rule —
                            # every step SQL-expressible — requires a
                            # VARCHAR-safe payload suffix (md5 in SQL
                            # engines takes strings, and NUL bytes from
                            # to_bytes would not survive a VARCHAR).
                            "features": _fake_features(
                                (payload or b"") + f"|frame{idx}".encode()
                            ),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ms", "features"])

    return df.mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = True
) -> DataFrame:
    """Image resize: payload → payload', metadata width/height updated.

    PPM (P6) payloads resize for real (numpy nearest-neighbor index
    resample, re-encoded as P6). Compressed formats would decode+resample
    via PIL (absent in this environment) — for those the fake path
    re-hashes the payload with the target dims so output bytes are
    deterministic and dimension-dependent. The Spark-side contract —
    binary in/binary out per Arrow batch, metadata struct rewritten — is
    the real, tested part either way.
    """

    def _resize_one(p: bytes) -> bytes:
        img = _parse_ppm(p)
        if img is not None:
            import numpy as np

            h, w = img.shape[0], img.shape[1]
            ys = (np.arange(height) * h) // height
            xs = (np.arange(width) * w) // width
            return _encode_ppm(np.ascontiguousarray(img[ys][:, xs]))
        if not fake:
            raise NotImplementedError(
                "no image codec available (only PPM resizes natively)"
            )
        return hashlib.md5((p or b"") + f"|{width}x{height}".encode()).digest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [_resize_one(p) for p in pdf["payload"]]
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
