"""Training-data pipeline queries, wave 36: REAL-PIXEL image resize
parity. The multimodal family's existing driver rows check the
Arrow-batch plumbing with hash-derived fake features
(q_multimodal_pipeline) and fake frame sampling (q_multimodal_frames);
this query drives the one codec that decodes FOR REAL in this
environment — PPM/P6, a header plus raw RGB bytes, decodable in pure
numpy — through the full build → resize → decode chain and
value-checks the resampled pixels against a SQL twin.

The synthetic image is pixel-defined by md5 so both engines can compute
any pixel independently: channel values of pixel (y, x) of image d are
the first three bytes of md5("{d}:{y}:{x}"). Nearest-neighbor 4×4 → 2×2
resampling reads exactly the pixels at (y, x) ∈ {0, 2}² (numpy index
rule ys = arange(2)·4 // 2 = [0, 2], operators/multimodal.resize_media),
so the oracle sums those four pixels' channels straight from md5() in
SQL — the resize math, the PPM encode/decode round-trip, AND the
metadata rewrite are all on the checked path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from incubator_flink_old_spark.queries import register
from incubator_flink_old_spark.queries._util import t

_SRC = 4  # source image is 4x4
_DST = 2  # resized to 2x2


def _pixel(d: int, y: int, x: int) -> tuple[int, int, int]:
    """Channel triple of pixel (y, x) of image d — md5-defined so any
    engine can recompute it (first 3 bytes of md5('{d}:{y}:{x}'))."""
    h = hashlib.md5(f"{d}:{y}:{x}".encode()).digest()
    return h[0], h[1], h[2]


def _resize_oracle() -> str:
    # the nearest-neighbor sample grid for 4->2: positions {0, 2}
    pos = [(y * _SRC) // _DST for y in range(_DST)]
    cells = ", ".join(f"({y}, {x})" for y in pos for x in pos)
    chan = (
        "(('0x' || substr(md5(doc_id || ':' || s.y || ':' || s.x), 1, 2))::INT"
        " + ('0x' || substr(md5(doc_id || ':' || s.y || ':' || s.x), 3, 2))::INT"
        " + ('0x' || substr(md5(doc_id || ':' || s.y || ':' || s.x), 5, 2))::INT)"
    )
    return f"""
    SELECT doc_id AS media_id,
           {_DST} AS width,
           {_DST} AS height,
           CAST(SUM({chan}) AS BIGINT) AS pix_sum
    FROM documents, (VALUES {cells}) s(y, x)
    GROUP BY doc_id
    """


@register("q_multimodal_resize", oracle=_resize_oracle())
def q_multimodal_resize(spark, sf_dir):
    """REAL image resize through the engine's media layout: a 4×4 PPM
    image is synthesized per document (pixels md5-defined — see module
    docstring), resized to 2×2 by operators/multimodal.resize_media's
    REAL numpy nearest-neighbor path (PPM decode → index resample → PPM
    re-encode, fake=False so a codec miss raises instead of hashing),
    then decoded again and reduced to the channel sum of the surviving
    pixels. The oracle recomputes those exact pixels from md5() in SQL
    — a value-level check of the whole decode/resample/encode chain,
    not just the plumbing. Output carries the rewritten metadata
    (width, height) to pin the meta contract too.

    Scale: all three Python stages are Arrow-batched mapInPandas over
    independent rows — map-only, no shuffle; at 100 TB this is the
    embarrassingly-parallel preprocessing tier, and the real decoders
    (PIL/ffmpeg) drop into exactly these stage signatures."""
    from incubator_flink_old_spark.operators.multimodal import (
        MEDIA_META_TYPE,
        _parse_ppm,
        resize_media,
    )

    docs = t(spark, sf_dir, "documents").select("doc_id")

    media_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META_TYPE),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from incubator_flink_old_spark.operators.multimodal import _encode_ppm

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                img = np.zeros((_SRC, _SRC, 3), dtype=np.uint8)
                for y in range(_SRC):
                    for x in range(_SRC):
                        img[y, x] = _pixel(int(d), y, x)
                payloads.append(_encode_ppm(img))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "meta": [
                        {
                            "modality": "image",
                            "mime": "image/x-portable-pixmap",
                            "width": _SRC,
                            "height": _SRC,
                            "duration_ms": None,
                            "uri": None,
                        }
                        for _ in payloads
                    ],
                }
            )

    media = docs.mapInPandas(build, schema=media_schema)
    resized = resize_media(media, width=_DST, height=_DST, fake=False)

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("pix_sum", T.LongType()),
        ]
    )

    def reduce_pixels(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sums, ws, hs = [], [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                img = _parse_ppm(p)
                assert img is not None, "resized payload must stay PPM"
                sums.append(int(img.astype("int64").sum()))
                md = dict(m.asDict() if hasattr(m, "asDict") else m)
                ws.append(md["width"])
                hs.append(md["height"])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": ws,
                    "height": hs,
                    "pix_sum": sums,
                }
            )

    return resized.mapInPandas(reduce_pixels, schema=out_schema)
