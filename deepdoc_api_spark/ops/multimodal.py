"""Multimodal column handling: opaque binary media + typed metadata.

The engine treats image/audio/video as opaque ``binary`` columns with
typed metadata, flowing through the same span pipeline (media spans are
preserved inline by the extraction kernels). This module adds the
decode / feature-extract plumbing a training-data pipeline needs:

* :func:`media_catalog` — the media table derived from the span corpus
  (doc_id, media_ref, media_kind, payload, size), all Spark-side;
* :func:`extract_media_features` — Arrow-batched ``mapInPandas``
  feature extraction. The actual pixel/sample decode REQUIRES codec
  libraries (Pillow/ffmpeg) that are NOT in this environment, so the
  decode step is STUBBED: :func:`decode_media` raises
  ``NotImplementedError`` unless ``fake=True``, in which case a
  deterministic fake decoder (seeded by the payload hash) produces
  stable dimensions/features. The Spark-side plumbing — schema,
  partitioning, UDF signature, Arrow batch shape — is real and tested;
  swapping in a real decoder changes only the body of
  :func:`decode_media`.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_KINDS = {
    "png": "image", "jpg": "image", "gif": "image",
    "mp4": "video", "wav": "audio",
}

FEATURE_DIM = 16

MEDIA_FEATURES_DDL = (
    "doc_id string, media_ref string, media_kind string, width int, "
    "height int, n_bytes bigint, feature array<float>"
)


def media_catalog(spans_df: DataFrame) -> DataFrame:
    """Media spans → typed media table with a deterministic opaque
    payload (stands in for bytes fetched from a blob store; at scale
    this column comes from the lake, not from generation)."""
    media = (
        spans_df.select(
            "doc_id", F.explode("spans").alias("s")
        )
        .filter(F.col("s.kind") == "media")
        .selectExpr(
            "doc_id",
            "s.media_ref as media_ref",
            "element_at(split(s.media_ref, '\\\\.'), -1) as ext",
        )
    )
    kind_case = (
        "case "
        + " ".join(
            f"when ext = '{e}' then '{k}'" for e, k in MEDIA_KINDS.items()
        )
        + " else 'unknown' end"
    )
    return media.selectExpr(
        "doc_id",
        "media_ref",
        f"{kind_case} as media_kind",
        # deterministic opaque payload: the ref's sha1 repeated — a
        # stand-in blob with content-dependent bytes
        "cast(repeat(sha1(media_ref), 4) as binary) as payload",
    ).withColumn("n_bytes", F.length("payload").cast("long"))


def decode_media(payload: bytes, media_kind: str, fake: bool = False):
    """Decode a media payload to (width, height, feature_vector).

    STUB: real decoding needs Pillow / torchaudio / ffmpeg — not
    available in this environment. With ``fake=True`` a deterministic
    pseudo-decode derives stable values from the payload hash (keeps
    the distributed plumbing testable end-to-end); otherwise raises.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires codec libraries (Pillow/ffmpeg); "
            "install them and replace this stub"
        )
    h = hashlib.sha1(payload or b"").digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    feature = [
        round((h[i % len(h)] - 128) / 128.0, 6) for i in range(FEATURE_DIM)
    ]
    return width, height, feature


def extract_media_features(
    media_df: DataFrame, fake_decode: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over the media table.

    ``mapInPandas`` — one Python crossing per Arrow batch, never per
    row; the batch shape (pdf of N rows with a binary column) is what a
    real image decoder would receive.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref, kind, payload, n_bytes in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["media_kind"],
                pdf["payload"], pdf["n_bytes"],
            ):
                w, hgt, feat = decode_media(
                    bytes(payload) if payload is not None else b"",
                    kind,
                    fake=fake_decode,
                )
                rows.append((doc_id, ref, kind, w, hgt, int(n_bytes), feat))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "doc_id", "media_ref", "media_kind", "width",
                        "height", "n_bytes", "feature",
                    ],
                )

    return media_df.mapInPandas(run, MEDIA_FEATURES_DDL)


def media_kind_histogram(spans_df: DataFrame) -> DataFrame:
    """Typed-metadata aggregate: media kind × count (rows-only check)."""
    return (
        media_catalog(spans_df)
        .groupBy("media_kind")
        .agg(F.count("*").alias("n_media"))
        .selectExpr("media_kind", "cast(n_media as bigint) n_media")
    )
