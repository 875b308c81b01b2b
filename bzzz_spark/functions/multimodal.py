"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are `binary` columns with a metadata struct.  The
Spark-side plumbing — schema, partition-friendly batch shapes, Arrow
UDF signatures — is real and tested; the actual media decode is STUBBED
(image/audio libraries are not in this container): `decode_image`
raises NotImplementedError unless `fake=True`, in which case it emits a
deterministic fake decode derived from the payload bytes so pipelines
can be exercised end-to-end.

At scale: payload columns dominate I/O — keep them in their own parquet
files (column pruning means metadata-only queries never touch them),
size `spark.sql.files.maxPartitionBytes` down (payload rows are fat),
and let mapInPandas stream batches (never collect payloads).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<mime:string, n_bytes:long, checksum:string>"
)


def attach_payload(
    df: DataFrame, src_col: str, id_col: str, kind: str = "image"
) -> DataFrame:
    """Wrap a column's bytes as an opaque media payload with typed
    metadata (the ingest shape for binary modalities)."""
    payload = F.encode(F.col(src_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(f"application/x-{kind}").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, feat_dim: int = 8, fake: bool = True
) -> DataFrame:
    """payload → fixed-dim feature vector via Arrow-batched UDF.

    Real decode is stubbed (no media libs in this container); the fake
    path derives a deterministic vector from payload bytes, keeping the
    batch shape / schema / partitioning identical to a real extractor.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in "
            "this environment; run with fake=True to exercise the pipeline"
        )

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                # deterministic fake "embedding": bucketed byte histogram
                hist = np.bincount(arr % feat_dim, minlength=feat_dim).astype(
                    np.float64
                )
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "features": feats}
            )

    return media.mapInPandas(
        extract, schema="media_id long, features array<double>"
    )


def frame_sample(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Deterministic 'frame sampling' over the payload byte stream —
    the plumbing shape of video frame extraction (one output row per
    sampled frame, exploded), with the decode faked as a byte slice."""
    return media.select(
        "media_id",
        F.posexplode(
            F.slice(
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.greatest(
                            (F.octet_length("payload") / every_n_bytes).cast("int") - 1,
                            F.lit(0),
                        ),
                    ),
                    lambda i: F.substring(
                        F.col("payload").cast("string"), i * every_n_bytes + 1, 16
                    ),
                ),
                1,
                max_frames,
            )
        ).alias("frame_idx", "frame_stub"),
    )
