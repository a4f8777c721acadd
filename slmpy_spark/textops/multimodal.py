"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted via Arrow-batched kernels.

The sandbox ships no image/audio codecs, so the *decode* step is a
deterministic fake behind ``decode_backend`` ("fake" default;
"real" raises NotImplementedError where a PIL/ffmpeg call would go).
Everything Spark-side — schema, partitioning, mapInPandas batch shape,
output contract — is real and tested: swapping in a real codec touches
only `_decode_payload`.

media schema:
    media(media_id long, kind string, payload binary,
          width int, height int, meta string)
features output:
    (media_id, kind, n_bytes, feat array<float>)  — FEAT_DIM floats
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEAT_DIM = 16

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, meta string"
)


def _decode_payload(payload: bytes, kind: str, backend: str) -> np.ndarray:
    """Decode one payload to a FEAT_DIM feature vector."""
    if backend == "real":
        raise NotImplementedError(
            "real decode needs an image/audio codec (PIL/ffmpeg) — not "
            "available in this environment; use backend='fake'"
        )
    # deterministic fake: byte-histogram folded to FEAT_DIM buckets,
    # L1-normalized — stable across runs/machines, exercises the same
    # array shapes a real extractor would produce
    if not payload:
        return np.zeros(FEAT_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % FEAT_DIM, minlength=FEAT_DIM).astype(np.float64)
    return (hist / hist.sum()).astype(np.float32)


def docs_to_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table (the
    sandbox testdata ships no binary columns): payload = the utf-8 text
    bytes, kind alternates image/audio by id.  Lets the driver exercise
    the full multimodal plumbing (schema → mapInPandas → features) on
    real parquet inputs."""
    from pyspark.sql import functions as F

    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(0).alias("width"),
        F.lit(0).alias("height"),
        F.lit("{}").alias("meta"),
    )


def media_features(media: DataFrame, backend: str = "fake") -> DataFrame:
    """Feature-extract every payload (Arrow-batched, vectorized per
    batch; zero per-row Python on the Spark side)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_payload(
                    bytes(p) if p is not None else b"", k, backend
                ).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feat": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        batches, "media_id long, kind string, n_bytes long, feat array<float>"
    )
