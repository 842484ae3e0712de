"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work (image decode,
resample, frame extraction) is STUBBED — the decode libraries are not in
this container — behind ``decode_media``, which either raises
``NotImplementedError`` (strict mode) or produces a deterministic fake
(test mode). Swapping in a real decoder changes one function, not the
plan.

Reference linkage: docstrange treats media as whole-file inputs to the
OCR/VLM models (processors/image_processor.py:47-92,
processors/pdf_processor.py:123-183); here media rides alongside text
spans as ``media_ref`` -> binary payload rows.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA_DDL = (
    "media_ref string, kind string, payload binary, "
    "meta map<string,string>"
)

FEATURE_DIM = 16

FEATURE_SCHEMA_DDL = (
    "media_ref string, kind string, n_bytes long, sha1 string, "
    f"features array<float>"
)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload into a dense array.

    STUB: real decoders (PIL/ffmpeg/soundfile) are not available in this
    environment. ``fake=True`` yields a deterministic pseudo-decode (hash
    -> floats) so the distributed plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries not present in this "
            "environment; run with fake=True for deterministic plumbing tests"
        )
    digest = hashlib.sha1(payload).digest()
    raw = np.frombuffer((digest * ((4 * FEATURE_DIM) // len(digest) + 1))[: 4 * FEATURE_DIM], dtype=np.uint8)
    return (raw.astype(np.float32).reshape(FEATURE_DIM, 4).mean(axis=1)) / 255.0


def _feature_kernel(fake: bool):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            shas = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                payload = bytes(payload) if payload is not None else b""
                shas.append(hashlib.sha1(payload).hexdigest())
                feats.append([float(x) for x in decode_media(payload, kind, fake=fake)])
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "sha1": shas,
                    "features": feats,
                }
            )

    return run


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Media table -> feature table via an Arrow-batched kernel. Binary
    payloads are fat rows: callers should keep Arrow batches small (the
    session default) and pre-repartition by ``media_ref`` hash when
    payload sizes are skewed."""
    return media.select("media_ref", "kind", "payload").mapInPandas(
        _feature_kernel(fake), schema=FEATURE_SCHEMA_DDL
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Plumbing for video frame sampling: emits (media_ref, frame_idx)
    rows for a stub frame index — the real decoder would replace the
    count source. Demonstrates the explode-shape the pipeline uses."""
    from pyspark.sql import functions as F

    n_frames = F.pmod(F.xxhash64("media_ref"), F.lit(300)) + 1  # stub count
    return media.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), (n_frames / every_n).cast("int") * every_n, F.lit(every_n))
        ).alias("frame_idx"),
    )
