"""Multimodal span plumbing: media spans as opaque binary + typed
metadata, decode/feature-extract as Arrow-batched UDFs.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (``decode_media`` raises NotImplementedError unless
``fake=True``), while everything Spark-side — schema, partitioning,
``mapInPandas`` signature, batch shape — is real and tested.  On a
cluster with codecs installed, only ``_decode_bytes`` changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", IntegerType()),
    ]
)


def media_spans(raw: DataFrame) -> DataFrame:
    """Project media spans to (doc_id, media_ref, kind, caption)."""
    return (
        raw.select("doc_id", F.explode("spans").alias("s"))
        .filter("s.kind != 'text'")
        .select(
            "doc_id",
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("caption"),
        )
    )


def fetch_payloads(media: DataFrame) -> DataFrame:
    """Materialize the opaque binary column.  In production this reads
    object storage by media_ref; offline the payload is the caption's
    bytes (deterministic stand-in) — the *plumbing* (binary column
    through Arrow batches, partition-parallel) is the real thing."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["caption"].str.encode("utf-8")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "payload": payload,
                    "n_bytes": payload.str.len().astype("int32"),
                }
            )

    return media.mapInPandas(fetch, MEDIA_SCHEMA)


def _decode_bytes(payload: bytes, kind: str, fake: bool):
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio codecs not present in this "
            "container; run with fake=True for the deterministic stub"
        )
    # deterministic fake 'feature': byte-sum mod 997
    return sum(payload) % 997


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_feature", IntegerType()),
    ]
)


def frame_sample(
    media_with_payload: DataFrame, stride: int = 4, frame_bytes: int = 8
) -> DataFrame:
    """Frame sampling plumbing: one media row fans out to one row per
    sampled frame (the video path's shape).  Decode-free deterministic
    stand-in: a 'frame' is the byte window payload[start:start+
    frame_bytes] at every ``stride`` offset, its feature the byte-sum
    mod 997 — swap the window slicing for a real codec's keyframe
    iterator on a cluster with codecs.  Arrow-batched ``mapInPandas``;
    the fan-out happens inside the batch, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "media_ref": [], "kind": [], "frame_idx": [],
                   "frame_feature": []}
            for did, mref, kind, payload in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["kind"], pdf["payload"]
            ):
                for fi, start in enumerate(range(0, len(payload), stride)):
                    fr = payload[start : start + frame_bytes]
                    out["doc_id"].append(did)
                    out["media_ref"].append(mref)
                    out["kind"].append(kind)
                    out["frame_idx"].append(fi)
                    out["frame_feature"].append(sum(fr) % 997)
            if out["doc_id"]:
                yield pd.DataFrame(
                    {
                        "doc_id": out["doc_id"],
                        "media_ref": out["media_ref"],
                        "kind": out["kind"],
                        "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                        "frame_feature": pd.Series(out["frame_feature"], dtype="int32"),
                    }
                )

    return media_with_payload.mapInPandas(run, FRAME_SCHEMA)


def resize_stub(media_with_payload: DataFrame, max_bytes: int = 16) -> DataFrame:
    """'Resize' plumbing: truncate the payload to ``max_bytes`` (the
    deterministic stand-in for a real resample) and emit the typed size
    metadata a real resize would — same schema contract either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: b[:max_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "payload": resized,
                    "n_bytes": resized.str.len().astype("int32"),
                }
            )

    return media_with_payload.mapInPandas(run, MEDIA_SCHEMA)


def extract_features(media_with_payload: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode + feature extraction (stubbed decode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_bytes(p, k, fake)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "feature": pd.Series(feats, index=pdf.index, dtype="int32"),
                }
            )

    return media_with_payload.mapInPandas(run, FEATURE_SCHEMA)
