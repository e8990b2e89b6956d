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

import numpy as np
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


def _flat_buffer(payloads: pd.Series):
    """Concatenate a bytes Series into one uint8 buffer + per-row start
    offsets/lengths — the NumPy view every vectorized kernel below works
    on (no per-element Python past the single ``join``)."""
    lens = payloads.str.len().to_numpy(dtype=np.int64)
    buf = np.frombuffer(b"".join(payloads), dtype=np.uint8).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else np.zeros(0, np.int64)
    return buf, starts, lens


def _byte_sums(payloads: pd.Series) -> np.ndarray:
    """Vectorized per-row byte sums: one reduceat over the flat buffer
    (zero-length rows handled: a zero-length segment spans no bytes, so
    consecutive non-empty starts stay contiguous)."""
    buf, starts, lens = _flat_buffer(payloads)
    sums = np.zeros(len(lens), dtype=np.int64)
    nz = lens > 0
    if nz.any():
        sums[nz] = np.add.reduceat(buf, starts[nz])
    return sums


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
            if len(pdf) == 0:
                continue
            buf, row_starts, lens = _flat_buffer(pdf["payload"])
            n_frames = -(-lens // stride)  # ceil; 0 frames for empty rows
            total = int(n_frames.sum())
            if total == 0:
                continue
            # fan-out indices, all vectorized: which row each frame
            # belongs to, and its index within that row
            row_idx = np.repeat(np.arange(len(lens)), n_frames)
            frame_off = np.concatenate(([0], np.cumsum(n_frames)[:-1]))
            frame_idx = np.arange(total) - np.repeat(frame_off, n_frames)
            # absolute [start, end) byte windows (frames may overlap
            # when frame_bytes > stride), clipped to the row
            w_start = row_starts[row_idx] + frame_idx * stride
            w_end = np.minimum(w_start + frame_bytes, row_starts[row_idx] + lens[row_idx])
            # one reduceat over interleaved start/end boundaries sums
            # every window; pad one byte so end == len(buf) is a valid
            # boundary (windows are never empty: start < row end)
            bounds = np.empty(total * 2, dtype=np.int64)
            bounds[0::2], bounds[1::2] = w_start, w_end
            padded = np.concatenate([buf, np.zeros(1, np.int64)])
            feats = np.add.reduceat(padded, bounds)[0::2] % 997
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy()[row_idx],
                    "media_ref": pdf["media_ref"].to_numpy()[row_idx],
                    "kind": pdf["kind"].to_numpy()[row_idx],
                    "frame_idx": frame_idx.astype("int32"),
                    "frame_feature": feats.astype("int32"),
                }
            )

    return media_with_payload.mapInPandas(run, FRAME_SCHEMA)


def resize_stub(media_with_payload: DataFrame, max_bytes: int = 16) -> DataFrame:
    """'Resize' plumbing: truncate the payload to ``max_bytes`` (the
    deterministic stand-in for a real resample) and emit the typed size
    metadata a real resize would — same schema contract either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].str.slice(0, max_bytes)
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
            if not fake:
                # the honest stub: raising goes through the same check
                # a real decoder would replace
                _decode_bytes(b"", "any", fake)
            feats = _byte_sums(pdf["payload"]) % 997
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
