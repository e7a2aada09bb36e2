"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched pandas UDFs
over ``mapInPandas``.

The Spark side — schemas, partition-preserving batch iteration, UDF
signatures, batch shapes — is real and tested.  The codec layer
(actual JPEG/PNG/audio decode) is STUBBED: the container ships no
image/audio libraries, so ``decode_image`` raises NotImplementedError
unless ``fake=True`` selects the deterministic fake decoder (a pure
function of the bytes, used by tests to pin the plumbing end-to-end).
On a real cluster you swap ``_decode_image_bytes`` for Pillow/ffmpeg
calls — nothing else changes.

Batch-shape contract (the thing that matters at 100 TB): each
``mapInPandas`` batch holds ``spark.sql.execution.arrow.
maxRecordsPerBatch`` rows (default 10k); one decoded image of HxWx3
uint8 is carried as a flat bytes payload plus (height, width,
channels) ints — NOT a nested array column — so Arrow transfer stays
zero-copy and the executor never materializes a python list per pixel.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURES_SCHEMA",
    "attach_media_metadata",
    "decode_images",
    "image_features",
    "sample_video_frames",
]

# canonical multimodal table shape: opaque payload + typed metadata
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, height int, width int, channels int, "
    "mean_r double, mean_g double, mean_b double, phash string"
)


def _decode_image_bytes(payload: bytes, fake: bool) -> np.ndarray:
    """STUB codec boundary.  Real deployment: Pillow/ffmpeg here."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "pass fake=True for the deterministic fake decoder"
        )
    # deterministic fake: 8x8x3 image derived from sha256(payload)
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer((h * 6)[: 8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3)


def attach_media_metadata(df: DataFrame, payload: str = "payload") -> DataFrame:
    """JVM-side metadata: payload size + sha256 (no Python)."""
    return df.withColumns(
        {
            "payload_bytes": F.length(F.col(payload)),
            "payload_sha256": F.sha2(F.col(payload), 256),
        }
    )


def decode_images(media: DataFrame, fake: bool = False) -> DataFrame:
    """binary payload → (media_id, height, width, channels, pixels
    binary) via Arrow-batched mapInPandas.  Partitioning of the input
    is preserved (mapInPandas is a narrow transformation)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = _decode_image_bytes(bytes(payload), fake)
                rows.append(
                    {
                        "media_id": mid,
                        "height": img.shape[0],
                        "width": img.shape[1],
                        "channels": img.shape[2],
                        "pixels": img.tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        batches,
        schema="media_id long, height int, width int, channels int, pixels binary",
    )


def image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + per-channel means + a 64-bit average-hash (pHash-style)
    in ONE Arrow pass (decode fused with feature extraction — no
    intermediate pixel table is shuffled or persisted)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            # decode is inherently per-item (variable-size payloads —
            # the codec boundary); everything after runs as stacked
            # numpy passes per shape class, not per row
            imgs = [
                _decode_image_bytes(bytes(p), fake).astype(np.float64)
                for p in pdf["payload"]
            ]
            hh = np.empty(n, dtype=np.int32)
            ww = np.empty(n, dtype=np.int32)
            cc = np.empty(n, dtype=np.int32)
            means = np.empty((n, 3), dtype=np.float64)
            phash = np.empty(n, dtype=object)
            by_shape: dict[tuple, list[int]] = {}
            for i, im in enumerate(imgs):
                by_shape.setdefault(im.shape, []).append(i)
            for shape, idxs in by_shape.items():
                ix = np.array(idxs)
                stack = np.stack([imgs[i] for i in idxs])  # (B, H, W, C)
                hh[ix], ww[ix], cc[ix] = shape[0], shape[1], shape[2]
                means[ix] = stack.mean(axis=(1, 2))
                gray = stack.mean(axis=3)  # (B, H, W)
                nbits = min(64, shape[0] * shape[1])
                bits = (
                    gray.reshape(len(idxs), -1)[:, :nbits]
                    > gray.mean(axis=(1, 2))[:, None]
                )
                # object dtype from the start: 1 << 63 overflows int64
                weights = np.array(
                    [1 << k for k in range(nbits - 1, -1, -1)], dtype=object
                )
                vals = (bits.astype(object) * weights).sum(axis=1)
                for j, i in enumerate(idxs):
                    phash[i] = f"{int(vals[j]):016x}"
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "height": hh,
                    "width": ww,
                    "channels": cc,
                    "mean_r": means[:, 0],
                    "mean_g": means[:, 1],
                    "mean_b": means[:, 2],
                    "phash": phash,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp
    (duration_ms driven), each row a decoded frame.  The STUB treats
    the payload as the frame source; real deployment seeks with
    ffmpeg."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                dur = int(dur) if dur is not None else 0
                for ts in range(0, max(dur, 1), every_ms):
                    frame = _decode_image_bytes(
                        bytes(payload) + ts.to_bytes(4, "little"), fake
                    )
                    rows.append(
                        {"media_id": mid, "ts_ms": ts, "frame": frame.tobytes()}
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        batches, schema="media_id long, ts_ms int, frame binary"
    )
