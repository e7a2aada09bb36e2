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
    "AUDIO_FEATURES_SCHEMA",
    "attach_media_metadata",
    "decode_images",
    "image_features",
    "sample_video_frames",
    "decode_audio",
    "audio_features",
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

AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_samples int, sample_rate int, "
    "rms double, peak double, zero_crossings int, afp string"
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
    intermediate pixel table is shuffled or persisted).

    The average-hash threshold compares in EXACT integer arithmetic
    (pixel channel-sum x pixel-count vs the image's total channel
    sum — equivalent to gray > mean(gray) in exact math): a float
    formulation makes bit k flip with the summation ORDER whenever
    gray[k] sits within an ulp of the mean, so the same image could
    fingerprint differently on different engines/partitionings — a
    dedup hazard the oracle pairing actually caught at sf0.1."""

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
                npix = shape[0] * shape[1]
                # channel sums are small ints held exactly in float64;
                # products/totals stay < 2^31 — every compare is exact
                gray3 = stack.sum(axis=3).reshape(len(idxs), -1)  # (B, H*W)
                nbits = min(64, npix)
                bits = gray3[:, :nbits] * npix > gray3.sum(axis=1)[:, None]
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


_FAKE_SAMPLE_RATE = 16_000
_FAKE_N_SAMPLES = 2_048


def _decode_audio_bytes(payload: bytes, fake: bool) -> tuple[np.ndarray, int]:
    """STUB codec boundary for audio.  Real deployment: soundfile /
    ffmpeg PCM decode here.  The deterministic fake derives a fixed-
    length int16 waveform from sha256(payload) so tests can pin the
    plumbing end-to-end without audio libraries installed."""
    if not fake:
        raise NotImplementedError(
            "audio codecs are not installed in this environment; "
            "pass fake=True for the deterministic fake decoder"
        )
    # aperiodic: per-block hashing (sha256(payload || block)) so band
    # energies differ and the fingerprint is non-degenerate
    nblocks = (2 * _FAKE_N_SAMPLES) // 32
    raw = b"".join(
        hashlib.sha256(payload + k.to_bytes(4, "little")).digest()
        for k in range(nblocks)
    )[: 2 * _FAKE_N_SAMPLES]
    return np.frombuffer(raw, dtype="<i2").copy(), _FAKE_SAMPLE_RATE


def decode_audio(media: DataFrame, fake: bool = False) -> DataFrame:
    """binary payload → (media_id, n_samples, sample_rate, pcm binary)
    via Arrow-batched mapInPandas.  PCM is carried as flat
    little-endian int16 bytes plus scalar metadata — the same
    flat-bytes contract as ``decode_images`` (zero-copy Arrow, no
    per-sample python objects)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                wav, sr = _decode_audio_bytes(bytes(payload), fake)
                rows.append(
                    {
                        "media_id": mid,
                        "n_samples": len(wav),
                        "sample_rate": sr,
                        "pcm": wav.tobytes(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        batches,
        schema="media_id long, n_samples int, sample_rate int, pcm binary",
    )


def audio_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + RMS/peak/zero-crossing + a 16-bit band-energy
    fingerprint in ONE Arrow pass (decode fused with features, like
    ``image_features``).  Decode is per-item (variable-size payloads);
    the feature math runs as stacked numpy passes per length class."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            decoded = [_decode_audio_bytes(bytes(p), fake) for p in pdf["payload"]]
            wavs = [wav.astype(np.float64) for wav, _ in decoded]
            srs = np.array([sr for _, sr in decoded], dtype=np.int32)
            ns = np.empty(n, dtype=np.int32)
            rms = np.empty(n, dtype=np.float64)
            peak = np.empty(n, dtype=np.float64)
            zc = np.empty(n, dtype=np.int32)
            afp = np.empty(n, dtype=object)
            by_len: dict[int, list[int]] = {}
            for i, w in enumerate(wavs):
                by_len.setdefault(len(w), []).append(i)
            for ln, idxs in by_len.items():
                ix = np.array(idxs)
                stack = np.stack([wavs[i] for i in idxs])  # (B, ln)
                ns[ix] = ln
                rms[ix] = np.sqrt((stack**2).mean(axis=1))
                peak[ix] = np.abs(stack).max(axis=1)
                zc[ix] = (np.diff(np.signbit(stack), axis=1) != 0).sum(axis=1)
                # 16-band energy fingerprint: band mean-square above
                # the clip's overall mean-square → bit set
                nb = 16
                trim = (ln // nb) * nb
                bands = (stack[:, :trim] ** 2).reshape(len(idxs), nb, -1).mean(axis=2)
                bits = bands > (stack**2).mean(axis=1)[:, None]
                vals = (bits.astype(np.int64) << np.arange(nb - 1, -1, -1)).sum(axis=1)
                for j, i in enumerate(idxs):
                    afp[i] = f"{int(vals[j]):04x}"
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_samples": ns,
                    "sample_rate": srs,  # per-row, from the decoder
                    "rms": rms,
                    "peak": peak,
                    "zero_crossings": zc,
                    "afp": afp,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_SCHEMA
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
