"""MJPEG-in-AVI container support — the video leg of the native codec
set: AVI is a RIFF chunk tree (the same walk ``_decode_wav_pcm`` does
for WAVE) and Motion-JPEG frames are plain baseline JPEGs, so frame
sampling decodes end-to-end through ``jpeg.decode_jpeg`` with zero
codec libraries.

``decode_avi_frames``: RIFF('AVI ') walk — 'hdrl' LIST → 'avih'
(dwMicroSecPerFrame, the only timing field sampling needs), 'movi'
LIST → ordered '##dc'/'##db' stream chunks (compressed / uncompressed
video).  Returns (frame payload list, µs per frame).  Non-MJPEG
codecs surface naturally: the per-frame payload goes through the
image codec boundary, which raises its scoped NotImplementedError.

``encode_mjpeg_avi``: minimal fixture twin — one video stream, 'avih'
with frame timing/counts, movi '00dc' chunks (even-padded per RIFF).

Interframe formats (MP4/H.264 etc.) remain the declared boundary —
they need a real demuxer+decoder; the plumbing (sampling schedule,
batch shapes, schema) is identical when ffmpeg replaces this layer.
"""

from __future__ import annotations

import struct

__all__ = ["decode_avi_frames", "encode_mjpeg_avi"]


def decode_avi_frames(buf: bytes) -> tuple[list[bytes], int]:
    """AVI payload → (ordered frame payloads, µs per frame)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    usec_per_frame = 0
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal usec_per_frame
        pos = lo
        while pos + 8 <= hi:
            cid = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body_lo = pos + 8
            body_hi = min(body_lo + size, hi)
            if cid == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list-type fourcc
            elif cid == b"avih":
                usec_per_frame = struct.unpack(
                    "<I", buf[body_lo : body_lo + 4]
                )[0]
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append(bytes(buf[body_lo:body_hi]))
            pos = body_lo + size + (size & 1)  # chunks pad to even

    walk(12, len(buf))
    if not frames:
        raise ValueError("AVI contained no video frames")
    return frames, usec_per_frame


def encode_mjpeg_avi(frames: list[bytes], usec_per_frame: int) -> bytes:
    """Minimal single-stream MJPEG AVI from encoded JPEG frames."""
    if not frames:
        raise ValueError("need at least one frame")

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    # avih: µs/frame, max bytes/s, padding, flags, total frames, initial
    # frames, streams, buffer, w, h, reserved[4]
    avih = struct.pack(
        "<14I", usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0, 0, 0, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
