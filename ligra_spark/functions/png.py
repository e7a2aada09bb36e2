"""Pure-Python/numpy PNG codec — the second compressed image format
decoded natively (with ``jpeg.py``): PNG is DEFLATE (Python's bundled
``zlib``, public stdlib) plus per-row byte filters, so a complete
8-bit decoder needs no external codec library.

Decoder (``decode_png``): chunk walk (CRC-checked lengths, IHDR/IDAT/
IEND; PLTE for indexed), zlib-inflate of the concatenated IDAT
stream, per-row unfilter (None/Sub/Up/Average/Paeth — RFC 2083 §6),
and channel normalization to (H, W, 3) uint8: grayscale replicates,
alpha is dropped (training-pipeline convention — compositing policy
belongs to the caller), palette indices look up PLTE.  Interlaced
(Adam7) and 16-bit images raise ``NotImplementedError`` — scoped
boundaries.  PNG is lossless, so decode is bit-exact by construction:
no quantization tricks needed for the oracle pairing.

Encoder (``encode_png``): minimal fixture twin — 8-bit gray or RGB,
filter 0 rows, one zlib-compressed IDAT.  Deterministic (fixed zlib
level) so fixtures are reproducible.

No reference parity to cite: rwang067/ligra has no media layer —
this extends the engine toward the training-data-pipeline brief.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "encode_png"]

_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(buf: bytes) -> np.ndarray:
    """8-bit PNG → (H, W, 3) uint8.  See module docstring for scope."""
    if buf[:8] != _SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(buf):
        length = struct.unpack(">I", buf[pos : pos + 4])[0]
        ctype = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            if len(body) < 13:
                raise ValueError("truncated PNG IHDR")
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG is not supported")
    if depth != 8:
        raise NotImplementedError(f"{depth}-bit PNG is not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"bad PNG color type {color}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * channels
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    rows = raw[: h * (stride + 1)].reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        line = data[y].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub — sequential in x (prefix dependence)
            for x in range(bpp, stride):
                line[x] = (int(line[x]) + int(line[x - bpp])) & 0xFF
        elif f == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = line
        prev = out[y]
    px = out.reshape(h, w, channels)
    if color == 3:  # palette
        if plte is None:
            raise ValueError("indexed PNG missing PLTE")
        return plte[px[:, :, 0]]
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:  # gray + alpha: drop alpha, replicate
        return np.repeat(px[:, :, :1], 3, axis=2)
    if channels == 4:  # RGBA: drop alpha
        return px[:, :, :3].copy()
    return px.copy()


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Minimal deterministic encoder: (H, W) / (H, W, 1) gray or
    (H, W, 3) RGB, 8-bit, filter-0 rows, single IDAT."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c == 1:
        color = 0
    elif c == 3:
        color = 2
    else:
        raise ValueError("encoder supports 1- or 3-channel 8-bit images")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type None
        raw += img[y].tobytes()
    comp = zlib.compress(bytes(raw), level)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")
    )
