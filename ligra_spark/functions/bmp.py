"""BMP (Windows DIB) codec — uncompressed 24/32-bit BGR and 8-bit
palette images, the simplest format real crawls still carry.  Public
layout: 14-byte file header ('BM', size, reserved, pixel offset),
BITMAPINFOHEADER (width, height — positive = bottom-up, biBitCount,
biCompression 0 = BI_RGB), optional BGRA palette, 4-byte-aligned
rows.  RLE compression (biCompression 1/2) raises a scoped
``NotImplementedError``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_bmp", "encode_bmp"]


def decode_bmp(buf: bytes) -> np.ndarray:
    """BMP → (H, W, 3) uint8 RGB."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    pix_off = struct.unpack("<I", buf[10:14])[0]
    hdr_size = struct.unpack("<I", buf[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP is not supported")
    w = struct.unpack("<i", buf[18:22])[0]
    h = struct.unpack("<i", buf[22:26])[0]
    _planes, bpp = struct.unpack("<HH", buf[26:30])
    compression = struct.unpack("<I", buf[30:34])[0]
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression} is not supported (BI_RGB only)"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP is not supported")
    if w <= 0 or abs(h) == 0 or w > (1 << 16) or abs(h) > (1 << 16):
        raise ValueError("bad BMP dimensions")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * bpp // 8 + 3) & ~3  # rows pad to 4 bytes
    need = pix_off + row_bytes * h
    if len(buf) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(buf[pix_off : pix_off + row_bytes * h], dtype=np.uint8)
    rows = raw.reshape(h, row_bytes)
    if bottom_up:
        rows = rows[::-1]
    if bpp == 8:
        pal_off = 14 + hdr_size
        ncolors = struct.unpack("<I", buf[46:50])[0] or 256
        pal = np.frombuffer(
            buf[pal_off : pal_off + 4 * ncolors], dtype=np.uint8
        ).reshape(-1, 4)
        if len(pal) < ncolors:
            raise ValueError("truncated BMP palette")
        idx = rows[:, :w]
        bgr = pal[np.minimum(idx, len(pal) - 1)][:, :, :3]
        return bgr[:, :, ::-1].copy()  # BGRA palette -> RGB
    step = bpp // 8
    px = rows[:, : w * step].reshape(h, w, step)
    return px[:, :, 2::-1].copy()  # BGR(A) -> RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) RGB or (H, W) gray → 24-bit bottom-up BI_RGB BMP."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    h, w, _ = img.shape
    img = np.ascontiguousarray(img, dtype=np.uint8)
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = img[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * (row_bytes - len(row))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + info + bytes(body)
