"""Baseline TIFF codec — the scanned-document format of real crawls,
implemented from the public TIFF 6.0 specification: an IFD (image
file directory) walk over either byte order ('II' little / 'MM' big),
strip-based 8-bit grayscale and RGB, uncompressed (1) or PackBits
(32773) strips.  Tiled, LZW/JPEG-compressed, 16-bit and palette TIFF
raise scoped ``NotImplementedError``.

Encoder (``encode_tiff``): minimal fixture twin — single-strip
uncompressed little-endian, gray or RGB.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_tiff", "encode_tiff"]

# tag ids (TIFF 6.0 §8)
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _unpackbits(data: bytes, expect: int) -> bytes:
    """PackBits (TIFF 6.0 §9): n in [0,127] → copy n+1 literals;
    n in [-127,-1] → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expect:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("truncated PackBits run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expect])


def decode_tiff(buf: bytes) -> np.ndarray:
    """TIFF → (H, W, 3) uint8 (grayscale replicated)."""
    if buf[:2] == b"II":
        e = "<"
    elif buf[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF payload")
    if len(buf) < 8 or struct.unpack(e + "H", buf[2:4])[0] != 42:
        raise ValueError("bad TIFF header")
    ifd_off = struct.unpack(e + "I", buf[4:8])[0]
    if ifd_off + 2 > len(buf):
        raise ValueError("truncated TIFF IFD")
    n_entries = struct.unpack(e + "H", buf[ifd_off : ifd_off + 2])[0]
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(buf):
            raise ValueError("truncated TIFF IFD entry")
        tag, typ, count = struct.unpack(e + "HHI", buf[off : off + 8])
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * count
        if total <= 4:
            raw = buf[off + 8 : off + 8 + total]
        else:
            voff = struct.unpack(e + "I", buf[off + 8 : off + 12])[0]
            raw = buf[voff : voff + total]
            if len(raw) < total:
                raise ValueError("truncated TIFF tag value")
        if typ == 3:
            tags[tag] = list(struct.unpack(e + "H" * count, raw))
        elif typ == 4:
            tags[tag] = list(struct.unpack(e + "I" * count, raw))
        elif typ == 1:
            tags[tag] = list(raw)
    try:
        w = tags[_W][0]
        h = tags[_H][0]
        offs = tags[_STRIP_OFF]
        cnts = tags[_STRIP_CNT]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}") from None
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8])
    comp = tags.get(_COMP, [1])[0]
    photo = tags.get(_PHOTO, [1])[0]
    if photo not in (0, 1, 2):
        # 3 = palette-color (raw indices are NOT grayscale), others
        # (transparency mask, CMYK, YCbCr, CIELab) all need color
        # machinery this baseline decoder does not have
        raise NotImplementedError(
            f"TIFF photometric interpretation {photo} is not supported"
        )
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError("only 8-bit TIFF is supported")
    if spp not in (1, 3):
        raise NotImplementedError(f"{spp} samples/pixel is not supported")
    if comp not in (1, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} is not supported (none/PackBits only)"
        )
    if w <= 0 or h <= 0 or w > (1 << 16) or h > (1 << 16):
        raise ValueError("bad TIFF dimensions")
    if len(offs) != len(cnts):
        raise ValueError("TIFF strip offset/count mismatch")
    out = bytearray()
    row = 0
    for so, sc in zip(offs, cnts):
        strip = buf[so : so + sc]
        if len(strip) < sc:
            raise ValueError("truncated TIFF strip")
        nrows = min(rows_per_strip, h - row)
        expect = nrows * w * spp
        if comp == 32773:
            out += _unpackbits(strip, expect)
        else:
            if len(strip) < expect:
                raise ValueError("short TIFF strip")
            out += strip[:expect]
        row += nrows
    if row < h:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")
    px = np.frombuffer(bytes(out[: h * w * spp]), dtype=np.uint8).reshape(
        h, w, spp
    )
    if photo == 0:
        # WhiteIsZero (scanned/fax TIFFs): 0 = white, max = black
        px = 255 - px
    if spp == 1:
        return np.repeat(px, 3, axis=2)
    return px.copy()


def encode_tiff(img: np.ndarray, photometric: int | None = None) -> bytes:
    """(H, W[, 3]) uint8 → single-strip uncompressed little-endian
    TIFF.  ``photometric`` overrides the tag (test fixture hook for
    WhiteIsZero / palette streams); pixel bytes are written verbatim —
    pass inverted data yourself for a semantically-white-is-zero
    image."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, spp = img.shape
    if spp not in (1, 3):
        raise ValueError("encoder supports 1 or 3 channels")
    data = np.ascontiguousarray(img, dtype=np.uint8).tobytes()
    # layout: header(8) + pixel data + [bits array if spp==3] + IFD
    pix_off = 8
    after_pix = pix_off + len(data)
    bits_off = after_pix
    bits_extra = b""
    if spp == 3:
        bits_extra = struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"  # pad to even
        after_pix += len(bits_extra)
    ifd_off = after_pix
    entries = []

    def entry(tag, typ, count, value):
        entries.append(struct.pack("<HHI", tag, typ, count) + value)

    entry(_W, 3, 1, struct.pack("<HH", w, 0))
    entry(_H, 3, 1, struct.pack("<HH", h, 0))
    if spp == 3:
        entry(_BITS, 3, 3, struct.pack("<I", bits_off))
    else:
        entry(_BITS, 3, 1, struct.pack("<HH", 8, 0))
    entry(_COMP, 3, 1, struct.pack("<HH", 1, 0))
    if photometric is None:
        photometric = 2 if spp == 3 else 1
    entry(_PHOTO, 3, 1, struct.pack("<HH", photometric, 0))
    entry(_STRIP_OFF, 4, 1, struct.pack("<I", pix_off))
    entry(_SPP, 3, 1, struct.pack("<HH", spp, 0))
    entry(_ROWS_PER_STRIP, 3, 1, struct.pack("<HH", h, 0))
    entry(_STRIP_CNT, 4, 1, struct.pack("<I", len(data)))
    ifd = struct.pack("<H", len(entries)) + b"".join(entries) + b"\x00\x00\x00\x00"
    return (
        b"II" + struct.pack("<HI", 42, ifd_off) + data + bits_extra + ifd
    )
