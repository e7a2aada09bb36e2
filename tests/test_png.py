"""PNG codec tests: lossless round-trips, all five row filters,
channel normalization (gray/palette/alpha), scope boundaries, and the
fused Spark decode+features path over real PNG bytes."""

import struct
import zlib

import numpy as np
import pytest

from ligra_spark.functions.png import decode_png, encode_png


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(w, h, color, raw, extra=b""):
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_rgb_roundtrip_exact():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (9, 21, 3)).astype(np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_gray_roundtrip_replicates():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (13, 17)).astype(np.uint8)
    dec = decode_png(encode_png(img))
    assert dec.shape == (13, 17, 3)
    for ch in range(3):
        assert (dec[:, :, ch] == img).all()


def test_all_filters_reconstruct():
    # hand-encode one row per filter type (None/Sub/Up/Average/Paeth)
    rng = np.random.RandomState(2)
    w, h = 8, 5
    img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w * 3, dtype=np.int64)
    for y, f in zip(range(h), [1, 2, 3, 4, 0]):
        line = img[y].reshape(-1).astype(np.int64)
        enc = np.zeros(w * 3, dtype=np.uint8)
        for x in range(w * 3):
            a = int(line[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (int(line[x]) - pred) & 0xFF
        raw.append(f)
        raw += enc.tobytes()
        prev = line
    assert (decode_png(_png(w, h, 2, bytes(raw))) == img).all()


def test_palette_and_alpha_normalization():
    # indexed: 2x2 pixels over a 3-entry palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 1])  # two rows, filter 0
    dec = decode_png(_png(2, 2, 3, raw, extra=_chunk(b"PLTE", plte)))
    assert dec[0, 0].tolist() == [255, 0, 0]
    assert dec[1, 1].tolist() == [0, 255, 0]
    # RGBA: alpha dropped
    raw = bytes([0, 10, 20, 30, 99, 40, 50, 60, 99])
    dec = decode_png(_png(2, 1, 6, raw))
    assert dec[0, 0].tolist() == [10, 20, 30]
    assert dec[0, 1].tolist() == [40, 50, 60]


def test_scope_boundaries():
    img = np.zeros((8, 8), dtype=np.uint8)
    buf = bytearray(encode_png(img))
    # flip interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12):
    # the stream now parses as Adam7 but its pass layout is short —
    # a clean contract error, not a crash (interlace itself decodes)
    buf[8 + 8 + 12] = 1
    with pytest.raises(ValueError):
        decode_png(bytes(buf))
    # invalid bit depth byte
    buf2 = bytearray(encode_png(img))
    buf2[8 + 8 + 8] = 3
    with pytest.raises(ValueError):
        decode_png(bytes(buf2))
    with pytest.raises(ValueError):
        decode_png(b"JUNK")


def test_image_features_over_real_png(spark):
    import hashlib

    import pandas as pd

    from ligra_spark.functions.multimodal import image_features

    rows = []
    means = {}
    for i in range(6):
        d = hashlib.sha256(f"p{i}".encode()).digest()
        arr = np.frombuffer((d * 6)[: 8 * 8 * 3], dtype=np.uint8).reshape(8, 8, 3)
        rows.append((i, encode_png(arr)))
        means[i] = arr[:, :, 0].mean()
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [r[0] for r in rows], "payload": [r[1] for r in rows]})
    )
    out = {r["media_id"]: r for r in image_features(media, fake=False).collect()}
    assert len(out) == 6
    for i, m in means.items():
        assert (out[i]["height"], out[i]["width"], out[i]["channels"]) == (8, 8, 3)
        assert out[i]["mean_r"] == pytest.approx(m, abs=0)


def test_adam7_interlaced_roundtrip():
    # seven independently-filtered passes scattered back onto the grid
    rng = np.random.RandomState(8)
    for shape in [(8, 8), (13, 9), (16, 21, 3), (3, 3), (1, 10)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        out = decode_png(encode_png(img, interlace=True))
        ref = decode_png(encode_png(img))
        assert (out == ref).all(), shape


def _chunk(ctype, body):
    import struct
    import zlib as z

    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", z.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _hand_png(w, h, depth, color, rows_bytes, plte=None):
    import struct
    import zlib as z

    from ligra_spark.functions.png import _SIG

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", z.compress(rows_bytes)) + _chunk(b"IEND", b"")
    return out


def test_low_bit_depth_gray_and_palette():
    # 1-bit gray, 10x2: bottom-up MSB-first packing; scaled to 0/255
    rows = (
        bytes([0, 0b10101010, 0b10000000])
        + bytes([0, 0b00000111, 0b11000000])
    )
    out = decode_png(_hand_png(10, 2, 1, 0, rows))
    assert list(out[0, :, 0] // 255) == [1, 0, 1, 0, 1, 0, 1, 0, 1, 0]
    assert list(out[1, :, 0] // 255) == [0, 0, 0, 0, 0, 1, 1, 1, 1, 1]
    # 4-bit palette, 5x1: indices 1..5
    plte = bytes()
    for i in range(16):
        plte += bytes([i * 3, i * 3 + 1, i * 3 + 2])
    rows4 = bytes([0, 0x12, 0x34, 0x50])
    out4 = decode_png(_hand_png(5, 1, 4, 3, rows4, plte))
    assert list(out4[0, :, 0]) == [3, 6, 9, 12, 15]
    # 2-bit gray scaling: 0,1,2,3 -> 0,85,170,255
    rows2 = bytes([0, 0b00011011])
    out2 = decode_png(_hand_png(4, 1, 2, 0, rows2))
    assert list(out2[0, :, 0]) == [0, 85, 170, 255]


def test_16bit_png_high_byte():
    import struct

    # 2x1 RGB 16-bit: big-endian samples; decode keeps the high byte
    px = struct.pack(">HHHHHH", 0xFF00, 0x1234, 0x0001, 0x8000, 0x7FFF, 0xABCD)
    out = decode_png(_hand_png(2, 1, 16, 2, bytes([0]) + px))
    assert list(out[0, 0]) == [0xFF, 0x12, 0x00]
    assert list(out[0, 1]) == [0x80, 0x7F, 0xAB]


def test_sub_byte_color_type_rejected():
    # depth 4 is only legal for gray/palette; RGB at depth 4 must fail
    with pytest.raises(ValueError):
        decode_png(_hand_png(2, 1, 4, 2, bytes([0, 0x12])))
