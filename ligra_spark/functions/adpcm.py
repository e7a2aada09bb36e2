"""IMA/DVI ADPCM codec (WAVE format 0x11) — the compressed-audio leg
of the native codec set, implemented from the public IMA ADPCM
specification (the step/index tables and the 4-bit delta expansion
are in the IMA "Recommended Practices for Enhancing Digital Audio
Compatibility" document and countless public implementations).

Decoder (``decode_ima_adpcm``): per WAV block — a 4-byte header
(int16 predictor, uint8 step index, reserved byte) seeds the state,
the header sample is emitted first, then each payload byte carries
two 4-bit deltas (low nibble first).  Mono only — stereo IMA
interleaves 4-byte channel groups and raises a scoped
``NotImplementedError`` here (channel-0 extraction would need the
same nibble walk; the training-pipeline convention is mono anyway).

Encoder (``encode_ima_adpcm``): the standard greedy quantizer —
fixture/test twin, byte-exact round-trip with the decoder's state
machine (ADPCM is lossy vs the ORIGINAL signal, but
decode(encode(x)) is deterministic and the decoder's reconstruction
is exactly the encoder's internal prediction, which the tests pin).
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_ima_adpcm", "encode_ima_adpcm"]

STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
        41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
        190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
        724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
        2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
        6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
        16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int32,
)
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _step_sample(nibble: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA expansion step: (new predictor, new index)."""
    step = int(STEP_TABLE[index])
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        pred -= diff
    else:
        pred += diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(INDEX_TABLE[nibble & 7])))
    return pred, index


def decode_ima_adpcm(
    data: bytes, block_align: int, channels: int = 1
) -> np.ndarray:
    """WAV 'data' chunk bytes → int16 samples (mono)."""
    if channels != 1:
        raise NotImplementedError(
            "stereo IMA ADPCM is not supported (mono decodes natively)"
        )
    if block_align < 4:
        raise ValueError("IMA ADPCM block align must be >= 4")
    out: list[int] = []
    for blk in range(0, len(data) // block_align * block_align, block_align):
        block = data[blk : blk + block_align]
        pred = int.from_bytes(block[0:2], "little", signed=True)
        index = block[2]
        if index > 88:
            raise ValueError("corrupt IMA ADPCM block (step index > 88)")
        out.append(pred)
        for byte in block[4:]:
            for nibble in (byte & 0x0F, byte >> 4):
                pred, index = _step_sample(nibble, pred, index)
                out.append(pred)
    return np.array(out, dtype=np.int16)


def encode_ima_adpcm(samples: np.ndarray, block_align: int = 1024) -> bytes:
    """int16 mono samples → WAV 'data' chunk bytes (standard greedy
    quantizer; samples_per_block = (block_align - 4) * 2 + 1)."""
    samples = np.asarray(samples, dtype=np.int16)
    spb = (block_align - 4) * 2 + 1
    out = bytearray()
    index = 0
    for blk_start in range(0, len(samples), spb):
        blk = samples[blk_start : blk_start + spb]
        if len(blk) < spb:  # pad the tail block by repeating the last sample
            blk = np.concatenate(
                [blk, np.full(spb - len(blk), blk[-1] if len(blk) else 0, np.int16)]
            )
        pred = int(blk[0])
        out += int(pred).to_bytes(2, "little", signed=True)
        out += bytes([index, 0])
        nibbles: list[int] = []
        for s in blk[1:]:
            step = int(STEP_TABLE[index])
            diff = int(s) - pred
            nibble = 0
            if diff < 0:
                nibble = 8
                diff = -diff
            if diff >= step:
                nibble |= 4
                diff -= step
            if diff >= step >> 1:
                nibble |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nibble |= 1
            pred, index = _step_sample(nibble, pred, index)
            nibbles.append(nibble)
        for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
            out.append(lo | (hi << 4))
    return bytes(out)
