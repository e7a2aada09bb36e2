"""IMA/DVI ADPCM codec (WAVE format 0x11) — the compressed-audio leg
of the native codec set, implemented from the public IMA ADPCM
specification (the step/index tables and the 4-bit delta expansion
are in the IMA "Recommended Practices for Enhancing Digital Audio
Compatibility" document and countless public implementations).

Decoder (``decode_ima_adpcm``): per WAV block — a 4-byte header
(int16 predictor, uint8 step index, reserved byte) seeds the state,
the header sample is emitted first, then each payload byte carries
two 4-bit deltas (low nibble first).  Stereo blocks carry one 4-byte
header per channel followed by the payload interleaved in 4-byte
(8-sample) groups alternating ch0/ch1 — decoded to an
(n_samples, channels) array; the feature pipeline takes channel 0
per its mono convention.

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
    """WAV 'data' chunk bytes → int16 samples: a flat array for mono,
    an (n_samples, channels) array for multi-channel (4-byte-group
    channel interleave per the IMA spec)."""
    if channels < 1 or channels > 8:
        raise ValueError(f"bad IMA ADPCM channel count {channels}")
    if block_align < 4 * channels:
        raise ValueError("IMA ADPCM block align must be >= 4 per channel")
    payload = block_align - 4 * channels
    if channels > 1 and payload % (4 * channels):
        raise ValueError(
            "stereo IMA ADPCM payload must be a whole number of "
            "4-byte groups per channel"
        )
    chans: list[list[int]] = [[] for _ in range(channels)]
    for blk in range(0, len(data) // block_align * block_align, block_align):
        block = data[blk : blk + block_align]
        preds = [0] * channels
        idxs = [0] * channels
        for c in range(channels):
            hdr = block[4 * c : 4 * c + 4]
            preds[c] = int.from_bytes(hdr[0:2], "little", signed=True)
            idxs[c] = hdr[2]
            if idxs[c] > 88:
                raise ValueError("corrupt IMA ADPCM block (step index > 88)")
            chans[c].append(preds[c])
        body = block[4 * channels :]
        # payload: 4-byte groups round-robin over channels
        for g in range(len(body) // 4):
            c = g % channels
            pred, index = preds[c], idxs[c]
            for byte in body[4 * g : 4 * g + 4]:
                for nibble in (byte & 0x0F, byte >> 4):
                    pred, index = _step_sample(nibble, pred, index)
                    chans[c].append(pred)
            preds[c], idxs[c] = pred, index
    if channels == 1:
        return np.array(chans[0], dtype=np.int16)
    n = min(len(ch) for ch in chans)
    return np.stack(
        [np.array(ch[:n], dtype=np.int16) for ch in chans], axis=1
    )


def _encode_channel_nibbles(blk: np.ndarray, index: int) -> tuple[list[int], int]:
    """Greedy-quantize one channel's block (header sample excluded) →
    (nibble list, final step index)."""
    pred = int(blk[0])
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
    return nibbles, index


def encode_ima_adpcm(samples: np.ndarray, block_align: int = 1024) -> bytes:
    """int16 samples → WAV 'data' chunk bytes (standard greedy
    quantizer).  A flat array encodes mono
    (samples_per_block = (block_align - 4) * 2 + 1); an
    (n, channels) array encodes multi-channel with per-channel
    headers and 4-byte-group interleave, the decoder's exact inverse
    state machine."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        channels = 1
        samples = samples[:, None]
    else:
        channels = samples.shape[1]
    payload = block_align - 4 * channels
    if payload < 0 or (channels > 1 and payload % (4 * channels)):
        raise ValueError("block_align incompatible with channel count")
    spb = payload * 2 // channels + 1  # samples per block per channel
    out = bytearray()
    idxs = [0] * channels
    for blk_start in range(0, samples.shape[0], spb):
        blk = samples[blk_start : blk_start + spb]
        if blk.shape[0] < spb:  # pad the tail block, repeating last sample
            pad = np.repeat(
                blk[-1:] if blk.shape[0] else np.zeros((1, channels), np.int16),
                spb - blk.shape[0],
                axis=0,
            )
            blk = np.concatenate([blk, pad])
        per_chan: list[list[int]] = []
        for c in range(channels):
            out += int(blk[0, c]).to_bytes(2, "little", signed=True)
            out += bytes([idxs[c], 0])
            nibbles, idxs[c] = _encode_channel_nibbles(blk[:, c], idxs[c])
            per_chan.append(nibbles)
        if channels == 1:
            # mono: straight low-nibble-first pairing, no grouping
            nibbles = per_chan[0]
            for lo, hi in zip(nibbles[0::2], nibbles[1::2]):
                out.append(lo | (hi << 4))
        else:
            # interleave: 4-byte (8-nibble) groups, round-robin channels
            total_groups = channels * ((spb - 1) // 8)
            for g in range(total_groups):
                c = g % channels
                k = g // channels
                grp = per_chan[c][k * 8 : k * 8 + 8]
                for lo, hi in zip(grp[0::2], grp[1::2]):
                    out.append(lo | (hi << 4))
    return bytes(out)
