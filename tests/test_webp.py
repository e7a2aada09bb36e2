"""VP8L (lossless WebP) codec tests: encoder-twin round-trips for the
literal/subtract-green/palette paths, plus HAND-BUILT bitstreams for
everything the minimal twin does not emit — LZ77 backward references,
the color cache, the meta-Huffman entropy image, predictor and
cross-color transforms, 2-symbol simple codes and code-length repeat
codes — and clean-failure fuzzing."""

import numpy as np
import pytest

from ligra_spark.functions.webp import (
    _REV8,
    _BitWriterLSB,
    _CL_ORDER,
    _wrap_riff,
    _write_flat_code,
    _write_single_symbol_code,
    decode_webp,
    encode_webp_lossless,
)


# --------------------------------------------------------------- round-trips


def test_roundtrip_plain_and_subtract_green():
    rng = np.random.RandomState(1)
    for shape in [(1, 1, 3), (7, 11, 3), (16, 5, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        assert (decode_webp(encode_webp_lossless(img)) == img).all()
        assert (
            decode_webp(encode_webp_lossless(img, subtract_green=True)) == img
        ).all()


def test_roundtrip_palette_all_bundlings():
    rng = np.random.RandomState(2)
    # 2 colors -> 8 px/byte, 3 -> 4 px/byte, 9 -> 2 px/byte, 200 -> none
    for ncol in (2, 3, 9, 200):
        base = rng.randint(0, ncol, (9, 21)).astype(np.uint8)
        lut = rng.randint(0, 256, (ncol, 3)).astype(np.uint8)
        img = lut[base]
        assert (decode_webp(encode_webp_lossless(img, palette=True)) == img).all(), ncol


def test_roundtrip_gray_replicates():
    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    out = decode_webp(encode_webp_lossless(g))
    for c in range(3):
        assert (out[:, :, c] == g).all()


# ------------------------------------------------------- hand-built streams


class _HandCoder:
    """Normal (code-length-coded) prefix codes for hand-built streams:
    supports arbitrary sparse length maps, optional 16/17/18 repeat
    codes, and MSB-first emission of canonical code words."""

    def __init__(self, bw):
        self.bw = bw

    @staticmethod
    def _canonical(lengths):
        nz = sorted((ln, s) for s, ln in lengths.items() if ln)
        codes = {}
        code = 0
        prev = nz[0][0]
        for ln, sym in nz:
            code <<= ln - prev
            prev = ln
            codes[sym] = (code, ln)
            code += 1
        assert code == 1 << prev, "hand code not complete"
        return codes

    def write_msb(self, code, n):
        for i in range(n - 1, -1, -1):
            self.bw.write((code >> i) & 1, 1)

    def emit_code(self, lengths, alphabet, use_repeats=False):
        """Emit one normal prefix code for ``lengths`` ({sym: len})."""
        # plan the code-length-symbol emissions
        emissions = []  # (cl_symbol, extra_value, extra_bits)
        i = 0
        maxsym = max(lengths) + 1
        while i < maxsym:
            ln = lengths.get(i, 0)
            if ln == 0:
                run = 0
                while i + run < maxsym and lengths.get(i + run, 0) == 0:
                    run += 1
                if use_repeats and run >= 11:
                    take = min(run, 138)
                    emissions.append((18, take - 11, 7))
                    i += take
                elif use_repeats and run >= 3:
                    take = min(run, 10)
                    emissions.append((17, take - 3, 3))
                    i += take
                else:
                    emissions.append((0, 0, 0))
                    i += 1
            else:
                emissions.append((ln, 0, 0))
                i += 1
        used = sorted({e[0] for e in emissions})
        # pad the CL symbol set to a power of two with unused symbols
        pad = 15
        while len(used) & (len(used) - 1):
            while pad in used:
                pad -= 1
            used.append(pad)
            pad -= 1
        used.sort()
        if len(used) == 1:
            cl_lengths = {used[0]: 1}
        else:
            bits = len(used).bit_length() - 1
            cl_lengths = {s: bits for s in used}
        cl_codes = self._canonical(cl_lengths) if len(used) > 1 else None
        # header
        self.bw.write(0, 1)  # not simple
        num_cl = max(_CL_ORDER.index(s) for s in used) + 1
        num_cl = max(num_cl, 4)
        self.bw.write(num_cl - 4, 4)
        for i2 in range(num_cl):
            self.bw.write(cl_lengths.get(_CL_ORDER[i2], 0), 3)
        # max_symbol = number of emissions (each loop turn reads one)
        self.bw.write(1, 1)
        nbits = 8
        while 2 + (1 << nbits) - 1 < len(emissions):
            nbits += 2
        self.bw.write((nbits - 2) // 2, 3)
        self.bw.write(len(emissions) - 2, nbits)
        for sym, extra, ebits in emissions:
            if cl_codes is not None:
                c, ln = cl_codes[sym]
                self.write_msb(c, ln)
            if ebits:
                self.bw.write(extra, ebits)
        return self._canonical(lengths)


def _stream_header(bw, w, h):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def test_hand_lz77_backref():
    # 1x8: literal (5,7,9), copy len 4 dist 1, three more literals
    bw = _BitWriterLSB()
    hc = _HandCoder(bw)
    _stream_header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no entropy image
    bw.write(0, 1)  # no cache
    # green: {5, 6, 259(len=4 prefix)}; r {7,8} simple-2; b single 9;
    # a single 255; distance single symbol 1 (prefix value 2 ->
    # neighborhood (1,0) -> dist 1)
    gcodes = hc.emit_code({5: 2, 6: 2, 259: 1}, 280, use_repeats=True)
    bw.write(1, 1)  # red: simple, 2 symbols
    bw.write(1, 1)
    bw.write(1, 1)  # first symbol in 8 bits
    bw.write(7, 8)
    bw.write(8, 8)
    _write_single_symbol_code(bw, 9)  # blue
    _write_single_symbol_code(bw, 255)  # alpha
    _write_single_symbol_code(bw, 1)  # distance
    rcodes = {7: (0, 1), 8: (1, 1)}

    def lit(gsym, rsym):
        c, ln = gcodes[gsym]
        hc.write_msb(c, ln)
        c, ln = rcodes[rsym]
        hc.write_msb(c, ln)

    lit(5, 7)  # pixel 0
    c, ln = gcodes[259]  # length-prefix symbol: copy 4 @ dist 1
    hc.write_msb(c, ln)
    lit(6, 8)  # pixel 5
    lit(5, 7)
    lit(6, 8)
    out = decode_webp(_wrap_riff(b"\x2f" + bw.finish()))
    assert out.shape == (1, 8, 3)
    want = [
        (7, 5, 9), (7, 5, 9), (7, 5, 9), (7, 5, 9), (7, 5, 9),
        (8, 6, 9), (7, 5, 9), (8, 6, 9),
    ]
    assert [tuple(p) for p in out[0]] == want


def test_hand_color_cache():
    # literal pixel P, then a cache hit of P via its hash index
    P = (255, 12, 34, 56)  # A,R,G,B
    cache_bits = 4
    argb = (P[0] << 24) | (P[1] << 16) | (P[2] << 8) | P[3]
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw = _BitWriterLSB()
    hc = _HandCoder(bw)
    _stream_header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no entropy image
    bw.write(1, 1)  # cache
    bw.write(cache_bits, 4)
    gcodes = hc.emit_code(
        {34: 1, 256 + 24 + int(idx): 1}, 280 + (1 << cache_bits),
        use_repeats=True,
    )
    _write_single_symbol_code(bw, 12)  # red
    _write_single_symbol_code(bw, 56)  # blue
    _write_single_symbol_code(bw, 255)  # alpha
    _write_single_symbol_code(bw, 0)  # distance
    c, ln = gcodes[34]
    hc.write_msb(c, ln)  # literal
    c, ln = gcodes[256 + 24 + int(idx)]
    hc.write_msb(c, ln)  # cache hit
    out = decode_webp(_wrap_riff(b"\x2f" + bw.finish()))
    assert [tuple(p) for p in out[0]] == [(12, 34, 56), (12, 34, 56)]


def test_hand_entropy_image_two_groups():
    # 8x1, entropy_bits=2 -> 2 blocks of 4px with different groups
    bw = _BitWriterLSB()
    _stream_header(bw, 8, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # entropy image present
    bw.write(0, 3)  # bits-2=0 -> entropy_bits=2
    # 2x1 sub-image: green = group id (r=0): literal flat stream
    bw.write(0, 1)  # sub-image: no cache
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_single_symbol_code(bw, 0)
    for gid in (0, 1):  # two pixels: g=group id
        bw.write(_REV8[gid], 8)
        bw.write(_REV8[0], 8)
        bw.write(_REV8[0], 8)
        bw.write(_REV8[255], 8)
    bw.write(0, 1)  # main: no cache
    # group 0: all single-symbol codes -> pixel (1,2,3) at 0 bits
    _write_single_symbol_code(bw, 2)  # green
    _write_single_symbol_code(bw, 1)  # red
    _write_single_symbol_code(bw, 3)  # blue
    _write_single_symbol_code(bw, 255)
    _write_single_symbol_code(bw, 0)
    # group 1: pixel (4,5,6)
    _write_single_symbol_code(bw, 5)
    _write_single_symbol_code(bw, 4)
    _write_single_symbol_code(bw, 6)
    _write_single_symbol_code(bw, 255)
    _write_single_symbol_code(bw, 0)
    out = decode_webp(_wrap_riff(b"\x2f" + bw.finish()))
    assert [tuple(p) for p in out[0, :4]] == [(1, 2, 3)] * 4
    assert [tuple(p) for p in out[0, 4:]] == [(4, 5, 6)] * 4


def _predictor_stream(w, h, mode, residuals):
    """One predictor-transformed stream: a single block (bits chosen
    to cover the image) whose mode sub-image pixel is ``mode``; the
    residual plane is literal-coded."""
    bw = _BitWriterLSB()
    _stream_header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    bits = 3  # 8x8 blocks
    bw.write(bits - 2, 3)
    # 1x1 sub-image: green = mode
    bw.write(0, 1)  # no cache
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_single_symbol_code(bw, 0)
    bw.write(_REV8[mode], 8)
    bw.write(_REV8[0], 8)
    bw.write(_REV8[0], 8)
    bw.write(_REV8[255], 8)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no entropy image
    bw.write(0, 1)  # no cache
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_single_symbol_code(bw, 0)
    for y in range(h):
        for x in range(w):
            a, r, g, b = residuals[y][x]
            bw.write(_REV8[g & 0xFF], 8)
            bw.write(_REV8[r & 0xFF], 8)
            bw.write(_REV8[b & 0xFF], 8)
            bw.write(_REV8[a & 0xFF], 8)
    return _wrap_riff(b"\x2f" + bw.finish())


def test_hand_predictor_left_mode_constant_image():
    # constant (100,150,200): with mode 1 (Left) only the top-left
    # pixel carries a nonzero residual (minus the 0xff000000 seed)
    w = h = 4
    res = [[(0, 0, 0, 0)] * w for _ in range(h)]
    res[0][0] = (0, 100, 150, 200)
    out = decode_webp(_predictor_stream(w, h, 1, res))
    assert (out == np.array([100, 150, 200], np.uint8)).all()


def test_hand_predictor_top_and_clamp_modes():
    # mode 2 (Top): a vertical gradient carries +16/row residuals in
    # the left column only (row 0 uses Left; column 0 uses Top)
    w, h = 3, 4
    res = [[(0, 0, 0, 0)] * w for _ in range(h)]
    res[0][0] = (0, 40, 40, 40)
    for y in range(1, h):
        for x in range(w):
            res[y][x] = (0, 16, 16, 16)
    out = decode_webp(_predictor_stream(w, h, 2, res))
    for y in range(h):
        assert (out[y] == 40 + 16 * y).all()
    # mode 12 (ClampAddSubtractFull = L + T - TL): a bilinear ramp has
    # zero residuals away from the borders
    w = h = 4
    plane = [[10 + 7 * x + 5 * y for x in range(w)] for y in range(h)]
    res = [[(0, 0, 0, 0)] * w for _ in range(h)]
    res[0][0] = (0, plane[0][0], plane[0][0], plane[0][0])
    for x in range(1, w):
        d = plane[0][x] - plane[0][x - 1]
        res[0][x] = (0, d, d, d)
    for y in range(1, h):
        d = plane[y][0] - plane[y - 1][0]
        res[y][0] = (0, d, d, d)
    out = decode_webp(_predictor_stream(w, h, 12, res))
    for y in range(h):
        for x in range(w):
            assert out[y, x, 0] == plane[y][x]


def test_hand_cross_color_transform():
    # one block, green_to_red = 32 (delta = g >> 0 ... (32*g)>>5 = g):
    # coded red of 0 restores to (0 + g) & 0xff
    w = h = 2
    bw = _BitWriterLSB()
    _stream_header(bw, w, h)
    bw.write(1, 1)
    bw.write(1, 2)  # cross-color
    bw.write(1, 3)  # bits-2=1 -> 8x8 block
    bw.write(0, 1)  # sub-image: no cache
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_single_symbol_code(bw, 0)
    # element pixel: BLUE channel = green_to_red = 32, others 0
    bw.write(_REV8[0], 8)  # g (green_to_blue)
    bw.write(_REV8[0], 8)  # r (red_to_blue)
    bw.write(_REV8[32], 8)  # b (green_to_red)
    bw.write(_REV8[255], 8)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)
    bw.write(0, 1)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_flat_code(bw)
    _write_single_symbol_code(bw, 0)
    greens = [10, 20, 200, 250]
    for g in greens:
        bw.write(_REV8[g], 8)  # green
        bw.write(_REV8[0], 8)  # red coded 0
        bw.write(_REV8[5], 8)  # blue coded 5
        bw.write(_REV8[255], 8)
    out = decode_webp(_wrap_riff(b"\x2f" + bw.finish()))
    flat = out.reshape(-1, 3)
    for i, g in enumerate(greens):
        gi = np.int8(np.uint8(g))
        want_r = (0 + ((32 * int(gi)) >> 5)) & 0xFF
        assert flat[i, 0] == want_r, (i, flat[i], want_r)
        assert flat[i, 1] == g
        assert flat[i, 2] == 5  # g2b = r2b = 0 leaves blue alone


# ---------------------------------------------------------------- failures


def test_scope_boundaries_and_corruption():
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_webp_lossless(img)
    # lossy chunk rejected
    lossy = good.replace(b"VP8L", b"VP8 ", 1)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    with pytest.raises(NotImplementedError):
        decode_webp(good.replace(b"VP8L", b"VP8X", 1))
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_webp(good[: len(good) // 2])
    rng = np.random.RandomState(4)
    big = encode_webp_lossless(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8))
    for _ in range(80):
        bad = bytearray(big)
        for _ in range(rng.randint(1, 5)):
            bad[rng.randint(20, len(bad))] = rng.randint(0, 256)
        try:
            out = decode_webp(bytes(bad))
            assert out.ndim == 3 and out.shape[0] <= 1 << 14
        except (ValueError, NotImplementedError):
            pass
