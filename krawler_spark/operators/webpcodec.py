"""Pure-stdlib WebP **lossless** (VP8L) codec.

Decoder covers the published VP8L bitstream: LSB-first bit reader,
simple + normal (code-length-coded) Huffman codes with the max-symbol
shortcut, color cache, LZ77 backward references (1D distances and the
120-entry 2D neighbor plane-code map), meta-Huffman (entropy image),
and all four transforms — PREDICTOR (14 modes, C-truncation semantics
preserved), COLOR (signed-multiplier cross-channel deltas),
SUBTRACT_GREEN, and COLOR_INDEXING (palette incl. pixel bundling).
Lossy WebP ("VP8 " chunk) is a VP8 intra video frame — a genuinely
different codec that is NOT implemented here and raises; extended
(VP8X) containers are walked for a still VP8L payload.

The 2D plane-code table is spec data; the vendored literal below was
RECOVERED EMPIRICALLY in this sandbox by emitting one crafted VP8L
stream per plane code and observing which pixel the system libwebp
(ground truth, via ctypes) copied — see
``tests/test_webpcodec.py::test_plane_code_table_matches_libwebp``,
which re-derives it from libwebp on every run where the library is
present.

Encoder: a minimal spec-conformant lossless encoder used by the
contract-query oracles — no transforms, no LZ77, no cache; balanced
canonical per-channel Huffman codes written via the code-length code.
Round-trip (this encoder → this decoder, and this encoder → libwebp)
is bit-exact; libwebp's own encoder output (transforms + LZ77 + cache
enabled) is decoded bit-exactly by this decoder in the cross tests.

Reference parity note: the reference crawler (brianmadden/krawler) has
no media pipeline at all — this module belongs to the beyond-reference
training-data surface (multimodal.py).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

# --------------------------------------------------------------------------
# bit I/O (VP8L is LSB-first within bytes)
# --------------------------------------------------------------------------


class _BitReader:
    __slots__ = ("d", "pos", "nbits")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.nbits = len(data) * 8

    def bits(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        v = 0
        d, p = self.d, self.pos
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos += n
        return v

    def bit(self) -> int:
        if self.pos >= self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        b = (self.d[self.pos >> 3] >> (self.pos & 7)) & 1
        self.pos += 1
        return b


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.bit = 0

    def write_bits(self, val: int, n: int) -> None:
        for i in range(n):
            if self.bit == 0:
                self.buf.append(0)
            if (val >> i) & 1:
                self.buf[-1] |= 1 << self.bit
            self.bit = (self.bit + 1) & 7

    def write_code(self, code: int, length: int) -> None:
        """Huffman codes are written MSB-first (decoder walks the tree)."""
        for i in range(length - 1, -1, -1):
            self.write_bits((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        return bytes(self.buf)


# --------------------------------------------------------------------------
# canonical Huffman
# --------------------------------------------------------------------------


def _canonical(lengths) -> dict:
    """symbol -> (code, len), DEFLATE canonical assignment."""
    maxlen = max(lengths) if lengths else 0
    bl_count = [0] * (maxlen + 1)
    for l in lengths:
        if l:
            bl_count[l] += 1
    code = 0
    next_code = [0] * (maxlen + 2)
    for l in range(1, maxlen + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    out = {}
    for sym, l in enumerate(lengths):
        if l:
            out[sym] = (next_code[l], l)
            next_code[l] += 1
    return out


class _Huf:
    """Bit-by-bit canonical Huffman decoder (tiny images; clarity wins)."""

    __slots__ = ("single", "map")

    def __init__(self, lengths=None, single: Optional[int] = None,
                 pair: Optional[Tuple[int, int]] = None):
        self.single = None
        self.map = None
        if single is not None:
            self.single = single
            return
        if pair is not None:  # simple 2-symbol code: read order, not canonical
            self.map = {(1, 0): pair[0], (1, 1): pair[1]}
            return
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty huffman code")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        canon = _canonical(lengths)
        self.map = {(l, c): s for s, (c, l) in canon.items()}

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        ln = 0
        m = self.map
        while True:
            code = (code << 1) | br.bit()
            ln += 1
            s = m.get((ln, code))
            if s is not None:
                return s
            if ln > 15:
                raise ValueError("VP8L: invalid huffman stream")


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _Huf:
    if br.bit():  # simple code
        num_symbols = br.bit() + 1
        if br.bit():
            s0 = br.bits(8)
        else:
            s0 = br.bits(1)
        if num_symbols == 1:
            return _Huf(single=s0)
        s1 = br.bits(8)
        return _Huf(pair=(s0, s1))
    num_codes = br.bits(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl = _Huf(cl_lengths)
    if br.bit():
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L: max_symbol out of range")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cle = cl.read(br)
        if cle < 16:
            lengths[sym] = cle
            sym += 1
            if cle:
                prev = cle
        elif cle == 16:
            rep = 3 + br.bits(2)
            while rep > 0 and sym < alphabet_size:
                lengths[sym] = prev
                sym += 1
                rep -= 1
        elif cle == 17:
            rep = 3 + br.bits(3)
            sym = min(alphabet_size, sym + rep)
        else:  # 18
            rep = 11 + br.bits(7)
            sym = min(alphabet_size, sym + rep)
    return _Huf(lengths)


# --------------------------------------------------------------------------
# LZ77 prefix coding + the 2D plane-code map
# --------------------------------------------------------------------------


def _prefix_value(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _value_to_prefix(v: int) -> Tuple[int, int, int]:
    """(code, extra_val, extra_bits) with _prefix_value as the inverse."""
    if v <= 4:
        return v - 1, 0, 0
    for c in range(4, 40):
        e = (c - 2) >> 1
        base = (2 + (c & 1)) << e
        if base + 1 <= v <= base + (1 << e):
            return c, v - base - 1, e
    raise ValueError(f"prefix value {v} out of range")


# Plane codes 1..120 map to 2D (dx, dy) neighbor offsets; entry byte is
# (dy << 4) | (8 - dx), distance = dy * xsize + dx (min 1). Recovered
# from the system libwebp (see module docstring + cross test).
_PLANE_CODES = bytes([
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x35, 0x3b,
    0x46, 0x4a, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70,
])


def _plane_to_dist(plane_code: int, xsize: int) -> int:
    if plane_code > 120:
        return plane_code - 120
    entry = _PLANE_CODES[plane_code - 1]
    yoff = entry >> 4
    xoff = 8 - (entry & 0xF)
    dist = yoff * xsize + xoff
    return dist if dist >= 1 else 1


# --------------------------------------------------------------------------
# entropy-coded image (shared by the ARGB image and all sub-images)
# --------------------------------------------------------------------------

_CACHE_MUL = 0x1E35A7BD


def _read_entropy_image(br: _BitReader, w: int, h: int,
                        allow_meta: bool) -> List[int]:
    """Decode one spatially-coded image to a list of ARGB ints."""
    cache_bits = 0
    cache = None
    meta = None
    meta_bits = 0
    meta_w = 0

    if br.bit():  # color cache (read BEFORE the meta-huffman bit)
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache size")
        cache = [0] * (1 << cache_bits)

    if allow_meta and br.bit():  # meta huffman (entropy image)
        meta_bits = br.bits(3) + 2
        meta_w = (w + (1 << meta_bits) - 1) >> meta_bits
        meta_h = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _read_entropy_image(br, meta_w, meta_h, False)

    n_groups = 1
    if meta is not None:
        n_groups = max(((p >> 8) & 0xFFFF) for p in meta) + 1
    green_alpha = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_huffman_code(br, green_alpha)
        r = _read_huffman_code(br, 256)
        b = _read_huffman_code(br, 256)
        a = _read_huffman_code(br, 256)
        d = _read_huffman_code(br, 40)
        groups.append((g, r, b, a, d))

    npix = w * h
    pix: List[int] = []
    shift = (32 - cache_bits) if cache_bits else 0

    def emit(p: int) -> None:
        pix.append(p)
        if cache is not None:
            cache[(_CACHE_MUL * p & 0xFFFFFFFF) >> shift] = p

    while len(pix) < npix:
        if meta is not None:
            i = len(pix)
            x, y = i % w, i // w
            mp = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            grp = groups[(mp >> 8) & 0xFFFF]
        else:
            grp = groups[0]
        s = grp[0].read(br)
        if s < 256:
            red = grp[1].read(br)
            blue = grp[2].read(br)
            alpha = grp[3].read(br)
            emit((alpha << 24) | (red << 16) | (s << 8) | blue)
        elif s < 280:
            length = _prefix_value(s - 256, br)
            dcode = grp[4].read(br)
            dist = _plane_to_dist(_prefix_value(dcode, br), w)
            if dist > len(pix):
                raise ValueError("VP8L: backref before image start")
            for _ in range(length):
                if len(pix) >= npix:
                    raise ValueError("VP8L: backref past image end")
                emit(pix[-dist])
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without cache")
            emit(cache[s - 280])
    return pix


# --------------------------------------------------------------------------
# transforms (inverse)
# --------------------------------------------------------------------------


def _ch(p: int) -> Tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg(a: int, b: int) -> int:
    aa, ar, ag, ab = _ch(a)
    ba, br_, bg, bb = _ch(b)
    return _pack((aa + ba) >> 1, (ar + br_) >> 1, (ag + bg) >> 1, (ab + bb) >> 1)


def _clip255(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _sel(a: int, b: int, c: int) -> int:
    pa_minus_pb = 0
    for sh in (24, 16, 8, 0):
        ac, bc, cc = (a >> sh) & 0xFF, (b >> sh) & 0xFF, (c >> sh) & 0xFF
        pa_minus_pb += abs(bc - cc) - abs(ac - cc)
    return a if pa_minus_pb <= 0 else b


def _cas_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = _clip255(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF))
        out |= v << sh
    return out


def _cas_half(l: int, t: int, tl: int) -> int:
    ave = _avg(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        b = (tl >> sh) & 0xFF
        d = a - b
        half = -((-d) >> 1) if d < 0 else d >> 1  # C truncation toward zero
        out |= _clip255(a + half) << sh
    return out


def _apply_predictor(pix: List[int], w: int, h: int,
                     modes: List[int], bits: int, mw: int) -> None:
    for i in range(w * h):
        x, y = i % w, i // w
        if x == 0 and y == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = pix[i - 1]
        elif x == 0:
            pred = pix[i - w]
        else:
            mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
            L, T = pix[i - 1], pix[i - w]
            TL, TR = pix[i - w - 1], pix[i - w + 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = L
            elif mode == 2:
                pred = T
            elif mode == 3:
                pred = TR
            elif mode == 4:
                pred = TL
            elif mode == 5:
                pred = _avg(_avg(L, TR), T)
            elif mode == 6:
                pred = _avg(L, TL)
            elif mode == 7:
                pred = _avg(L, T)
            elif mode == 8:
                pred = _avg(TL, T)
            elif mode == 9:
                pred = _avg(T, TR)
            elif mode == 10:
                pred = _avg(_avg(L, TL), _avg(T, TR))
            elif mode == 11:
                pred = _sel(T, L, TL)
            elif mode == 12:
                pred = _cas_full(L, T, TL)
            elif mode == 13:
                pred = _cas_half(L, T, TL)
            else:
                raise ValueError(f"VP8L: predictor mode {mode}")
        p = pix[i]
        pix[i] = _pack(
            (((p >> 24) & 0xFF) + ((pred >> 24) & 0xFF)) & 0xFF,
            (((p >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF,
            (((p >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF,
            ((p & 0xFF) + (pred & 0xFF)) & 0xFF,
        )


def _s8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    return (_s8(t) * _s8(c)) >> 5


def _apply_color_transform(pix: List[int], w: int, h: int,
                           mults: List[int], bits: int, mw: int) -> None:
    for i in range(w * h):
        x, y = i % w, i // w
        m = mults[(y >> bits) * mw + (x >> bits)]
        g2r, g2b, r2b = (m >> 0) & 0xFF, (m >> 8) & 0xFF, (m >> 16) & 0xFF
        p = pix[i]
        a, r, g, b = _ch(p)
        r = (r + _ct_delta(g2r, g)) & 0xFF
        b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
        pix[i] = _pack(a, r, g, b)


def _apply_subtract_green(pix: List[int]) -> None:
    for i, p in enumerate(pix):
        a, r, g, b = _ch(p)
        pix[i] = _pack(a, (r + g) & 0xFF, g, (b + g) & 0xFF)


def _apply_color_index(pix: List[int], w: int, h: int,
                       palette: List[int], xbits: int,
                       packed_w: int) -> List[int]:
    out = [0] * (w * h)
    bpp = 8 >> xbits
    per = 1 << xbits
    mask = (1 << bpp) - 1
    n = len(palette)
    for y in range(h):
        for px in range(packed_w):
            packed = (pix[y * packed_w + px] >> 8) & 0xFF
            for k in range(per):
                x = px * per + k
                if x >= w:
                    break
                idx = (packed >> (k * bpp)) & mask
                out[y * w + x] = palette[idx] if idx < n else 0
    return out


# --------------------------------------------------------------------------
# decoder entry points
# --------------------------------------------------------------------------


def decode_vp8l(data: bytes):
    """Decode a raw VP8L chunk payload to an (h, w, 4) uint8 RGBA array."""
    import numpy as np

    br = _BitReader(data)
    if br.bits(8) != 0x2F:
        raise ValueError("VP8L: bad signature")
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("VP8L: unknown version")

    transforms = []  # (type, payload) in read order
    seen = set()
    xsize = w
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("VP8L: duplicate transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color transform
            bits = br.bits(3) + 2
            mw = (xsize + (1 << bits) - 1) >> bits
            mh = (h + (1 << bits) - 1) >> bits
            sub = _read_entropy_image(br, mw, mh, False)
            transforms.append((ttype, (sub, bits, mw)))
        elif ttype == 2:  # subtract green
            transforms.append((2, None))
        else:  # color indexing
            n = br.bits(8) + 1
            raw = _read_entropy_image(br, n, 1, False)
            palette = []
            prev = 0
            for e in raw:  # palette entries are delta-coded per channel
                pa, pr, pg, pb = _ch(prev)
                ea, er, eg, eb = _ch(e)
                prev = _pack((pa + ea) & 0xFF, (pr + er) & 0xFF,
                             (pg + eg) & 0xFF, (pb + eb) & 0xFF)
                palette.append(prev)
            if n <= 2:
                xbits = 3
            elif n <= 4:
                xbits = 2
            elif n <= 16:
                xbits = 1
            else:
                xbits = 0
            packed_w = (xsize + (1 << xbits) - 1) >> xbits
            transforms.append((3, (palette, xbits, xsize)))
            xsize = packed_w

    pix = _read_entropy_image(br, xsize, h, True)

    for ttype, payload in reversed(transforms):
        if ttype == 3:
            palette, xbits, full_w = payload
            pix = _apply_color_index(pix, full_w, h, palette, xbits, xsize)
            xsize = full_w
        elif ttype == 2:
            _apply_subtract_green(pix)
        elif ttype == 1:
            sub, bits, mw = payload
            _apply_color_transform(pix, xsize, h, sub, bits, mw)
        else:
            sub, bits, mw = payload
            _apply_predictor(pix, xsize, h, sub, bits, mw)

    arr = np.empty((h, w, 4), dtype=np.uint8)
    flat = np.array(pix, dtype=np.uint32).reshape(h, w)
    arr[..., 0] = (flat >> 16) & 0xFF
    arr[..., 1] = (flat >> 8) & 0xFF
    arr[..., 2] = flat & 0xFF
    arr[..., 3] = (flat >> 24) & 0xFF
    return arr


def decode_webp(payload: bytes):
    """Decode a WebP container holding a lossless (VP8L) still image to
    an (h, w, 4) uint8 RGBA array. Lossy ("VP8 ") payloads raise
    NotImplementedError — VP8 is a video intra codec, out of scope for
    a stdlib decoder."""
    b = bytes(payload or b"")
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise ValueError("not a WebP byte stream")
    pos = 12
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + size]
        if tag == b"VP8L":
            return decode_vp8l(body)
        if tag == b"VP8 ":
            raise NotImplementedError(
                "lossy WebP (VP8 intra frame) needs libwebp — only "
                "lossless (VP8L) decodes natively")
        pos += 8 + size + (size & 1)
    raise ValueError("WebP: no VP8L chunk found")


# --------------------------------------------------------------------------
# minimal spec-conformant lossless encoder (oracle / test path)
# --------------------------------------------------------------------------


def _balanced_lengths(freqs: dict) -> dict:
    """Valid canonical code lengths (Kraft equality) for the used
    symbols: the 2^L - k most frequent get length L-1, the rest L."""
    syms = sorted(freqs, key=lambda s: (-freqs[s], s))
    k = len(syms)
    if k <= 2:
        raise ValueError("use a simple code")
    L = (k - 1).bit_length()
    n_short = (1 << L) - k
    lengths = {}
    for i, s in enumerate(syms):
        lengths[s] = L - 1 if i < n_short else L
    return lengths


def _write_code_lengths(bw: _BitWriter, lengths: dict, alphabet: int) -> None:
    """Normal-code representation: the alphabet's length sequence coded
    symbol-by-symbol with the 19-symbol code-length code (no repeats)."""
    seq = [lengths.get(s, 0) for s in range(alphabet)]
    # trim trailing zeros via the max-symbol shortcut? keep it simple:
    # write them all (tests, not production compression).
    clfreq: dict = {}
    for v in seq:
        clfreq[v] = clfreq.get(v, 0) + 1
    if len(clfreq) == 1:
        cl_lengths = {next(iter(clfreq)): 1}
        # a 1-entry length set is not Kraft-complete; add a dummy
        other = 0 if next(iter(clfreq)) != 0 else 1
        cl_lengths[other] = 1
    elif len(clfreq) == 2:
        cl_lengths = {s: 1 for s in clfreq}
    else:
        cl_lengths = _balanced_lengths(clfreq)
    if max(cl_lengths.values()) > 7:
        raise ValueError("code-length code too deep")
    bw.write_bits(0, 1)  # not simple
    used_order_idx = [i for i, s in enumerate(_CL_ORDER) if cl_lengths.get(s, 0)]
    num_codes = max(max(used_order_idx) + 1, 4)
    bw.write_bits(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write_bits(cl_lengths.get(_CL_ORDER[i], 0), 3)
    bw.write_bits(0, 1)  # no max-symbol shortcut
    cl_canon = _canonical([cl_lengths.get(s, 0) for s in range(19)])
    for v in seq:
        code, ln = cl_canon[v]
        bw.write_code(code, ln)


def _write_channel_code(bw: _BitWriter, freqs: dict, alphabet: int):
    """Write one Huffman code; returns symbol -> (code, len) for the
    pixel stream. Uses the simple form for <=2 distinct symbols."""
    syms = sorted(freqs)
    if len(syms) == 1:
        s = syms[0]
        bw.write_bits(1, 1)  # simple
        bw.write_bits(0, 1)  # one symbol
        if s < 2:
            bw.write_bits(0, 1)
            bw.write_bits(s, 1)
        else:
            bw.write_bits(1, 1)
            bw.write_bits(s, 8)
        return {s: (0, 0)}
    if len(syms) == 2:
        bw.write_bits(1, 1)
        bw.write_bits(1, 1)  # two symbols
        bw.write_bits(1, 1)  # first as 8 bits
        bw.write_bits(syms[0], 8)
        bw.write_bits(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    lengths = _balanced_lengths(freqs)
    _write_code_lengths(bw, lengths, alphabet)
    canon = _canonical([lengths.get(s, 0) for s in range(alphabet)])
    return canon


def encode_webp_lossless(arr) -> bytes:
    """Encode an (h, w, 3|4) uint8 array as a lossless WebP (VP8L): no
    transforms, no cache, no LZ77 — per-channel balanced Huffman codes.
    Bit-exact round trip through decode_webp AND through libwebp."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8")
    h, w = a.shape[:2]
    if not (1 <= w <= 1 << 14 and 1 <= h <= 1 << 14):
        raise ValueError("image too large for VP8L header")
    if a.shape[2] == 3:
        alpha = np.full((h, w, 1), 255, dtype=np.uint8)
        a = np.concatenate([a, alpha], axis=2)

    bw = _BitWriter()
    bw.write_bits(0x2F, 8)
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)  # alpha hint
    bw.write_bits(0, 3)  # version
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no color cache
    bw.write_bits(0, 1)  # no meta huffman

    chans = {
        "g": a[..., 1].ravel(), "r": a[..., 0].ravel(),
        "b": a[..., 2].ravel(), "a": a[..., 3].ravel(),
    }
    freqs = {k: dict(zip(*[u.tolist() for u in np.unique(v, return_counts=True)]))
             for k, v in chans.items()}
    g_code = _write_channel_code(bw, freqs["g"], 256 + 24)
    r_code = _write_channel_code(bw, freqs["r"], 256)
    b_code = _write_channel_code(bw, freqs["b"], 256)
    a_code = _write_channel_code(bw, freqs["a"], 256)
    _write_channel_code(bw, {0: 1}, 40)  # distance: unused 1-symbol code

    g, r, b, al = chans["g"], chans["r"], chans["b"], chans["a"]
    for i in range(w * h):
        for code_map, v in ((g_code, g[i]), (r_code, r[i]),
                            (b_code, b[i]), (a_code, al[i])):
            code, ln = code_map[int(v)]
            if ln:
                bw.write_code(code, ln)
    body = bw.bytes()
    if len(body) & 1:
        padded = body + b"\x00"
    else:
        padded = body
    riff_size = 4 + 8 + len(padded)
    return (b"RIFF" + struct.pack("<I", riff_size) + b"WEBP" +
            b"VP8L" + struct.pack("<I", len(body)) + padded)


def is_webp(payload: bytes) -> bool:
    b = bytes(payload or b"")
    return len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WEBP"


# --------------------------------------------------------------------------
# animated WebP (VP8X + ANIM + ANMF, lossless frames)
# --------------------------------------------------------------------------


def _chunks(b: bytes, start: int = 12):
    pos = start
    while pos + 8 <= len(b):
        tag = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        yield tag, b[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)


def is_animated_webp(payload: bytes) -> bool:
    b = bytes(payload or b"")
    if not is_webp(b):
        return False
    for tag, body in _chunks(b):
        if tag == b"VP8X":
            return len(body) >= 1 and bool(body[0] & 0x02)
    return False


def encode_webp_anim(frames, duration_ms: int = 100, loop: int = 0) -> bytes:
    """Assemble an animated WebP: VP8X (ANIM flag) + ANIM + one ANMF
    per frame, each a full-canvas lossless (VP8L) frame with no-blend /
    keep disposal — mirroring the APNG/GIF fixture encoders."""
    import numpy as np

    if not frames:
        raise ValueError("no frames")
    h, w = np.asarray(frames[0]).shape[:2]
    body = bytearray()

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (tag + struct.pack("<I", len(payload)) + payload +
                (b"\x00" if len(payload) & 1 else b""))

    flags = 0x02  # animation
    vp8x = struct.pack("<B3s", flags, b"\x00" * 3)
    vp8x += (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
    body += chunk(b"VP8X", vp8x)
    body += chunk(b"ANIM", struct.pack("<IH", 0, loop))
    for fr in frames:
        a = np.asarray(fr, dtype=np.uint8)
        if a.shape[:2] != (h, w):
            raise ValueError("all frames must share the canvas size")
        still = encode_webp_lossless(a)
        # the frame data is the still's chunk stream (here: one VP8L)
        (vp8l_size,) = struct.unpack("<I", still[16:20])
        frame_chunks = still[12:12 + 8 + vp8l_size + (vp8l_size & 1)]
        anmf = ((0).to_bytes(3, "little") + (0).to_bytes(3, "little") +
                (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little") +
                int(duration_ms).to_bytes(3, "little") +
                bytes([0x02]) +  # no-blend, keep (dispose-to-none)
                frame_chunks)
        body += chunk(b"ANMF", anmf)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + bytes(body)


def decode_webp_anim(payload: bytes):
    """Decode an animated WebP's frames to (h, w, 4) uint8 RGBA arrays.
    Full-canvas no-blend lossless frames decode exactly; sub-canvas
    placement, alpha blending, and dispose-to-background compositing
    raise NotImplementedError (the sampling pipeline treats those as
    decode failures rather than faking pixels); lossy (VP8) frames
    raise inside decode_vp8l dispatch."""
    b = bytes(payload or b"")
    if not is_animated_webp(b):
        raise ValueError("not an animated WebP")
    frames = []
    canvas = None
    for tag, body in _chunks(b):
        if tag == b"VP8X":
            cw = int.from_bytes(body[4:7], "little") + 1
            ch_ = int.from_bytes(body[7:10], "little") + 1
            canvas = (cw, ch_)
        elif tag == b"ANMF":
            fx = int.from_bytes(body[0:3], "little") * 2
            fy = int.from_bytes(body[3:6], "little") * 2
            fw = int.from_bytes(body[6:9], "little") + 1
            fh = int.from_bytes(body[9:12], "little") + 1
            fflags = body[15]
            if (fx, fy) != (0, 0) or canvas is None or (fw, fh) != canvas:
                raise NotImplementedError("sub-canvas WebP frames")
            if not fflags & 0x02:
                raise NotImplementedError("alpha-blended WebP frames")
            if fflags & 0x01:
                raise NotImplementedError("dispose-to-background WebP frames")
            sub = bytes(body[16:])
            got = None
            for stag, sbody in _chunks(b"RIFF\x00\x00\x00\x00WEBP" + sub):
                if stag == b"VP8L":
                    got = decode_vp8l(sbody)
                    break
                if stag == b"VP8 ":
                    raise NotImplementedError("lossy WebP frame")
            if got is None:
                raise ValueError("ANMF without image data")
            frames.append(got)
    if not frames:
        raise ValueError("animated WebP with no frames")
    return frames
