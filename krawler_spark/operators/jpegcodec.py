"""Pure-stdlib baseline JPEG codec (JFIF / SOF0 sequential Huffman).

Removes the last still-image decode stub in ``multimodal.py``: JPEG
payloads now decode natively, like PNG (``multimodal.decode_png``) and
GIF (``gifcodec``). numpy is used for the 8×8 DCT algebra; everything
else is stdlib.

Decoder scope (honest about what it does):

* baseline sequential DCT (SOF0/1), 8-bit, 1 or 3 components;
* progressive DCT (SOF2): spectral selection, successive approximation
  (DC/AC first + refinement scans), EOB runs, per-scan restart
  intervals — cross-validated against Java ImageIO's libjpeg-derived
  codec (exact on DC-only content, within IDCT rounding elsewhere;
  ``tests/test_jpeg_progressive.py``);
* Huffman tables are read from the file's own DHT segments (any valid
  tables, not just Annex K);
* chroma subsampling with integer factors (4:4:4, 4:2:2, 4:2:0 — any
  h/v in {1,2}), 2× factors upsampled with the libjpeg-style triangle
  filter, larger by replication;
* restart markers (DRI/RSTn) honored;
* arithmetic coding, 12-bit, hierarchical, and lossless modes raise
  ``NotImplementedError`` — no fake canvas.

The encoder emits 4:4:4 SOF0 with per-image canonical Huffman tables
and a flat all-ones quantization table by default: at that setting the
only loss is YCbCr<->RGB and IDCT rounding, so decode recovers pixels
to within ±2 per channel (exact for flat-gray inputs where the color
transform is lossless at the sample values used by the contract
oracle). JPEG is a LOSSY format — the contract-query oracle therefore
uses flat-luma payloads whose round-trip is bit-exact by construction;
the tolerance tests cover the general path.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    import math

    import numpy as np

    a = np.zeros((8, 8))
    for u in range(8):
        c = math.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


# --------------------------------------------------------------------------
# Huffman
# --------------------------------------------------------------------------

def _build_canonical(freqs: Dict[int, int]) -> Tuple[List[int], List[int]]:
    """Canonical Huffman code lengths (<=16) for the used symbols.

    Returns JPEG DHT form: (bits[1..16] counts, symbol list in code
    order). The all-ones code of the longest length is kept unused
    (spec convention) by reserving one phantom leaf."""
    import heapq

    syms = sorted(freqs)
    if not syms:
        raise ValueError("no symbols to code")
    # phantom symbol (-1) with freq 0 reserves the all-ones code slot,
    # mirroring libjpeg's trick
    heap = [(max(f, 1), i, [s]) for i, (s, f) in enumerate(
        [(s, freqs[s]) for s in syms] + [(-1, 0)])]
    heapq.heapify(heap)
    tick = len(heap)
    length = {s: 0 for s in [h[2][0] for h in heap]}
    while len(heap) > 1:
        fa, _, sa = heapq.heappop(heap)
        fb, _, sb = heapq.heappop(heap)
        for s in sa + sb:
            length[s] += 1
        heapq.heappush(heap, (fa + fb, tick, sa + sb))
        tick += 1
    if len(length) == 1:  # single real symbol + phantom may collapse
        length = {syms[0]: 1, -1: 1}
    # clamp to 16 (package-merge would be optimal; for the tiny symbol
    # sets here a simple push-down is always feasible)
    over = sorted((l, s) for s, l in length.items() if l > 16)
    if over:
        # force everything deep: assign uniform minimal lengths
        n = len(length)
        import math

        l = max(1, math.ceil(math.log2(n)))
        length = {s: l for s in length}
    bits = [0] * 17
    for s, l in length.items():
        if s != -1:
            bits[l] += 1
    order: List[int] = []
    for l in range(1, 17):
        order.extend(sorted(s for s, ln in length.items() if ln == l and s != -1))
    # drop the phantom but keep its slot unassigned by construction:
    # canonical assignment below never hands out its code
    return bits[1:], order


def _assign_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """symbol -> (code, length) from DHT (bits, vals)."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for l in range(1, 17):
        for _ in range(bits[l - 1]):
            out[vals[k]] = (code, l)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec

    def marker(self, m: int):
        self.flush()
        self.out += bytes((0xFF, m))  # markers are raw, never stuffed


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.b = data
        self.pos = pos  # byte position in the full stream
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.pos >= len(self.b):
                self.acc = (self.acc << 8) | 0
                self.n += 8
                continue
            byte = self.b[self.pos]
            if byte == 0xFF:
                nxt = self.b[self.pos + 1] if self.pos + 1 < len(self.b) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller resyncs via sync_restart()
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
                else:
                    # EOI or next segment: feed zero bits
                    self.acc = (self.acc << 8) | 0
                    self.n += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.n += 8

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.n -= k
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: Dict[Tuple[int, int], int]) -> int:
        code = 0
        for l in range(1, 17):
            code = (code << 1) | self.bits(1)
            if (code, l) in table:
                return table[(code, l)]
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self):
        """Drop buffered bits and skip the RSTn marker at the cursor."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.b):
            if self.b[self.pos] == 0xFF and 0xD0 <= self.b[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG restart marker")


def _magnitude(v: int) -> Tuple[int, int]:
    """JPEG magnitude coding: value -> (size, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

def _rgb_to_ycbcr(arr):
    import numpy as np

    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr):
    import numpy as np

    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _up2_h(p):
    """Horizontal 2× triangle (libjpeg "fancy") upsample: nearer
    sample weighted 3:1 against the neighbor — visibly better than
    replication on chroma edges and much closer to libjpeg output."""
    import numpy as np

    left = np.empty_like(p)
    left[:, 1:] = p[:, :-1]
    left[:, 0] = p[:, 0]
    right = np.empty_like(p)
    right[:, :-1] = p[:, 1:]
    right[:, -1] = p[:, -1]
    out = np.empty((p.shape[0], p.shape[1] * 2))
    out[:, 0::2] = (3.0 * p + left) / 4.0
    out[:, 1::2] = (3.0 * p + right) / 4.0
    return out


def _upsample(p, fy: int, fx: int):
    import numpy as np

    if fy == 2:
        p = _up2_h(p.T).T
    elif fy > 2:
        p = np.repeat(p, fy, axis=0)
    if fx == 2:
        p = _up2_h(p)
    elif fx > 2:
        p = np.repeat(p, fx, axis=1)
    return p


def _block_zz(plane, by, bx, A, qtab):
    import numpy as np

    blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
    coef = np.round((A @ blk @ A.T) / qtab).astype(np.int32)
    return [int(coef.flat[z]) for z in ZIGZAG]


def encode_jpeg(arr, quant: int = 1, subsample: bool = False,
                restart_every: int = 0) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w) gray uint8 array as baseline
    JFIF with a flat quantization table of ``quant`` (1 = near-
    lossless) and per-image canonical Huffman tables.

    ``subsample=True`` emits 4:2:0 (Y at 2×2, box-averaged chroma);
    ``restart_every=k`` emits a DRI segment and RSTn markers every k
    MCUs — both exist chiefly so the decoder's subsampling/restart
    paths are exercised by honest self-produced streams."""
    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
        sampling = [(1, 1)]
    else:
        planes = list(np.moveaxis(_rgb_to_ycbcr(arr), -1, 0))
        sampling = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    A = _dct_matrix()
    qtab = np.full((8, 8), float(quant))

    # pad every plane to the full MCU grid (edge replication), then
    # box-average the subsampled components down to their own grid
    grids = []
    for (hi, vi), p in zip(sampling, planes):
        fh, fw = mcuy * vmax * 8, mcux * hmax * 8
        p = np.pad(p, ((0, fh - h), (0, fw - w)), mode="edge")
        fy, fx = vmax // vi, hmax // hi
        if fy > 1 or fx > 1:
            p = p.reshape(fh // fy, fy, fw // fx, fx).mean(axis=(1, 3))
        grids.append(p)

    def scan_blocks():
        """Yield (mcu_index, comp_index, zigzag-coefficients) in the
        interleaved scan order the decoder expects."""
        for my in range(mcuy):
            for mx in range(mcux):
                mi = my * mcux + mx
                for ci, (hi, vi) in enumerate(sampling):
                    for by in range(vi):
                        for bx in range(hi):
                            yield mi, ci, _block_zz(
                                grids[ci], my * vi + by, mx * hi + bx, A, qtab
                            )

    # ---- pass 1: symbol statistics over the exact emission sequence --
    dc_freq = [dict(), dict()]
    ac_freq = [dict(), dict()]

    def symbols(zz, pred, t):
        size, _ = _magnitude(zz[0] - pred)
        dc_freq[t][size] = dc_freq[t].get(size, 0) + 1
        run = 0
        last = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last + 1):
            if zz[k] == 0:
                run += 1
                if run == 16:
                    ac_freq[t][0xF0] = ac_freq[t].get(0xF0, 0) + 1
                    run = 0
                continue
            s, _ = _magnitude(zz[k])
            ac_freq[t][(run << 4) | s] = ac_freq[t].get((run << 4) | s, 0) + 1
            run = 0
        if last < 63:
            ac_freq[t][0x00] = ac_freq[t].get(0x00, 0) + 1

    preds = [0] * len(planes)
    last_mi = -1
    for mi, ci, zz in scan_blocks():
        if restart_every and mi != last_mi and mi and mi % restart_every == 0:
            preds = [0] * len(planes)
        last_mi = mi
        symbols(zz, preds[ci], 0 if ci == 0 else 1)
        preds[ci] = zz[0]
    n_tables = 1 if gray else 2
    dc_tabs = [_build_canonical(dc_freq[t]) for t in range(n_tables)]
    ac_tabs = [_build_canonical(ac_freq[t]) for t in range(n_tables)]
    dc_codes = [_assign_codes(*t) for t in dc_tabs]
    ac_codes = [_assign_codes(*t) for t in ac_tabs]

    # ---- pass 2: entropy-coded data ----------------------------------
    bw = _BitWriter()
    preds = [0] * len(planes)
    last_mi = -1
    rst = 0
    for mi, ci, zz in scan_blocks():
        if restart_every and mi != last_mi and mi and mi % restart_every == 0:
            bw.marker(0xD0 + rst % 8)
            rst += 1
            preds = [0] * len(planes)
        last_mi = mi
        t = 0 if ci == 0 else min(1, n_tables - 1)
        size, mbits = _magnitude(zz[0] - preds[ci])
        preds[ci] = zz[0]
        c, l = dc_codes[t][size]
        bw.put(c, l)
        bw.put(mbits, size)
        run = 0
        last = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last + 1):
            if zz[k] == 0:
                run += 1
                if run == 16:
                    c, l = ac_codes[t][0xF0]
                    bw.put(c, l)
                    run = 0
                continue
            s, mb = _magnitude(zz[k])
            c, l = ac_codes[t][(run << 4) | s]
            bw.put(c, l)
            bw.put(mb, s)
            run = 0
        if last < 63:
            c, l = ac_codes[t][0x00]
            bw.put(c, l)
    bw.flush()

    # ---- container ----------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qz = bytes(max(1, min(255, int(qtab.flat[z]))) for z in ZIGZAG)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qz
    nf = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    for ci in range(nf):
        hi, vi = sampling[ci]
        out += struct.pack("BBB", ci + 1, (hi << 4) | vi, 0)
    for t in range(n_tables):
        for cls, (bits, vals) in ((0, dc_tabs[t]), (1, ac_tabs[t])):
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | t)
            out += bytes(bits) + bytes(vals)
    if restart_every:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_every)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    for ci in range(nf):
        t = 0 if ci == 0 else min(1, n_tables - 1)
        out += struct.pack("BB", ci + 1, (t << 4) | t)
    out += b"\x00\x3f\x00"  # Ss, Se, Ah/Al
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def decode_jpeg(payload: bytes):
    """Decode a JFIF/JPEG byte stream to an (h, w, 3) RGB (or
    (h, w, 1) gray) uint8 array. Baseline sequential (SOF0/1) and
    progressive (SOF2: spectral selection + successive approximation,
    DC/AC first and refinement scans, EOB runs) both decode natively;
    arithmetic-coded, hierarchical, lossless, and 12-bit modes raise."""
    import numpy as np

    b = bytes(payload or b"")
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG byte stream")
    pos = 2
    qtabs: Dict[int, List[int]] = {}
    huff: Dict[Tuple[int, int], Dict[Tuple[int, int], int]] = {}
    frame = None
    progressive = False
    restart_interval = 0
    prog = None  # progressive coefficient state
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if 0xD0 <= marker <= 0xD7:  # stray RSTn between scans
            continue
        (ln,) = struct.unpack(">H", b[pos:pos + 2])
        seg = b[pos + 2:pos + ln]
        if marker == 0xDB:  # DQT
            sp = 0
            while sp < len(seg):
                pq, tq = seg[sp] >> 4, seg[sp] & 0x0F
                sp += 1
                if pq:
                    vals = [struct.unpack(">H", seg[sp + 2 * i:sp + 2 * i + 2])[0]
                            for i in range(64)]
                    sp += 128
                else:
                    vals = list(seg[sp:sp + 64])
                    sp += 64
                qtabs[tq] = vals
        elif marker == 0xC4:  # DHT
            sp = 0
            while sp < len(seg):
                cls, tid = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1:sp + 17])
                n = sum(bits)
                vals = list(seg[sp + 17:sp + 17 + n])
                codes = _assign_codes(bits, vals)
                huff[(cls, tid)] = {(c, l): s for s, (c, l) in codes.items()}
                sp += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, fh, fw, nf = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for i in range(nf):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic/hierarchical/lossless JPEG unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 0x0F))
            if not progressive:
                return _decode_scan(
                    b, pos + ln, frame, scan, qtabs, huff, restart_interval)
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            if prog is None:
                prog = _ProgState(frame)
            pos = _decode_progressive_scan(
                b, pos + ln, frame, scan, (ss, se, ahal >> 4, ahal & 0x0F),
                huff, restart_interval, prog)
            continue
        pos += ln
    if prog is not None:
        return prog.finish(qtabs)
    raise ValueError("JPEG has no scan data")


class _ProgState:
    """Per-component dequantized-domain coefficient accumulators for a
    progressive frame, sized to the interleaved MCU grid."""

    def __init__(self, frame):
        import numpy as np

        fh, fw, comps = frame
        if any(c[1] not in (1, 2) or c[2] not in (1, 2) for c in comps):
            raise NotImplementedError("JPEG sampling factors beyond 2")
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcux = -(-fw // (8 * self.hmax))
        self.mcuy = -(-fh // (8 * self.vmax))
        self.coefs = {}
        self.preds = {}
        self.eobrun = 0
        for cid, hi, vi, _tq in comps:
            self.coefs[cid] = np.zeros(
                (self.mcuy * vi, self.mcux * hi, 64), dtype=np.int32)
            self.preds[cid] = 0
        # non-interleaved scan grids: the component's OWN block counts
        self.nblocks = {}
        for cid, hi, vi, _tq in comps:
            cw = -(-(fw * hi) // (8 * self.hmax))
            ch = -(-(fh * vi) // (8 * self.vmax))
            self.nblocks[cid] = (ch, cw)

    def finish(self, qtabs):
        import numpy as np

        fh, fw, comps = self.frame
        A = _dct_matrix()
        planes = []
        for cid, hi, vi, tq in comps:
            q = np.zeros(64)
            for i, z in enumerate(ZIGZAG):
                q[z] = qtabs[tq][i]
            c = self.coefs[cid]
            by, bx = c.shape[:2]
            dez = np.zeros((by, bx, 64))
            for i, z in enumerate(ZIGZAG):
                dez[..., z] = c[..., i]
            dez *= q
            blocks = dez.reshape(by, bx, 8, 8)
            # straightforward per-block IDCT (clarity over speed)
            plane = np.zeros((by * 8, bx * 8))
            for yy in range(by):
                for xx in range(bx):
                    plane[yy * 8:yy * 8 + 8, xx * 8:xx * 8 + 8] = (
                        A.T @ blocks[yy, xx] @ A + 128.0)
            planes.append(plane)
        full = []
        for (cid, hi, vi, _tq), p in zip(comps, planes):
            p = _upsample(p, self.vmax // vi, self.hmax // hi)
            full.append(p[:fh, :fw])
        if len(full) == 1:
            return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[..., None]
        return _ycbcr_to_rgb(full[0], full[1], full[2])


def _decode_progressive_scan(b, pos, frame, scan, spec, huff,
                             restart_interval, prog):
    """One SOS of a progressive frame; returns the stream position of
    the next marker segment."""
    ss, se, ah, al = spec
    fh, fw, comps = frame
    comp_by_cid = {c[0]: c for c in comps}
    br = _BitReader(b, pos)
    for cid, *_ in ((s[0],) for s in scan):
        prog.preds[cid] = 0
    prog.eobrun = 0

    def refine_one(coef_block, k):
        """Correction bit for an already-nonzero coefficient."""
        if br.bits(1):
            v = coef_block[k]
            if v > 0 and not (v & (1 << al)):
                coef_block[k] = v + (1 << al)
            elif v < 0 and not (-v & (1 << al)):
                coef_block[k] = v - (1 << al)

    def decode_block_dc(cid, by, bx, td):
        coef = prog.coefs[cid][by, bx]
        if ah == 0:
            size = br.huff(huff[(0, td)])
            diff = _extend(br.bits(size), size)
            prog.preds[cid] += diff
            coef[0] = prog.preds[cid] << al
        else:
            if br.bits(1):
                coef[0] |= 1 << al

    def decode_block_ac(cid, by, bx, ta):
        coef = prog.coefs[cid][by, bx]
        act = huff[(1, ta)]
        if ah == 0:  # AC first scan
            if prog.eobrun > 0:
                prog.eobrun -= 1
                return
            k = ss
            while k <= se:
                sym = br.huff(act)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    prog.eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                    return
                k += r
                if k > se:
                    raise ValueError("JPEG AC run overflow")
                coef[k] = _extend(br.bits(s), s) << al
                k += 1
        else:  # AC refinement scan
            k = ss
            if prog.eobrun > 0:
                prog.eobrun -= 1
                while k <= se:
                    if coef[k]:
                        refine_one(coef, k)
                    k += 1
                return
            while k <= se:
                sym = br.huff(act)
                r, s = sym >> 4, sym & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        prog.eobrun = (1 << r) - 1 + (br.bits(r) if r else 0)
                        while k <= se:
                            if coef[k]:
                                refine_one(coef, k)
                            k += 1
                        return
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError("JPEG AC refine size != 1")
                    newval = (1 << al) if br.bits(1) else -(1 << al)
                while k <= se:
                    if coef[k]:
                        refine_one(coef, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    coef[k] = newval
                k += 1

    interleaved = len(scan) > 1
    unit = 0
    if interleaved:
        if ss != 0:
            raise ValueError("JPEG interleaved AC scan")
        for my in range(prog.mcuy):
            for mx in range(prog.mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    br.sync_restart()
                    for s in scan:
                        prog.preds[s[0]] = 0
                    prog.eobrun = 0
                for cid, td, _ta in scan:
                    _c, hi, vi, _tq = comp_by_cid[cid]
                    for by in range(vi):
                        for bx in range(hi):
                            decode_block_dc(cid, my * vi + by, mx * hi + bx, td)
                unit += 1
    else:
        cid, td, ta = scan[0]
        nby, nbx = prog.nblocks[cid]
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and unit and unit % restart_interval == 0:
                    br.sync_restart()
                    prog.preds[cid] = 0
                    prog.eobrun = 0
                if ss == 0:
                    decode_block_dc(cid, by, bx, td)
                    if se != 0:
                        raise ValueError("JPEG DC scan with Se != 0")
                else:
                    decode_block_ac(cid, by, bx, ta)
                unit += 1

    # hand back the byte position of the next marker: skip stuffed
    # bytes / restarts the reader may not have consumed
    p = br.pos
    while p + 1 < len(b):
        if b[p] == 0xFF and b[p + 1] != 0x00 and not (0xD0 <= b[p + 1] <= 0xD7):
            return p
        p += 1
    return len(b)


def _decode_scan(b, pos, frame, scan, qtabs, huff, restart_interval):
    import numpy as np

    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if any(c[1] not in (1, 2) or c[2] not in (1, 2) for c in comps):
        raise NotImplementedError("JPEG sampling factors beyond 2 unsupported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    A = _dct_matrix()
    planes = []
    for cid, ch, cv, tq in comps:
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8)))
    scan_by_cid = {s[0]: s for s in scan}
    br = _BitReader(b, pos)
    preds = {cid: 0 for cid, *_ in comps}
    mcu_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.sync_restart()
                preds = {cid: 0 for cid, *_ in comps}
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                _, td, ta = scan_by_cid[cid]
                dct = huff[(0, td)]
                act = huff[(1, ta)]
                q = qtabs[tq]
                for by in range(cv):
                    for bx in range(ch):
                        zz = [0] * 64
                        size = br.huff(dct)
                        diff = _extend(br.bits(size), size)
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = br.huff(act)
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            s = sym & 0x0F
                            zz[k] = _extend(br.bits(s), s)
                            k += 1
                        coef = np.zeros(64)
                        for i, z in enumerate(ZIGZAG):
                            coef[z] = zz[i] * q[i]
                        blk = A.T @ coef.reshape(8, 8) @ A + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
            mcu_i += 1
    # upsample to full size (triangle filter for 2x factors), crop
    full = []
    for (cid, ch, cv, tq), p in zip(comps, planes):
        p = _upsample(p, vmax // cv, hmax // ch)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)[..., None]
    return _ycbcr_to_rgb(full[0], full[1], full[2])
