"""Pure-stdlib ISO-BMFF (MP4) container walk for video sample extraction.

A training-data pipeline over crawled video needs frame/sample access
long before it needs a H.264/AV1 decoder: which byte ranges are video
samples, how many there are, their timing. That part is pure container
structure (ISO/IEC 14496-12) and is implemented here for real:
``video_samples`` walks moov → trak(vide) → stbl and resolves the
sample-to-chunk (stsc), sample-size (stsz), and chunk-offset
(stco/co64) tables into absolute byte ranges; ``extract_samples``
slices them out of the payload. Decoding those samples to pixels
genuinely needs a video codec absent from this container — the
sampling pipeline ships the raw sample bytes and leaves pixel decode
honestly stubbed (multimodal.sample_frames docstring).

``build_mp4`` is the writer twin used by tests and the contract-query
oracle: it assembles a minimal valid single-track MP4 (ftyp/mdat/moov
with a full stbl) whose samples round-trip bit-exactly.

Reference parity note: the reference crawler (brianmadden/krawler) has
no media pipeline; this belongs to the beyond-reference training-data
surface.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple


def _boxes(b: bytes, start: int, end: int) -> Iterator[Tuple[bytes, int, int]]:
    """Yield (type, payload_start, payload_end) for each box in range."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", b[pos:pos + 4])
        typ = b[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated largesize box")
            (size,) = struct.unpack(">Q", b[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:  # box extends to end of enclosing container
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("mp4: bad box size")
        yield typ, pos + hdr, pos + size
        pos += size


def _find(b: bytes, start: int, end: int, path: List[bytes]) -> Optional[Tuple[int, int]]:
    if not path:
        return start, end
    for typ, s, e in _boxes(b, start, end):
        if typ == path[0]:
            got = _find(b, s, e, path[1:])
            if got is not None:
                return got
    return None


def _full(b: bytes, s: int) -> int:
    """Skip a FullBox version/flags word; returns payload start."""
    return s + 4


def is_mp4(payload: bytes) -> bool:
    b = bytes(payload or b"")
    return len(b) >= 12 and b[4:8] == b"ftyp"


def video_samples(payload: bytes) -> List[Tuple[int, int]]:
    """Absolute (offset, size) of every sample in the first video
    track, resolved from stsc × stsz × stco/co64."""
    b = bytes(payload or b"")
    if not is_mp4(b):
        raise ValueError("not an ISO-BMFF (mp4) byte stream")
    moov = _find(b, 0, len(b), [b"moov"])
    if moov is None:
        raise ValueError("mp4: no moov box")
    for typ, ts, te in _boxes(b, *moov):
        if typ != b"trak":
            continue
        hd = _find(b, ts, te, [b"mdia", b"hdlr"])
        if hd is None:
            continue
        handler = b[_full(b, hd[0]) + 4:_full(b, hd[0]) + 8]
        if handler != b"vide":
            continue
        stbl = _find(b, ts, te, [b"mdia", b"minf", b"stbl"])
        if stbl is None:
            raise ValueError("mp4: video trak without stbl")
        stsz = stsc = stco = None
        co64 = False
        for btyp, s, e in _boxes(b, *stbl):
            if btyp == b"stsz":
                p = _full(b, s)
                uniform, count = struct.unpack(">II", b[p:p + 8])
                if uniform:
                    stsz = [uniform] * count
                else:
                    stsz = list(struct.unpack(f">{count}I", b[p + 8:p + 8 + 4 * count]))
            elif btyp == b"stsc":
                p = _full(b, s)
                (count,) = struct.unpack(">I", b[p:p + 4])
                stsc = [struct.unpack(">III", b[p + 4 + 12 * i:p + 16 + 12 * i])
                        for i in range(count)]
            elif btyp in (b"stco", b"co64"):
                p = _full(b, s)
                (count,) = struct.unpack(">I", b[p:p + 4])
                fmt = ">%d%s" % (count, "Q" if btyp == b"co64" else "I")
                width = 8 if btyp == b"co64" else 4
                stco = list(struct.unpack(fmt, b[p + 4:p + 4 + width * count]))
                co64 = btyp == b"co64"
        _ = co64
        if stsz is None or stsc is None or stco is None:
            raise ValueError("mp4: incomplete sample tables")
        out: List[Tuple[int, int]] = []
        si = 0
        for ci, chunk_off in enumerate(stco):
            per = 0
            for first, n, _sdi in stsc:
                if ci + 1 >= first:
                    per = n
                else:
                    break
            off = chunk_off
            for _ in range(per):
                if si >= len(stsz):
                    break
                out.append((off, stsz[si]))
                off += stsz[si]
                si += 1
        if si != len(stsz):
            raise ValueError("mp4: sample tables disagree on sample count")
        return out
    raise ValueError("mp4: no video track")


def extract_samples(payload: bytes) -> List[bytes]:
    b = bytes(payload or b"")
    out = []
    for off, size in video_samples(b):
        if off + size > len(b):
            raise ValueError("mp4: sample range outside file")
        out.append(b[off:off + size])
    return out


# --------------------------------------------------------------------------
# AVIF / HEIF still images (meta-box item model)
# --------------------------------------------------------------------------


def is_avif(payload: bytes) -> bool:
    b = bytes(payload or b"")
    if len(b) < 16 or b[4:8] != b"ftyp":
        return False
    (size,) = struct.unpack(">I", b[:4])
    brands = {b[8:12]} | {b[i:i + 4] for i in range(16, min(size, len(b)), 4)}
    return b"avif" in brands or b"avis" in brands or b"heic" in brands


def avif_info(payload: bytes) -> dict:
    """Resolve an AVIF/HEIF still's primary item: its type, pixel
    dimensions (ispe property — real metadata, no decode), and the
    absolute byte extents of its coded data (iloc). AV1 pixel decode of
    those extents genuinely needs libaom/libdav1d and stays honestly
    out of scope."""
    b = bytes(payload or b"")
    if not is_avif(b):
        raise ValueError("not an AVIF/HEIF byte stream")
    meta = _find(b, 0, len(b), [b"meta"])
    if meta is None:
        raise ValueError("avif: no meta box")
    ms, me = _full(b, meta[0]), meta[1]  # meta is a FullBox

    primary = None
    item_types = {}
    extents = {}
    width = height = None
    ipco_props: list = []   # ipco children in order (ipma indexes are 1-based)
    ipma_assoc: dict = {}   # item_id -> [property indices]
    for typ, s, e in _boxes(b, ms, me):
        if typ == b"pitm":
            ver = b[s]
            p = _full(b, s)
            primary = struct.unpack(
                ">I" if ver else ">H", b[p:p + (4 if ver else 2)])[0]
        elif typ == b"iinf":
            ver = b[s]
            p = _full(b, s)
            n, p = (struct.unpack(">H", b[p:p + 2])[0], p + 2) if ver == 0 \
                else (struct.unpack(">I", b[p:p + 4])[0], p + 4)
            for ityp, is_, ie in _boxes(b, p, e):
                if ityp != b"infe":
                    continue
                iver = b[is_]
                q = _full(b, is_)
                if iver >= 2:
                    iid = struct.unpack(
                        ">I" if iver == 3 else ">H",
                        b[q:q + (4 if iver == 3 else 2)])[0]
                    q += 4 if iver == 3 else 2
                    q += 2  # protection index
                    item_types[iid] = b[q:q + 4]
        elif typ == b"iloc":
            ver = b[s]
            p = _full(b, s)
            sizes = struct.unpack(">H", b[p:p + 2])[0]
            offset_size = (sizes >> 12) & 0xF
            length_size = (sizes >> 8) & 0xF
            base_size = (sizes >> 4) & 0xF
            index_size = sizes & 0xF if ver in (1, 2) else 0
            p += 2
            if ver < 2:
                count = struct.unpack(">H", b[p:p + 2])[0]
                p += 2
            else:
                count = struct.unpack(">I", b[p:p + 4])[0]
                p += 4

            def read_n(pp, n):
                return (0, pp) if n == 0 else (
                    int.from_bytes(b[pp:pp + n], "big"), pp + n)

            for _ in range(count):
                if ver < 2:
                    iid = struct.unpack(">H", b[p:p + 2])[0]
                    p += 2
                else:
                    iid = struct.unpack(">I", b[p:p + 4])[0]
                    p += 4
                method = 0
                if ver in (1, 2):
                    method = struct.unpack(">H", b[p:p + 2])[0] & 0xF
                    p += 2
                p += 2  # data_reference_index
                base, p = read_n(p, base_size)
                (ecount,) = struct.unpack(">H", b[p:p + 2])
                p += 2
                exts = []
                for _e in range(ecount):
                    _idx, p = read_n(p, index_size)
                    off, p = read_n(p, offset_size)
                    ln, p = read_n(p, length_size)
                    exts.append((base + off, ln))
                if method == 0:
                    extents[iid] = exts
        elif typ == b"iprp":
            for ptyp, ps, pe in _boxes(b, s, e):
                if ptyp == b"ipco":
                    ipco_props = list(_boxes(b, ps, pe))
                elif ptyp == b"ipma":
                    ver = b[ps]
                    flags = int.from_bytes(b[ps + 1:ps + 4], "big")
                    q = _full(b, ps)
                    (n_assoc,) = struct.unpack(">I", b[q:q + 4])
                    q += 4
                    for _ in range(n_assoc):
                        if ver < 1:
                            iid = struct.unpack(">H", b[q:q + 2])[0]
                            q += 2
                        else:
                            iid = struct.unpack(">I", b[q:q + 4])[0]
                            q += 4
                        cnt = b[q]
                        q += 1
                        idxs = []
                        for _a in range(cnt):
                            if flags & 1:
                                v = struct.unpack(">H", b[q:q + 2])[0]
                                q += 2
                                idxs.append(v & 0x7FFF)  # drop essential bit
                            else:
                                idxs.append(b[q] & 0x7F)
                                q += 1
                        ipma_assoc[iid] = idxs
    if primary is None or primary not in extents:
        raise ValueError("avif: primary item unresolved")

    # dimensions = the ispe ASSOCIATED with the primary item (ipma →
    # 1-based ipco index). Multi-item HEIC/AVIF (thumbnail/grid items)
    # carries several ispes — first-in-ipco can belong to a different
    # item, so that is only the fallback when ipma is absent/unresolved.
    def _ispe_dims(cs: int):
        q = _full(b, cs)
        return struct.unpack(">II", b[q:q + 8])

    for idx in ipma_assoc.get(primary, []):
        if 1 <= idx <= len(ipco_props) and ipco_props[idx - 1][0] == b"ispe":
            width, height = _ispe_dims(ipco_props[idx - 1][1])
            break
    if width is None:
        for ctyp, cs, _ce in ipco_props:
            if ctyp == b"ispe":
                width, height = _ispe_dims(cs)
                break
    for off, ln in extents[primary]:
        if off + ln > len(b):
            raise ValueError("avif: extent outside file")
    return {
        "primary_item": primary,
        "item_type": item_types.get(primary, b"").decode("ascii", "replace"),
        "width": width,
        "height": height,
        "extents": extents[primary],
    }


def extract_avif_item(payload: bytes) -> bytes:
    b = bytes(payload or b"")
    info = avif_info(b)
    return b"".join(b[o:o + ln] for o, ln in info["extents"])


def build_avif(av1_payload: bytes, width: int, height: int) -> bytes:
    """Writer twin: minimal AVIF container around a coded payload."""
    ftyp = _box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1")
    hdlr = _fullbox(b"hdlr", struct.pack(">I", 0) + b"pict" + b"\x00" * 13)
    pitm = _fullbox(b"pitm", struct.pack(">H", 1))
    infe = _fullbox(b"infe", struct.pack(">HH", 1, 0) + b"av01" + b"\x00",
                    version=2)
    iinf = _fullbox(b"iinf", struct.pack(">H", 1) + infe)
    ispe = _fullbox(b"ispe", struct.pack(">II", width, height))
    ipco = _box(b"ipco", ispe)
    ipma = _fullbox(b"ipma", struct.pack(">I", 1) +
                    struct.pack(">HB", 1, 1) + bytes([0x81]))
    iprp = _box(b"iprp", ipco + ipma)
    # iloc with 4-byte offsets/lengths; offset patched after sizing
    def iloc_with(offset: int) -> bytes:
        return _fullbox(b"iloc", struct.pack(">H", 0x4400) +
                        struct.pack(">H", 1) +
                        struct.pack(">HH", 1, 0) +
                        struct.pack(">H", 1) +
                        struct.pack(">II", offset, len(av1_payload)))
    meta_for = lambda off: _fullbox(  # noqa: E731
        b"meta", hdlr + pitm + iinf + iprp + iloc_with(off))
    probe = ftyp + meta_for(0)
    mdat_off = len(probe) + 8
    return ftyp + meta_for(mdat_off) + _box(b"mdat", av1_payload)


# --------------------------------------------------------------------------
# writer twin (tests / oracle fixtures)
# --------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _fullbox(typ: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def build_mp4(samples: List[bytes], samples_per_chunk: int = 2,
              timescale: int = 1000, sample_delta: int = 40) -> bytes:
    """Minimal valid single-video-track MP4 whose mdat carries
    ``samples`` split into chunks of ``samples_per_chunk``. The stsd
    entry is an "mp4v" visual sample description with no codec config —
    enough for any container-level reader; pixel decode of the samples
    is out of scope by design."""
    if not samples:
        raise ValueError("no samples")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    mdat_base = len(ftyp) + 8

    n = len(samples)
    chunks = [samples[i:i + samples_per_chunk]
              for i in range(0, n, samples_per_chunk)]
    offsets = []
    off = mdat_base
    for ch in chunks:
        offsets.append(off)
        off += sum(len(s) for s in ch)

    stsd_entry = (
        struct.pack(">6xH", 1)                       # reserved, data_ref_index
        + struct.pack(">HHIII", 0, 0, 0, 0, 0)       # predefined/reserved
        + struct.pack(">HH", 64, 64)                 # width, height
        + struct.pack(">II", 0x00480000, 0x00480000)  # dpi
        + struct.pack(">IH", 0, 1)                   # reserved, frame_count
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1)                 # depth, pre_defined
    )
    stsd = _fullbox(b"stsd", struct.pack(">I", 1)
                    + _box(b"mp4v", stsd_entry))
    stts = _fullbox(b"stts", struct.pack(">III", 1, n, sample_delta))
    stsc_entries = []
    prev = None
    for ci, ch in enumerate(chunks):
        if prev != len(ch):
            stsc_entries.append((ci + 1, len(ch), 1))
            prev = len(ch)
    stsc = _fullbox(b"stsc", struct.pack(">I", len(stsc_entries)) +
                    b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stsz = _fullbox(b"stsz", struct.pack(">II", 0, n) +
                    b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _fullbox(b"stco", struct.pack(">I", len(offsets)) +
                    b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    dref = _fullbox(b"dref", struct.pack(">I", 1) +
                    _fullbox(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)
    vmhd = _fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _fullbox(b"hdlr", struct.pack(">I", 0) + b"vide" +
                    b"\x00" * 12 + b"krawl\x00")
    duration = n * sample_delta
    mdhd = _fullbox(b"mdhd", struct.pack(">IIIIHH", 0, 0, timescale,
                                         duration, 0x55C4, 0))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _fullbox(b"tkhd", struct.pack(">IIII4xII8x", 0, 0, 1, 0, 0, 0) +
                    struct.pack(">HHHH", 0, 0, 0, 0) +
                    struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                0x40000000) +
                    struct.pack(">II", 64 << 16, 64 << 16), flags=7)
    mvhd = _fullbox(b"mvhd", struct.pack(">IIII", 0, 0, timescale, duration) +
                    struct.pack(">IH10x", 0x10000, 0x0100) +
                    struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                0x40000000) +
                    struct.pack(">6I", 0, 0, 0, 0, 0, 0) +
                    struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))
    return ftyp + mdat + moov
