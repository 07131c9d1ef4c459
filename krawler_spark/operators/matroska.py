"""Pure-stdlib Matroska/WebM (EBML) container walk.

The WebM twin of ``isobmff``: resolve which byte ranges of a crawled
.webm payload are video frames — pure container structure (EBML
element tree → Segment → Tracks → video TrackNumber → Cluster →
SimpleBlock), no codec. VP8/VP9/AV1 pixel decode of the block payloads
genuinely needs a video codec absent here and stays honestly stubbed.

``build_webm`` is the writer twin: a minimal valid
EBML-header/Segment/Info/Tracks/Cluster document whose SimpleBlock
payloads round-trip bit-exactly through ``video_blocks``.
"""

from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

# element ids (with marker bits, as they appear on the wire)
EBML = 0x1A45DFA3
SEGMENT = 0x18538067
INFO = 0x1549A966
TIMECODE_SCALE = 0x2AD7B1
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
CLUSTER = 0x1F43B675
CLUSTER_TIMECODE = 0xE7
SIMPLE_BLOCK = 0xA3
DOCTYPE = 0x4282

_CONTAINERS = {SEGMENT, TRACKS, TRACK_ENTRY, CLUSTER}


def _read_vint(b: bytes, pos: int, keep_marker: bool) -> Tuple[int, int]:
    """(value, bytes consumed); EBML variable-width integer."""
    if pos >= len(b):
        raise ValueError("ebml: truncated vint")
    first = b[pos]
    if first == 0:
        raise ValueError("ebml: invalid vint")
    length = 9 - first.bit_length()
    if pos + length > len(b):
        raise ValueError("ebml: truncated vint body")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | b[pos + i]
    return val, length


def _elements(b: bytes, start: int, end: int) -> Iterator[Tuple[int, int, int]]:
    """Yield (id, payload_start, payload_end)."""
    pos = start
    while pos < end:
        eid, n1 = _read_vint(b, pos, keep_marker=True)
        size, n2 = _read_vint(b, pos + n1, keep_marker=False)
        ps = pos + n1 + n2
        if size == (1 << (7 * n2)) - 1:
            # size vint of all ones = UNKNOWN SIZE — routine on
            # live/stream-muxed WebM (Segment and Cluster written before
            # their length is known). Per spec the element runs to the
            # first non-child; for extraction "to end of parent" is
            # equivalent (a following Cluster parses as a nested master
            # and its SimpleBlocks are still walked) — the same policy
            # isobmff applies to size==0 boxes.
            if eid not in (SEGMENT, CLUSTER):
                raise ValueError("ebml: unknown-size non-master element")
            yield eid, ps, end
            return
        if ps + size > end:
            raise ValueError("ebml: element overruns parent")
        yield eid, ps, ps + size
        pos = ps + size


def _uint(b: bytes, s: int, e: int) -> int:
    v = 0
    for i in range(s, e):
        v = (v << 8) | b[i]
    return v


def is_webm(payload: bytes) -> bool:
    b = bytes(payload or b"")
    return len(b) >= 4 and b[:4] == b"\x1a\x45\xdf\xa3"


def video_blocks(payload: bytes) -> List[Tuple[int, int]]:
    """Absolute (offset, size) of every video SimpleBlock payload (the
    coded frame bytes after the block's track/timecode/flags header)."""
    b = bytes(payload or b"")
    if not is_webm(b):
        raise ValueError("not an EBML (webm/mkv) byte stream")
    video_track: Optional[int] = None
    out: List[Tuple[int, int]] = []

    def walk(start: int, end: int) -> None:
        nonlocal video_track
        for eid, s, e in _elements(b, start, end):
            if eid in (SEGMENT, TRACKS, CLUSTER):
                walk(s, e)
            elif eid == TRACK_ENTRY:
                num = typ = None
                for ceid, cs, ce in _elements(b, s, e):
                    if ceid == TRACK_NUMBER:
                        num = _uint(b, cs, ce)
                    elif ceid == TRACK_TYPE:
                        typ = _uint(b, cs, ce)
                if typ == 1 and num is not None and video_track is None:
                    video_track = num
            elif eid == SIMPLE_BLOCK:
                track, n = _read_vint(b, s, keep_marker=False)
                hdr = n + 3  # + s16 relative timecode + flags byte
                if s + hdr > e:
                    raise ValueError("ebml: truncated SimpleBlock")
                flags = b[s + n + 2]
                if flags & 0x06:
                    raise NotImplementedError("ebml: laced SimpleBlock")
                if video_track is not None and track == video_track:
                    out.append((s + hdr, e - (s + hdr)))

    walk(0, len(b))
    if video_track is None:
        raise ValueError("webm: no video track")
    return out


def extract_blocks(payload: bytes) -> List[bytes]:
    b = bytes(payload or b"")
    return [b[o:o + s] for o, s in video_blocks(b)]


# --------------------------------------------------------------------------
# writer twin
# --------------------------------------------------------------------------


def _enc_vint_id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _enc_vint_size(size: int) -> bytes:
    for length in range(1, 9):
        if size < (1 << (7 * length)) - 1:
            return ((1 << (8 - length)) << (8 * (length - 1)) | size).to_bytes(
                length, "big")
    raise ValueError("ebml: size too large")


def _el(eid: int, payload: bytes) -> bytes:
    return _enc_vint_id(eid) + _enc_vint_size(len(payload)) + payload


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def build_webm(frames: List[bytes], track_number: int = 1,
               codec_id: bytes = b"V_VP8") -> bytes:
    """Minimal valid WebM: one video track, one Cluster, one
    SimpleBlock per frame (keyframe flag set, no lacing)."""
    if not frames:
        raise ValueError("no frames")
    header = _el(EBML, _el(DOCTYPE, b"webm") +
                 _el_uint(0x4286, 1) + _el_uint(0x42F7, 1))  # version/readver
    info = _el(INFO, _el_uint(TIMECODE_SCALE, 1_000_000))
    entry = _el(TRACK_ENTRY,
                _el_uint(TRACK_NUMBER, track_number) +
                _el_uint(0x73C5, track_number) +  # TrackUID
                _el_uint(TRACK_TYPE, 1) +
                _el(CODEC_ID, codec_id))
    tracks = _el(TRACKS, entry)
    blocks = b"".join(
        _el(SIMPLE_BLOCK,
            _enc_vint_size(track_number) + struct.pack(">hB", i, 0x80) + fr)
        for i, fr in enumerate(frames))
    cluster = _el(CLUSTER, _el_uint(CLUSTER_TIMECODE, 0) + blocks)
    return header + _el(SEGMENT, info + tracks + cluster)
