"""Pure-stdlib MPEG-audio (MP3) frame-header walk.

Like the ISO-BMFF sample walk, this is the container-level truth an
audio pipeline needs before any DSP: where the frames are, their
bitrate/sample-rate, how many PCM samples the stream carries. All of
that is header arithmetic (ISO/IEC 11172-3 §2.4.1) — implemented here
for real, with ID3v2 tag skipping and bounded resync over garbage.
Huffman/IMDCT decode of the frame payloads genuinely needs a DSP
decoder and stays honestly out of scope (decode_image-style contract:
raise, never fake).

``build_mp3`` is the writer twin for tests/oracles: it emits a valid
ID3v2 tag plus Layer-III frame headers whose length formula
(144·bitrate/sample_rate + padding) the walker must reproduce exactly.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

# MPEG1 Layer III bitrates (kbps), index 1..14; 0 = free, 15 = bad
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                   256, 320]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                   160]
_RATES = {3: [44100, 48000, 32000],   # MPEG1
          2: [22050, 24000, 16000],   # MPEG2
          0: [11025, 12000, 8000]}    # MPEG2.5


def _id3v2_size(b: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none)."""
    if len(b) < 10 or b[:3] != b"ID3":
        return 0
    sz = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | \
         ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
    return 10 + sz


def _parse_header(b: bytes, pos: int) -> Optional[Tuple[int, int, int]]:
    """(frame_size, samples_per_frame, sample_rate) or None."""
    if pos + 4 > len(b):
        return None
    h = struct.unpack(">I", b[pos:pos + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 0x3      # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (h >> 17) & 0x3        # 1 = Layer III
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    padding = (h >> 9) & 0x1
    if version == 1 or layer != 1 or br_idx in (0, 15) or sr_idx == 3:
        return None
    rate = _RATES[version][sr_idx]
    kbps = (_BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3)[br_idx]
    spf = 1152 if version == 3 else 576
    size = (spf // 8) * kbps * 1000 // rate + padding
    if size < 4:
        return None
    return size, spf, rate


def mp3_frames(payload: bytes, max_resync: int = 1 << 16
               ) -> List[Tuple[int, int, int, int]]:
    """Walk the stream: list of (offset, size, samples, sample_rate)
    per frame. Skips a leading ID3v2 tag; resyncs over up to
    ``max_resync`` bytes of garbage between frames (damaged crawls)."""
    b = bytes(payload or b"")
    pos = _id3v2_size(b)
    out: List[Tuple[int, int, int, int]] = []
    slack = max_resync
    while pos + 4 <= len(b):
        got = _parse_header(b, pos)
        if got is None:
            if not out:
                pos += 1  # still hunting for the first sync
                slack -= 1
                if slack <= 0:
                    break
                continue
            nxt = b.find(b"\xff", pos, pos + max_resync)
            if nxt < 0:
                break
            pos = nxt if nxt > pos else pos + 1
            continue
        size, spf, rate = got
        if pos + size > len(b):
            break  # truncated final frame: not counted
        out.append((pos, size, spf, rate))
        pos += size
    if not out:
        raise ValueError("no MPEG audio frames found")
    return out


def audio_stream_info(payload: bytes) -> dict:
    """Exact-integer stream facts from the frame walk."""
    frames = mp3_frames(payload)
    rates = {f[3] for f in frames}
    return {
        "n_frames": len(frames),
        "total_samples": sum(f[2] for f in frames),
        "sample_rate": frames[0][3],
        "vbr": len({f[1] for f in frames}) > 1,
        "stream_bytes": sum(f[1] for f in frames),
        "mixed_rates": len(rates) > 1,
    }


def build_mp3(frame_bitrate_indexes: List[int], filler: bytes = b"\x00",
              id3_payload: bytes = b"", sample_rate_idx: int = 0) -> bytes:
    """Writer twin: MPEG1 Layer III headers (no CRC, no padding) with
    the given bitrate indexes (1..14); frame bodies are ``filler``
    repeated. Prepends an ID3v2 tag around ``id3_payload``."""
    rate = _RATES[3][sample_rate_idx]
    out = bytearray()
    if id3_payload or True:
        sz = len(id3_payload)
        out += (b"ID3" + bytes([4, 0, 0]) +
                bytes([(sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                       (sz >> 7) & 0x7F, sz & 0x7F]) + id3_payload)
    for idx in frame_bitrate_indexes:
        if not 1 <= idx <= 14:
            raise ValueError("bitrate index out of range")
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (idx << 12) | (sample_rate_idx << 10) | (0 << 9) | (0 << 8) \
            | (0 << 6) | (0 << 4) | (0 << 3) | (0 << 2) | 0
        size = 144 * _BITRATES_V1_L3[idx] * 1000 // rate
        body = (filler * size)[: size - 4]
        out += struct.pack(">I", h) + body
    return bytes(out)
