"""Recover the VP8L 2D plane-code table from the system libwebp.

The WebP lossless spec maps LZ77 distance prefix-values 1..120 to 2D
neighbor offsets via a fixed 120-entry table. No network and no
libwebp *source* exist in this sandbox, but the compiled library does —
so derive the table behaviorally: for each plane code P, emit a crafted
VP8L stream whose pixel at a known index is a length-1 backward
reference with prefix-value P, decode it with libwebp via ctypes, and
identify which earlier pixel got copied (every earlier pixel carries a
unique id in its green/red channels). distance = id_at(target) -
id_of(source); entry byte = (dy << 4) | (8 - dx) with distance =
dy * xsize + dx.

Prints the 120-entry python literal for webpcodec._PLANE_CODES.
"""

from __future__ import annotations

import ctypes
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krawler_spark.operators.webpcodec import (  # noqa: E402
    _BitWriter, _value_to_prefix, _write_channel_code,
)

W, H = 64, 10
TARGET = 8 * W + 32  # current pixel for the backref


def probe_stream(plane_value: int) -> bytes:
    """VP8L stream: literals with unique ids, one len-1 backref with
    distance prefix-value `plane_value` at index TARGET."""
    bw = _BitWriter()
    bw.write_bits(0x2F, 8)
    bw.write_bits(W - 1, 14)
    bw.write_bits(H - 1, 14)
    bw.write_bits(0, 1)
    bw.write_bits(0, 3)
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no color cache
    bw.write_bits(0, 1)  # no meta huffman

    n = W * H
    greens = {i & 0xFF: 1 for i in range(n)}
    greens[256] = 1  # length-prefix code 0 (value 1)
    reds = {(i >> 8) & 0xFF: 1 for i in range(n)}
    dcode, dextra, debits = _value_to_prefix(plane_value)

    g_code = _write_channel_code(bw, greens, 256 + 24)
    r_code = _write_channel_code(bw, reds, 256)
    b_code = _write_channel_code(bw, {0: 1}, 256)
    a_code = _write_channel_code(bw, {255: 1}, 256)
    d_code = _write_channel_code(bw, {dcode: 1}, 40)

    def put(code_map, sym):
        code, ln = code_map[sym]
        if ln:
            bw.write_code(code, ln)

    i = 0
    while i < n:
        if i == TARGET:
            put(g_code, 256)          # length prefix-code 0 => length 1
            put(d_code, dcode)
            if debits:
                bw.write_bits(dextra, debits)
            i += 1
            continue
        put(g_code, i & 0xFF)
        put(r_code, (i >> 8) & 0xFF)
        put(b_code, 0)
        put(a_code, 255)
        i += 1

    body = bw.bytes()
    padded = body + (b"\x00" if len(body) & 1 else b"")
    riff_size = 4 + 8 + len(padded)
    return (b"RIFF" + struct.pack("<I", riff_size) + b"WEBP" +
            b"VP8L" + struct.pack("<I", len(body)) + padded)


def main() -> None:
    import numpy as np

    lw = ctypes.CDLL("libwebp.so.7")
    lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    lw.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

    entries = []
    for plane in range(1, 121):
        data = probe_stream(plane)
        w = ctypes.c_int()
        h = ctypes.c_int()
        p = lw.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
        if not p:
            raise RuntimeError(f"libwebp rejected probe for plane {plane}")
        arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
        flat = arr.reshape(-1, 4)
        src_id = int(flat[TARGET, 1]) | (int(flat[TARGET, 0]) << 8)
        dist = TARGET - src_id
        # decompose dist = dy*W + dx with dx in [-8, 8]
        dy = (dist + 8) // W
        dx = dist - dy * W
        assert -8 <= dx <= 8 and 0 <= dy <= 15, (plane, dist, dx, dy)
        if dy == 0:
            assert dx >= 1, (plane, dist)
        entries.append((dy << 4) | (8 - dx))
    print("_PLANE_CODES = bytes([")
    for i in range(0, 120, 10):
        row = ", ".join(f"0x{e:02x}" for e in entries[i:i + 10])
        print(f"    {row},")
    print("])")


if __name__ == "__main__":
    main()
