"""Pure-stdlib GIF87a/89a codec (LZW + frame walk) — no PIL needed.

Closes the last non-PNG codec stub in ``multimodal.py``: GIF payloads
now decode natively, and animated GIFs take the real frame-walk path in
``sample_frames`` (reference surface: krawler hands opaque response
bodies to the user; this engine adds the multimodal decode operators a
training-data pipeline needs on top — see SURVEY.md §2 "beyond").

Honesty contract (same as the APNG decoder in ``multimodal.py``):

* full-frame, (0,0)-offset frames only — a sub-frame region or a
  disposal mode that requires composing onto the previous canvas
  raises ``NotImplementedError`` rather than silently producing a
  wrong canvas;
* no interlace (raises), no transparency composition (a transparent
  index in a FULL frame is decoded as its palette color — the frame is
  self-contained so no compositing is needed);
* both color-table kinds (global + per-frame local) are supported.

The encoder emits exactly the subset the decoder accepts, so
encode→decode round-trips are byte-exact on the pixel arrays — that is
what the contract-query oracle checks.
"""

from __future__ import annotations

import struct
from typing import List, Optional

GIF_MAGICS = (b"GIF87a", b"GIF89a")


# --------------------------------------------------------------------------
# LZW (GIF variant: variable-width codes, LSB-first bit packing)
# --------------------------------------------------------------------------

def _lzw_encode(indices, min_code_size: int) -> bytes:
    """GIF-LZW compress a sequence of palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # dict maps tuple-of-indices -> code; rebuilt on clear
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq = ()
    for px in indices:
        px = int(px)
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = (px,)
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """GIF-LZW decompress to exactly ``n_pixels`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit position
    nbytes = len(data)
    out = bytearray()

    def reset():
        return {i: bytes([i]) for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    prev: Optional[bytes] = None
    while len(out) < n_pixels:
        byte_i, bit_i = pos >> 3, pos & 7
        if byte_i >= nbytes:
            raise ValueError("GIF LZW stream truncated")
        chunk = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (chunk >> bit_i) & ((1 << width) - 1)
        pos += width
        if code == clear:
            table, next_code, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt GIF LZW code {code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW ended short of the image size")
    return out[:n_pixels]


# --------------------------------------------------------------------------
# container
# --------------------------------------------------------------------------

def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i:i + 255]
        out.append(len(part))
        out.extend(part)
    out.append(0)
    return bytes(out)


def _read_sub_blocks(b: bytes, pos: int):
    """Concatenate sub-blocks starting at pos; return (bytes, new_pos)."""
    out = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("GIF sub-block stream truncated")
        n = b[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(b[pos:pos + n])
        pos += n


def _build_palette(frames) -> tuple:
    """Single global palette covering every distinct RGB in ``frames``.

    Returns (palette array  (n,3) uint8, index frames list). Raises if
    the frames need more than 256 colors (quantization is out of scope
    for a correctness codec)."""
    import numpy as np

    flat = np.concatenate([f.reshape(-1, 3) for f in frames], axis=0)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(f"GIF encoder: {len(colors)} colors > 256")
    idx_frames = []
    off = 0
    for f in frames:
        n = f.shape[0] * f.shape[1]
        idx_frames.append(inverse[off:off + n].astype(np.uint8))
        off += n
    return colors.astype(np.uint8), idx_frames


def encode_gif(frames, delay_cs: int = 10, loop: bool = True) -> bytes:
    """Encode a list of (h, w, 3) uint8 RGB arrays as an animated
    GIF89a with one global color table (single-frame lists produce a
    plain still GIF). All frames must share one shape."""
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must be (h, w, 3) and equal-shaped")
    palette, idx_frames = _build_palette(frames)

    # color table size: power of two >= len(palette), minimum 2
    ct_bits = max(1, (max(len(palette), 2) - 1).bit_length())
    ct_size = 1 << ct_bits
    table = bytearray(palette.tobytes())
    table.extend(b"\x00" * (ct_size * 3 - len(table)))

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table flag + size bits
    out.extend(struct.pack("<HHBBB", w, h, 0x80 | (ct_bits - 1), 0, 0))
    out.extend(table)
    if len(frames) > 1 and loop:
        out.extend(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    min_code_size = max(2, ct_bits)
    for idx in idx_frames:
        if len(frames) > 1:
            # graphic control: disposal=1 (leave), no transparency
            out.extend(b"\x21\xf9\x04")
            out.extend(struct.pack("<BHB", 0x04, delay_cs, 0))
            out.append(0)
        out.append(0x2C)  # image descriptor: full frame, no local table
        out.extend(struct.pack("<HHHHB", 0, 0, w, h, 0))
        out.append(min_code_size)
        out.extend(_sub_blocks(_lzw_encode(idx, min_code_size)))
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes) -> List:
    """Decode every frame of a GIF to (h, w, 3) uint8 RGB arrays.

    Full-frame, non-interlaced frames only — sub-frame regions,
    interlace, and restore-to-previous disposal raise
    ``NotImplementedError`` (see module docstring)."""
    import numpy as np

    b = bytes(payload or b"")
    if b[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF byte stream")
    w, h, packed, _bg, _par = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    global_ct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        global_ct = np.frombuffer(b[pos:pos + n * 3], dtype=np.uint8).reshape(n, 3)
        pos += n * 3

    frames: List = []
    while pos < len(b):
        blk = b[pos]
        pos += 1
        if blk == 0x3B:  # trailer
            break
        if blk == 0x21:  # extension — GCE/app/comment all skippable,
            label = b[pos]  # but a restore-to-previous disposal means
            pos += 1  # composition we refuse to fake
            data, pos = _read_sub_blocks(b, pos)
            if label == 0xF9 and data:
                disposal = (data[0] >> 2) & 0x07
                if disposal == 3:
                    raise NotImplementedError(
                        "GIF restore-to-previous disposal unsupported"
                    )
            continue
        if blk != 0x2C:
            raise ValueError(f"unknown GIF block 0x{blk:02x}")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", b[pos:pos + 9])
        pos += 9
        if (left, top, fw, fh) != (0, 0, w, h):
            raise NotImplementedError(
                "GIF sub-frame regions unsupported (full-frame frames only)"
            )
        if fpacked & 0x40:
            raise NotImplementedError("interlaced GIF unsupported")
        ct = global_ct
        if fpacked & 0x80:
            n = 1 << ((fpacked & 0x07) + 1)
            ct = np.frombuffer(b[pos:pos + n * 3], dtype=np.uint8).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF frame has no color table")
        min_code_size = b[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(b, pos)
        idx = np.frombuffer(
            bytes(_lzw_decode(lzw, min_code_size, w * h)), dtype=np.uint8
        )
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF pixel index beyond color table")
        frames.append(ct[idx].reshape(h, w, 3))
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return frames


def is_animated_gif(payload: bytes) -> bool:
    """True when the payload is a GIF with more than one image block —
    cheap container walk, no LZW work."""
    b = bytes(payload or b"")
    if b[:6] not in GIF_MAGICS:
        return False
    w, h, packed = struct.unpack("<HHB", b[6:11])
    pos = 13
    if packed & 0x80:
        pos += (1 << ((packed & 0x07) + 1)) * 3
    images = 0
    try:
        while pos < len(b):
            blk = b[pos]
            pos += 1
            if blk == 0x3B:
                break
            if blk == 0x21:
                pos += 1
                _, pos = _read_sub_blocks(b, pos)
                continue
            if blk != 0x2C:
                break
            fpacked = b[pos + 8]
            pos += 9
            if fpacked & 0x80:
                pos += (1 << ((fpacked & 0x07) + 1)) * 3
            pos += 1  # LZW min code size
            _, pos = _read_sub_blocks(b, pos)
            images += 1
            if images > 1:
                return True
    except (ValueError, IndexError):
        return False
    return False
