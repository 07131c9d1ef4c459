"""Pure-stdlib VP8L (lossless WebP) codec tests.

Ground truth is the system libwebp via ctypes where present (the
library ships in this container; the tests that need it skip cleanly
elsewhere). The decoder must be bit-exact with libwebp's decoder on
real libwebp-encoder output — which exercises transforms, LZ77, color
cache, and meta-Huffman chosen by the real encoder — and the vendored
2D plane-code table must match the behaviorally-recovered one.
"""

import ctypes

import numpy as np
import pytest

from krawler_spark.operators.webpcodec import (
    _PLANE_CODES,
    decode_webp,
    encode_webp_lossless,
    is_webp,
)


def _libwebp():
    try:
        lw = ctypes.CDLL("libwebp.so.7")
    except OSError:
        return None
    lw.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lw.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p)]
    lw.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
    lw.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    return lw


def _lw_encode(lw, rgba: np.ndarray) -> bytes:
    rgba = np.ascontiguousarray(rgba)
    out = ctypes.c_void_p()
    n = lw.WebPEncodeLosslessRGBA(
        rgba.tobytes(), rgba.shape[1], rgba.shape[0], rgba.shape[1] * 4,
        ctypes.byref(out))
    assert n > 0
    return ctypes.string_at(out, n)


def _lw_decode(lw, data: bytes) -> np.ndarray:
    w, h = ctypes.c_int(), ctypes.c_int()
    p = lw.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p
    return np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()


def test_roundtrip_own_encoder():
    rng = np.random.default_rng(3)
    for shape in [(1, 1, 3), (6, 8, 3), (13, 17, 4), (32, 32, 3)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        enc = encode_webp_lossless(arr)
        assert is_webp(enc)
        dec = decode_webp(enc)
        exp = (arr if shape[2] == 4 else
               np.concatenate([arr, np.full(shape[:2] + (1,), 255, np.uint8)],
                              axis=2))
        assert (dec == exp).all(), shape


def test_corrupt_and_lossy_raise():
    with pytest.raises(ValueError):
        decode_webp(b"not a webp at all")
    # a "VP8 " (lossy) chunk is honestly refused, not faked
    lossy = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP" +
             b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    # truncated VP8L body
    good = encode_webp_lossless(np.zeros((4, 4, 3), np.uint8))
    with pytest.raises(ValueError):
        decode_webp(good[:24])


@pytest.mark.skipif(_libwebp() is None, reason="libwebp not present")
def test_own_encoder_conforms_to_libwebp():
    lw = _libwebp()
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    got = _lw_decode(lw, encode_webp_lossless(arr))
    assert (got[..., :3] == arr).all() and (got[..., 3] == 255).all()


@pytest.mark.skipif(_libwebp() is None, reason="libwebp not present")
def test_decoder_bit_exact_vs_libwebp_encoder():
    """Real libwebp output (its choice of predictor/color transforms,
    palette bundling, LZ77, cache, meta-Huffman) must decode to exactly
    what libwebp's own decoder produces."""
    lw = _libwebp()
    rng = np.random.default_rng(7)
    gy, gx = np.meshgrid(np.arange(40), np.arange(40), indexing="ij")
    cases = [
        rng.integers(0, 256, size=(24, 24, 4), dtype=np.uint8),
        np.stack([gy * 5 % 256, gx * 3 % 256, (gy + gx) * 2 % 256],
                 axis=2).astype(np.uint8),
        np.full((16, 16, 4), 130, np.uint8),
        (np.array([(10, 20, 30), (200, 10, 60)], np.uint8)
         [rng.integers(0, 2, size=(30, 30))]),
        (np.array([(10, 20, 30), (200, 10, 60), (0, 0, 0), (255, 255, 255),
                   (90, 90, 1)], np.uint8)[rng.integers(0, 5, size=(33, 29))]),
        (rng.integers(0, 256, size=(20, 3), dtype=np.uint8)
         [rng.integers(0, 20, size=(64, 64))]),
        ((rng.random((50, 50, 1)) < 0.2) * 255 *
         np.ones((1, 1, 3))).astype(np.uint8),
        rng.integers(0, 256, size=(150, 200, 4), dtype=np.uint8),
        np.dstack([rng.integers(0, 256, (40, 40, 3), dtype=np.uint8),
                   rng.integers(0, 256, (40, 40), dtype=np.uint8)[..., None]]),
        rng.integers(0, 256, size=(1, 200, 4), dtype=np.uint8),
        rng.integers(0, 256, size=(200, 1, 4), dtype=np.uint8),
    ]
    for i, a in enumerate(cases):
        if a.shape[2] == 3:
            a = np.concatenate(
                [a, np.full(a.shape[:2] + (1,), 255, np.uint8)], axis=2)
        buf = _lw_encode(lw, a)
        ref = _lw_decode(lw, buf)
        assert (decode_webp(buf) == ref).all(), f"case {i}"


@pytest.mark.skipif(_libwebp() is None, reason="libwebp not present")
def test_plane_code_table_matches_libwebp():
    """Re-derive the 120-entry 2D distance table behaviorally from
    libwebp (scripts/recover_plane_codes.py) and compare to the
    vendored literal."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "recover_plane_codes",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "recover_plane_codes.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    lw = _libwebp()
    derived = []
    for plane in range(1, 121):
        data = mod.probe_stream(plane)
        flat = _lw_decode(lw, data).reshape(-1, 4)
        src_id = int(flat[mod.TARGET, 1]) | (int(flat[mod.TARGET, 0]) << 8)
        dist = mod.TARGET - src_id
        dy = (dist + 8) // mod.W
        dx = dist - dy * mod.W
        derived.append((dy << 4) | (8 - dx))
    assert bytes(derived) == _PLANE_CODES


def _craft_transform_stream(w, h, transform, residuals):
    """Hand-assemble a VP8L stream with exactly one transform so each
    predictor mode / color-transform multiplier gets direct coverage
    (libwebp's encoder only ever picks its favourites)."""
    import struct

    import numpy as np

    from krawler_spark.operators.webpcodec import (
        _BitWriter, _write_channel_code)

    bw = _BitWriter()
    bw.write_bits(0x2F, 8)
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)
    bw.write_bits(0, 3)
    bw.write_bits(1, 1)
    kind, val = transform
    bw.write_bits(0 if kind == "pred" else 1, 2)
    bw.write_bits(3 - 2, 3)  # bits=3 -> 8px transform blocks
    bw.write_bits(0, 1)  # sub-image: no cache
    if kind == "pred":
        subs = {"g": val, "r": 0, "b": 0}
    else:
        g2r, g2b, r2b = val  # stored as (b, g, r) channels
        subs = {"g": g2b, "r": r2b, "b": g2r}
    _write_channel_code(bw, {subs["g"]: 1}, 256 + 24)
    _write_channel_code(bw, {subs["r"]: 1}, 256)
    _write_channel_code(bw, {subs["b"]: 1}, 256)
    _write_channel_code(bw, {255: 1}, 256)
    _write_channel_code(bw, {0: 1}, 40)
    # all-single-symbol codes: the sub-image pixels consume zero bits
    bw.write_bits(0, 1)  # end transforms
    bw.write_bits(0, 1)  # no cache
    bw.write_bits(0, 1)  # no meta

    chans = {k: residuals[..., i] for i, k in enumerate("argb")}

    def freqs(x):
        u, c = np.unique(x, return_counts=True)
        return dict(zip(u.tolist(), c.tolist()))

    gc = _write_channel_code(bw, freqs(chans["g"]), 256 + 24)
    rc = _write_channel_code(bw, freqs(chans["r"]), 256)
    bc = _write_channel_code(bw, freqs(chans["b"]), 256)
    ac = _write_channel_code(bw, freqs(chans["a"]), 256)
    _write_channel_code(bw, {0: 1}, 40)
    for i in range(h):
        for j in range(w):
            for cm, v in ((gc, chans["g"][i, j]), (rc, chans["r"][i, j]),
                          (bc, chans["b"][i, j]), (ac, chans["a"][i, j])):
                code, ln = cm[int(v)]
                if ln:
                    bw.write_code(code, ln)
    body = bw.bytes()
    pad = body + (b"\x00" if len(body) & 1 else b"")
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(pad)) + b"WEBP" +
            b"VP8L" + struct.pack("<I", len(body)) + pad)


@pytest.mark.skipif(_libwebp() is None, reason="libwebp not present")
def test_every_predictor_mode_and_color_transform_vs_libwebp():
    lw = _libwebp()
    rng = np.random.default_rng(31)
    for mode in range(14):
        res = rng.integers(0, 256, size=(24, 33, 4), dtype=np.uint8)
        data = _craft_transform_stream(33, 24, ("pred", mode), res)
        assert (decode_webp(data) == _lw_decode(lw, data)).all(), f"mode {mode}"
    for mults in [(0, 0, 0), (255, 255, 255), (127, 128, 1), (37, 201, 99)]:
        res = rng.integers(0, 256, size=(16, 19, 4), dtype=np.uint8)
        data = _craft_transform_stream(19, 16, ("color", mults), res)
        assert (decode_webp(data) == _lw_decode(lw, data)).all(), f"color {mults}"


def test_animated_webp_roundtrip():
    from krawler_spark.operators.webpcodec import (
        decode_webp_anim, encode_webp_anim, is_animated_webp)

    rng = np.random.default_rng(13)
    frames = [rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
              for _ in range(5)]
    anim = encode_webp_anim(frames, duration_ms=40)
    assert is_webp(anim) and is_animated_webp(anim)
    assert not is_animated_webp(encode_webp_lossless(frames[0]))
    out = decode_webp_anim(anim)
    assert len(out) == 5
    for exp, got in zip(frames, out):
        assert (got[..., :3] == exp).all() and (got[..., 3] == 255).all()
    with pytest.raises(ValueError):
        decode_webp_anim(encode_webp_lossless(frames[0]))


def test_sample_frames_animated_webp(spark):
    from krawler_spark.operators.multimodal import sample_frames
    from krawler_spark.operators.webpcodec import encode_webp_anim

    rng = np.random.default_rng(17)
    frames = [rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
              for _ in range(6)]
    payload = encode_webp_anim(frames)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary")
    rows = sorted(
        sample_frames(df, every_n=2, max_frames=4).collect(),
        key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    for r, src in zip(rows, (0, 2, 4)):
        assert bytes(r.frame) == frames[src].tobytes()


def test_decode_image_dispatch():
    from krawler_spark.operators.multimodal import decode_image
    from krawler_spark.operators.webpcodec import encode_webp_anim

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    out = decode_image(encode_webp_lossless(arr))
    assert out.shape == (6, 8, 3) and (out == arr).all()
    # animated WebP decodes to frame 0 (GIF/APNG parity)
    arr2 = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
    out = decode_image(encode_webp_anim([arr, arr2]))
    assert (out == arr).all()


def test_sniff_riff_kinds(spark):
    from krawler_spark.operators.multimodal import sniff_media_type

    rows = [
        (1, bytearray(encode_webp_lossless(np.zeros((2, 2, 3), np.uint8)))),
        (2, bytearray(b"RIFF\x04\x00\x00\x00WAVEdata")),
        (3, bytearray(b"RIFF\x04\x00\x00\x00AVI LIST")),
        (4, bytearray(b"RIFFxx")),  # truncated container
        (5, bytearray(b"\x89PNG\r\n\x1a\nrest")),
    ]
    df = spark.createDataFrame(rows, "doc_id int, payload binary")
    got = {r.doc_id: r.media_type
           for r in sniff_media_type(df).collect()}
    assert got == {1: "image/webp", 2: "audio/wav", 3: "video/avi",
                   4: "application/octet-stream", 5: "image/png"}
