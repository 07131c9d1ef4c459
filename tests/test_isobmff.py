"""ISO-BMFF (MP4) container walk tests: build_mp4 writer twin →
video_samples/extract_samples reader, chunk-run resolution, and the
sample_frames integration (real sample bytes for mp4; damaged
containers degrade to the byte-slice stub instead of failing the
stage)."""

import struct

import pytest

from krawler_spark.operators.isobmff import (
    build_mp4,
    extract_samples,
    is_mp4,
    video_samples,
)


def test_roundtrip_variable_sizes():
    samples = [bytes([i]) * (5 + 3 * i) for i in range(9)]
    mp4 = build_mp4(samples, samples_per_chunk=2)
    assert is_mp4(mp4)
    assert extract_samples(mp4) == samples


def test_roundtrip_single_chunk_and_uniform():
    samples = [b"abcd"] * 5
    assert extract_samples(build_mp4(samples, samples_per_chunk=100)) == samples
    assert extract_samples(build_mp4(samples, samples_per_chunk=1)) == samples


def test_stsc_runs_resolved():
    # 7 samples, 3 per chunk -> chunks of 3,3,1 -> two stsc runs
    samples = [bytes([i]) * 4 for i in range(7)]
    mp4 = build_mp4(samples, samples_per_chunk=3)
    offs = video_samples(mp4)
    assert len(offs) == 7
    assert extract_samples(mp4) == samples


def test_non_mp4_and_damaged_raise():
    with pytest.raises(ValueError):
        video_samples(b"plainly not a container")
    samples = [b"xyz"] * 4
    mp4 = bytearray(build_mp4(samples))
    # corrupt the moov size field -> bad box size
    idx = bytes(mp4).find(b"moov") - 4
    mp4[idx:idx + 4] = struct.pack(">I", 0xFFFFFF)
    with pytest.raises(ValueError):
        video_samples(bytes(mp4))


def test_sample_frames_mp4_real_and_stub(spark):
    from krawler_spark.operators.multimodal import sample_frames

    samples = [bytes([i]) * (6 + i) for i in range(8)]
    good = build_mp4(samples, samples_per_chunk=3)
    damaged = bytearray(good)
    idx = bytes(damaged).find(b"moov") - 4
    damaged[idx:idx + 4] = struct.pack(">I", 0xFFFFFF)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytes(damaged))],
        "doc_id long, payload binary")
    rows = sample_frames(df, every_n=2, max_frames=4).collect()
    got1 = {r.frame_idx: bytes(r.frame) for r in rows if r.doc_id == 1}
    assert got1 == {fi: samples[fi * 2] for fi in range(4)}
    # damaged container fell back to the byte-slice stub (16-byte slices)
    got2 = [bytes(r.frame) for r in rows if r.doc_id == 2]
    assert got2 and all(len(f) <= 16 for f in got2)


def test_sniff_mp4(spark):
    from krawler_spark.operators.multimodal import sniff_media_type

    df = spark.createDataFrame(
        [(1, bytearray(build_mp4([b"zz"]))), (2, bytearray(b"textual data"))],
        "doc_id long, payload binary")
    got = {r.doc_id: r.media_type for r in sniff_media_type(df).collect()}
    assert got == {1: "video/mp4", 2: "application/octet-stream"}


def test_wav_roundtrip_and_features(spark):
    import numpy as np

    from krawler_spark.operators.multimodal import (
        encode_wav, extract_audio_features, parse_wav)

    rng = np.random.default_rng(23)
    samples = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    wav = encode_wav(samples, sample_rate=44100)
    rate, ch, got = parse_wav(wav)
    assert (rate, ch) == (44100, 2) and (got == samples).all()
    # 8-bit PCM path
    import struct as st
    fmt8 = st.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    data8 = bytes([0, 128, 255, 200])
    wav8 = (b"RIFF" + st.pack("<I", 4 + 24 + 8 + len(data8)) + b"WAVE" +
            b"fmt " + st.pack("<I", len(fmt8)) + fmt8 +
            b"data" + st.pack("<I", len(data8)) + data8)
    rate8, ch8, s8 = parse_wav(wav8)
    assert (rate8, ch8) == (8000, 1) and s8[0, 0] == -32768 and s8[1, 0] == 0
    # non-PCM raises; features degrade instead of crashing
    float_fmt = st.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    wavf = (b"RIFF" + st.pack("<I", 4 + 24 + 8) + b"WAVE" +
            b"fmt " + st.pack("<I", len(float_fmt)) + float_fmt +
            b"data" + st.pack("<I", 0))
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        parse_wav(wavf)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(wavf)), (3, bytearray(b"junk"))],
        "doc_id long, payload binary")
    rows = {r.doc_id: r for r in extract_audio_features(df).collect()}
    s64 = samples.astype(np.int64)
    assert rows[1].decode_ok and rows[1].sumsq == int((s64 * s64).sum())
    assert rows[1].peak == int(np.abs(s64).max()) and rows[1].n_samples == 100
    assert not rows[2].decode_ok and not rows[3].decode_ok


def test_avif_roundtrip_and_errors():
    from krawler_spark.operators.isobmff import (
        avif_info, build_avif, extract_avif_item, is_avif)

    payload = b"fake-av1-coded-bytes-" * 7
    av = build_avif(payload, 320, 200)
    assert is_avif(av) and not is_avif(build_mp4([b"zz"]))
    info = avif_info(av)
    assert info["item_type"] == "av01"
    assert (info["width"], info["height"]) == (320, 200)
    assert extract_avif_item(av) == payload
    with pytest.raises(ValueError):
        avif_info(build_mp4([b"zz"]))  # plain movie: no meta box
    # extent pointing outside the file must be rejected
    truncated = av[:-10]
    with pytest.raises(ValueError):
        avif_info(truncated)


def test_avif_multi_item_ispe_association():
    """Real multi-item HEIC/AVIF (thumbnail + primary) carries one ispe
    per item; the reported dimensions must be the ispe ipma-associated
    with the PRIMARY item, not the first ispe in ipco (ADVICE r4)."""
    import struct

    from krawler_spark.operators import isobmff as I

    payload = b"coded-primary-bytes"
    thumb = b"thumb"
    ftyp = I._box(b"ftyp", b"avif" + struct.pack(">I", 0) + b"avifmif1")
    hdlr = I._fullbox(b"hdlr", struct.pack(">I", 0) + b"pict" + b"\x00" * 13)
    pitm = I._fullbox(b"pitm", struct.pack(">H", 2))  # primary = item 2
    infe1 = I._fullbox(b"infe", struct.pack(">HH", 1, 0) + b"av01" + b"\x00",
                       version=2)
    infe2 = I._fullbox(b"infe", struct.pack(">HH", 2, 0) + b"av01" + b"\x00",
                       version=2)
    iinf = I._fullbox(b"iinf", struct.pack(">H", 2) + infe1 + infe2)
    # ipco: item 1's (thumbnail) ispe FIRST, the primary's second
    ispe_thumb = I._fullbox(b"ispe", struct.pack(">II", 32, 24))
    ispe_main = I._fullbox(b"ispe", struct.pack(">II", 640, 480))
    ipco = I._box(b"ipco", ispe_thumb + ispe_main)
    ipma = I._fullbox(b"ipma", struct.pack(">I", 2) +
                      struct.pack(">HB", 1, 1) + bytes([0x81]) +   # item1→prop1
                      struct.pack(">HB", 2, 1) + bytes([0x82]))    # item2→prop2
    iprp = I._box(b"iprp", ipco + ipma)

    def iloc_with(off1, off2):
        return I._fullbox(b"iloc", struct.pack(">H", 0x4400) +
                          struct.pack(">H", 2) +
                          struct.pack(">HHH", 1, 0, 1) +
                          struct.pack(">II", off1, len(thumb)) +
                          struct.pack(">HHH", 2, 0, 1) +
                          struct.pack(">II", off2, len(payload)))

    meta_for = lambda o1, o2: I._fullbox(  # noqa: E731
        b"meta", hdlr + pitm + iinf + iprp + iloc_with(o1, o2))
    probe = ftyp + meta_for(0, 0)
    off1 = len(probe) + 8
    av = ftyp + meta_for(off1, off1 + len(thumb)) + I._box(
        b"mdat", thumb + payload)

    info = I.avif_info(av)
    assert info["primary_item"] == 2
    assert (info["width"], info["height"]) == (640, 480)  # NOT 32×24
    assert I.extract_avif_item(av) == payload


def test_sniff_heif_brands(spark):
    from krawler_spark.operators.isobmff import build_avif
    from krawler_spark.operators.multimodal import sniff_media_type

    av = build_avif(b"x", 1, 1)
    heic = bytearray(av)
    heic[8:12] = b"heic"
    df = spark.createDataFrame(
        [(1, bytearray(av)), (2, bytes(heic)), (3, bytearray(build_mp4([b"z"])))],
        "doc_id long, payload binary")
    got = {r.doc_id: r.media_type for r in sniff_media_type(df).collect()}
    assert got == {1: "image/avif", 2: "image/heif", 3: "video/mp4"}


def test_image_meta_all_formats_and_probe(spark):
    import numpy as np

    from krawler_spark.operators.gifcodec import encode_gif
    from krawler_spark.operators.isobmff import build_avif
    from krawler_spark.operators.jpegcodec import encode_jpeg
    from krawler_spark.operators.multimodal import (
        encode_apng, encode_png, image_meta, probe_image_meta)
    from krawler_spark.operators.webpcodec import (
        encode_webp_anim, encode_webp_lossless)

    img = np.zeros((6, 8, 3), np.uint8)
    cases = {
        "png": (encode_png(img), False, 1),
        "gif": (encode_gif([img] * 3), True, 3),
        "jpeg": (encode_jpeg(img), False, 1),
        "webp": (encode_webp_lossless(img), False, 1),
    }
    for fmt, (payload, anim, n) in cases.items():
        m = image_meta(payload)
        assert (m["format"], m["width"], m["height"]) == (fmt, 8, 6)
        assert (m["animated"], m["n_frames"]) == (anim, n)
    m = image_meta(encode_apng([img] * 4))
    assert m["format"] == "png" and m["animated"] and m["n_frames"] == 4
    m = image_meta(encode_webp_anim([img, img]))
    assert m["format"] == "webp" and m["animated"] and m["n_frames"] == 2
    m = image_meta(build_avif(b"x", 33, 21))
    assert (m["format"], m["width"], m["height"]) == ("avif", 33, 21)
    with pytest.raises(ValueError):
        image_meta(b"garbage bytes")
    df = spark.createDataFrame(
        [(1, bytearray(cases["png"][0])), (2, bytearray(b"garbage"))],
        "doc_id long, payload binary")
    rows = {r.doc_id: r for r in probe_image_meta(df).collect()}
    assert rows[1].ok and rows[1].format == "png"
    assert not rows[2].ok and rows[2].format is None
