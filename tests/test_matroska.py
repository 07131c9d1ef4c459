"""WebM/Matroska EBML walk tests: writer twin → video_blocks reader,
multi-byte vint sizes, damaged/laced streams, and the sample_frames
integration."""

import pytest

from krawler_spark.operators.matroska import (
    build_webm,
    extract_blocks,
    is_webm,
    video_blocks,
)


def test_roundtrip():
    frames = [bytes([i]) * (4 + i) for i in range(6)]
    webm = build_webm(frames)
    assert is_webm(webm)
    assert extract_blocks(webm) == frames


def test_large_frames_multibyte_vints():
    frames = [b"x" * 5, b"y" * 300, b"z" * 70000]
    webm = build_webm(frames)
    assert extract_blocks(webm) == frames


def test_track_filtering_and_errors():
    frames = [b"abc", b"defg"]
    webm = build_webm(frames, track_number=3)
    assert extract_blocks(webm) == frames
    with pytest.raises(ValueError):
        video_blocks(b"not ebml")
    with pytest.raises(ValueError):
        video_blocks(b"\x1a\x45\xdf\xa3junkjunk")


def _unknown_size_webm(frames, unknown_cluster=True):
    """Re-mux build_webm's output with stream-style UNKNOWN sizes: the
    Segment size vint is all-ones (0x01FF..FF) and, optionally, so is
    the Cluster's (0xFF) — how live-muxed WebM is written before the
    total length is known."""
    from krawler_spark.operators import matroska as M

    header = M._el(M.EBML, M._el(M.DOCTYPE, b"webm") +
                   M._el_uint(0x4286, 1) + M._el_uint(0x42F7, 1))
    info = M._el(M.INFO, M._el_uint(M.TIMECODE_SCALE, 1_000_000))
    entry = M._el(M.TRACK_ENTRY,
                  M._el_uint(M.TRACK_NUMBER, 1) + M._el_uint(0x73C5, 1) +
                  M._el_uint(M.TRACK_TYPE, 1) + M._el(M.CODEC_ID, b"V_VP8"))
    tracks = M._el(M.TRACKS, entry)
    import struct

    blocks = b"".join(
        M._el(M.SIMPLE_BLOCK,
              M._enc_vint_size(1) + struct.pack(">hB", i, 0x80) + fr)
        for i, fr in enumerate(frames))
    cluster_payload = M._el_uint(M.CLUSTER_TIMECODE, 0) + blocks
    if unknown_cluster:
        cluster = M._enc_vint_id(M.CLUSTER) + b"\xff" + cluster_payload
    else:
        cluster = M._el(M.CLUSTER, cluster_payload)
    seg_payload = info + tracks + cluster
    return (header + M._enc_vint_id(M.SEGMENT) +
            b"\x01" + b"\xff" * 7 + seg_payload)


def test_unknown_size_segment_and_cluster():
    """Live/stream-muxed WebM writes Segment (and often Cluster) with
    the all-ones unknown-size vint; the walk must treat it as
    extends-to-end-of-parent instead of raising overruns-parent
    (ADVICE r4: real crawled WebM silently degraded to the stub)."""
    frames = [b"abc", b"defgh" * 80, b"z" * 7]
    for unknown_cluster in (True, False):
        webm = _unknown_size_webm(frames, unknown_cluster=unknown_cluster)
        assert extract_blocks(webm) == frames


def test_unknown_size_nonmaster_rejected():
    from krawler_spark.operators import matroska as M

    # a SimpleBlock (non-master) with an unknown-size vint is invalid
    bad = (M._el(M.EBML, M._el(M.DOCTYPE, b"webm")) +
           M._enc_vint_id(M.SEGMENT) + b"\x01" + b"\xff" * 7 +
           M._enc_vint_id(M.SIMPLE_BLOCK) + b"\xff" + b"\x81\x00\x00\x80xx")
    with pytest.raises(ValueError):
        video_blocks(bad)


def test_sample_frames_webm(spark):
    from krawler_spark.operators.multimodal import sample_frames

    frames = [bytes([i]) * (6 + i) for i in range(8)]
    webm = build_webm(frames)
    df = spark.createDataFrame(
        [(1, bytearray(webm))], "doc_id long, payload binary")
    rows = {r.frame_idx: bytes(r.frame)
            for r in sample_frames(df, every_n=2, max_frames=4).collect()}
    assert rows == {fi: frames[fi * 2] for fi in range(4)}


def test_sniff_webm(spark):
    from krawler_spark.operators.multimodal import sniff_media_type

    df = spark.createDataFrame(
        [(1, bytearray(build_webm([b"zz"])))], "doc_id long, payload binary")
    assert sniff_media_type(df).collect()[0].media_type == "video/webm"
