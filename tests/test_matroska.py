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
