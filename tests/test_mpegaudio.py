"""MPEG-audio frame-walk tests: writer twin → sync-scan parity with
the spec's frame-length formula, ID3v2 skipping, resync over garbage,
MPEG2 rates, and honest failure on frameless bytes."""

import pytest

from krawler_spark.operators.mpegaudio import (
    audio_stream_info,
    build_mp3,
    mp3_frames,
)


def test_walk_matches_formula():
    idxs = [1, 5, 9, 14, 5]
    mp3 = build_mp3(idxs, id3_payload=b"hello tag")
    frames = mp3_frames(mp3)
    assert len(frames) == 5
    rates = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
    exp_sizes = [144 * rates[i] * 1000 // 44100 for i in idxs]
    assert [f[1] for f in frames] == exp_sizes
    assert frames[0][0] == 10 + len(b"hello tag")
    for (o1, s1, _, _), (o2, _, _, _) in zip(frames, frames[1:]):
        assert o2 == o1 + s1
    info = audio_stream_info(mp3)
    assert info["n_frames"] == 5 and info["total_samples"] == 5 * 1152
    assert info["sample_rate"] == 44100 and info["vbr"]


def test_resync_over_garbage_and_truncation():
    mp3 = build_mp3([3, 3, 3])
    frames = mp3_frames(mp3)
    cut = frames[2][0]
    damaged = mp3[:cut] + b"garbage with no sync" + mp3[cut:]
    got = mp3_frames(damaged)
    assert [f[1] for f in got] == [f[1] for f in frames]
    # a truncated final frame is not counted
    short = mp3[: frames[2][0] + 10]
    assert len(mp3_frames(short)) == 2


def test_no_frames_raises():
    with pytest.raises(ValueError):
        mp3_frames(b"not audio at all " * 10)
    with pytest.raises(ValueError):
        mp3_frames(b"")


def test_mpeg2_sample_rates():
    import struct

    # hand-build one MPEG2 Layer III frame header (version=2, 24000 Hz)
    h = (0x7FF << 21) | (2 << 19) | (1 << 17) | (1 << 16) | (5 << 12) | (1 << 10)
    kbps = 40  # index 5 in the MPEG2 table
    size = (576 // 8) * kbps * 1000 // 24000
    frame = struct.pack(">I", h) + b"\x00" * (size - 4)
    (off, sz, spf, rate), = mp3_frames(frame)
    assert (off, sz, spf, rate) == (0, size, 576, 24000)
