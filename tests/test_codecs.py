"""Real WAV/PPM codecs: round-trips, header edge cases, and the full
Arrow-batched multimodal plumbing driven by a REAL decoder (not the
md5-fake) — extract_features over WAV blobs and resize_media over PPM."""

from __future__ import annotations

import pytest

from qdrant_spark.functions.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    ppm_features,
    resize_ppm,
    wav_features,
)


def test_wav_roundtrip():
    samples = [0, 100, -100, 32767, -32768, 7]
    blob = encode_wav(samples, sample_rate=16000)
    w = decode_wav(blob)
    assert w["samples"] == samples
    assert w["sample_rate"] == 16000 and w["n_channels"] == 1
    assert w["n_samples"] == 6


def test_wav_odd_length_padding_and_extra_chunks():
    import struct

    samples = [1, 2, 3]  # 6 data bytes: even, but add a LIST chunk + odd chunk
    blob = encode_wav(samples)
    # splice an odd-sized junk chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad to even
    spliced = blob[:12] + junk + blob[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced)["samples"] == samples


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00AIFF")


def test_ppm_roundtrip_and_comments():
    rgb = bytes(range(2 * 2 * 3))
    blob = encode_ppm(2, 2, rgb)
    assert decode_ppm(blob) == (2, 2, rgb)
    commented = b"P6\n# a comment\n2 # inline\n2\n255\n" + rgb
    assert decode_ppm(commented) == (2, 2, rgb)
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(2, 2, rgb)[:-1])  # truncated pixels


def test_ppm_features():
    rgb = bytes([10, 20, 30, 50, 60, 70])  # 2x1
    f = ppm_features(encode_ppm(2, 1, rgb))
    assert f == [2.0, 1.0, 30.0, 40.0, 50.0]


def test_resize_ppm_nearest_neighbor():
    # 2x2 quadrant image -> 4x4 keeps quadrant structure exactly
    rgb = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 0])
    up = resize_ppm(encode_ppm(2, 2, rgb), 4, 4)
    w, h, px = decode_ppm(up)
    assert (w, h) == (4, 4)
    def pix(x, y):
        o = (y * 4 + x) * 3
        return tuple(px[o:o + 3])
    assert pix(0, 0) == pix(1, 1) == (255, 0, 0)
    assert pix(3, 0) == pix(2, 1) == (0, 255, 0)
    assert pix(0, 3) == (0, 0, 255) and pix(3, 3) == (255, 255, 0)
    # downsize back to 2x2 recovers the original quadrants
    assert decode_ppm(resize_ppm(up, 2, 2))[2] == rgb


def test_extract_features_real_wav_decoder(spark):
    """The mapInPandas plumbing end-to-end with a REAL decoder: WAV blobs
    built on the driver, decoded in Arrow-batched workers."""
    from qdrant_spark.functions.multimodal import extract_features

    rows = [(i, encode_wav([(i * 37 + j * 11) % 200 - 100 for j in range(16 + i)],
                           sample_rate=8000)) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "id: long, blob: binary")
    out = {r["id"]: r["embedding"] for r in
           extract_features(df, decode_fn=wav_features).collect()}
    for i, blob in rows:
        exp = wav_features(blob)
        assert [pytest.approx(x, rel=1e-6) for x in out[i]] == exp
        assert out[i][0] == 16 + i  # n_samples really came from the header


def test_resize_media_real_ppm(spark):
    """resize_media with the real nearest-neighbor PPM resizer: output
    blobs are valid PPMs at the target size, not md5 noise."""
    from qdrant_spark.functions.multimodal import resize_media

    rgb = bytes([(3 * k) % 256 for k in range(4 * 4 * 3)])
    df = spark.createDataFrame([(1, encode_ppm(4, 4, rgb))], "id: long, blob: binary")
    out = resize_media(df, width=2, height=2, resize_fn=resize_ppm).collect()[0]
    w, h, px = decode_ppm(bytes(out["blob"]))
    assert (w, h) == (2, 2)
    assert px == resize_ppm(encode_ppm(4, 4, rgb), 2, 2)[-12:]
