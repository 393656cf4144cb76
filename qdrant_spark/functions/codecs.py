"""Dependency-free media codecs: RIFF/WAV (PCM16) and PPM (P6).

These are REAL decoders — they parse the actual byte formats (RIFF chunk
walk, PPM header grammar with comments) — not the md5-fake stand-ins in
:mod:`multimodal`. They exist so the Arrow-batched multimodal plumbing
(extract_features / resize_media / frame_sample) can be exercised
end-to-end in an environment without Pillow/ffmpeg: WAV and PPM are
simple enough to implement from the published specs, and a pipeline that
round-trips them proves the blob plumbing carries arbitrary binary
correctly. Swap in Pillow/torchaudio via the same ``decode_fn`` hooks for
formats that need native codecs.

Reference context: the engine-side contract is "opaque blob in, features
out" (lib/api/src/rest/schema.rs:345-396 delegates decoding to an
inference service); these codecs play that service's role for testable
formats.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# WAV — canonical RIFF container, PCM16 little-endian
# ---------------------------------------------------------------------------


def encode_wav(samples: list[int], *, sample_rate: int = 8000,
               n_channels: int = 1) -> bytes:
    """Encode int16 samples as a canonical RIFF/WAVE file (fmt + data)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      block_align, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(blob: bytes) -> dict:
    """Parse a RIFF/WAVE blob: walk the chunk list (tolerating extra
    chunks like LIST/INFO and word-alignment padding), read the fmt
    chunk, and decode PCM16 samples from the data chunk."""
    if blob is None or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos, end = 12, min(len(blob), 8 + struct.unpack("<I", blob[4:8])[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = blob[pos:pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # skip alignment pad byte
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate = fmt[0], fmt[1], fmt[2]
    bits = fmt[5]
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported, got format={audio_format} bits={bits}")
    n = len(data) // 2
    samples = struct.unpack(f"<{n}h", data[: n * 2])
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_samples": n // n_channels,
        "samples": list(samples),
    }


def wav_features(blob: bytes) -> list[float]:
    """decode_fn for extract_features: [n_samples, sample_rate, mean,
    min, max] of the decoded PCM16 stream."""
    w = decode_wav(blob)
    s = w["samples"]
    n = len(s)
    return [
        float(n),
        float(w["sample_rate"]),
        (sum(s) / n) if n else 0.0,
        float(min(s)) if n else 0.0,
        float(max(s)) if n else 0.0,
    ]


# ---------------------------------------------------------------------------
# PPM — Netpbm P6 binary image
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode raw interleaved RGB bytes as binary PPM (P6, maxval 255)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} bytes, got {len(rgb)}")
    return f"P6\n{width} {height}\n255\n".encode() + rgb


def decode_ppm(blob: bytes) -> tuple[int, int, bytes]:
    """Parse a P6 PPM: magic, then 3 whitespace-separated header ints with
    '#' comments allowed anywhere in the header, then one whitespace byte,
    then width*height*3 raw RGB bytes. Returns (width, height, rgb)."""
    if blob is None or blob[:2] != b"P6":
        raise ValueError("not a P6 PPM blob")
    pos = 2
    vals: list[int] = []
    while len(vals) < 3:
        while pos < len(blob) and blob[pos:pos + 1].isspace():
            pos += 1
        if blob[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(blob) and blob[pos:pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("bad PPM header")
        vals.append(int(blob[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = vals
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = width * height * 3
    rgb = blob[pos:pos + need]
    if len(rgb) != need:
        raise ValueError(f"truncated pixel data: {len(rgb)}/{need}")
    return width, height, rgb


def ppm_features(blob: bytes) -> list[float]:
    """decode_fn for extract_features: [width, height, mean_r, mean_g,
    mean_b] of the decoded image."""
    w, h, rgb = decode_ppm(blob)
    n = w * h
    sums = [0, 0, 0]
    for i, b in enumerate(rgb):
        sums[i % 3] += b
    return [float(w), float(h)] + [s / n for s in sums]


def resize_ppm(blob: bytes, width: int, height: int) -> bytes:
    """resize_fn for resize_media: nearest-neighbor resample of a P6 PPM —
    a real image transform (no interpolation libs needed)."""
    sw, sh, rgb = decode_ppm(blob)
    out = bytearray()
    for y in range(height):
        sy = min(sh - 1, (y * sh) // height)
        for x in range(width):
            sx = min(sw - 1, (x * sw) // width)
            o = (sy * sw + sx) * 3
            out += rgb[o:o + 3]
    return encode_ppm(width, height, bytes(out))
