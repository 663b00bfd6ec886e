"""Stdlib-only multimodal payload codecs for the binary-column pipeline.

The container has no PIL/ffmpeg, but "decode image/audio bytes" does not
need them for *real* decoding of the two formats the fixture
synthesizes: PNG (RFC 2083 — struct-framed chunks + zlib-compressed
scanlines + CRC32 per chunk) and WAV (RIFF framing + PCM samples). The
encoders below emit spec-valid files and the decoders parse them the
hard way — signature, chunk walk, CRC verification, zlib inflate,
filter-byte handling — so the Spark operator exercises an honest
decode path: corrupt bytes raise, dimensions/channel stats come from
the actual pixel/sample payload, not from a digest.

Reference lineage: the reference pipeline (migration.py) is text-only;
this module exists for SURVEY.md §2.7's multimodal-column requirement.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def synth_png(width: int, height: int, seed: int) -> bytes:
    """A spec-valid 8-bit RGB PNG with deterministic pixel content."""
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type 0 (None) per scanline
        for x in range(width):
            base = (seed * 31 + x * 7 + y * 13) & 0xFF
            raw += bytes((base, (base * 3 + 1) & 0xFF, (base * 5 + 2) & 0xFF))
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _valueerror_on_corruption(fn):
    """Decoder contract: ANY malformed input raises ValueError — incl.
    truncation (struct.error) and corrupt deflate streams (zlib.error),
    so quarantine logic can catch one exception type."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except (struct.error, zlib.error, IndexError) as e:
            raise ValueError(f"corrupt payload: {e}") from e

    return wrapped


def _png_raw(data: bytes) -> tuple[int, int, int, bytes]:
    """Parse a PNG to ``(width, height, channels, raw_scanlines)``:
    chunk walk, CRC verification per chunk, zlib inflate, length
    check. The raw payload keeps its per-scanline filter byte."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    height = channels = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, color_type = struct.unpack_from(">IIBB", payload)
            if depth != 8 or color_type != 2:
                raise ValueError("decoder handles 8-bit RGB only")
            channels = 3
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if width < 1 or height < 1:
        # a CRC-valid IHDR can still declare a degenerate geometry; the
        # spec requires both dimensions nonzero, and letting it through
        # would divide by zero downstream — outside the ValueError contract
        raise ValueError("PNG declares zero width or height")
    raw = zlib.decompress(bytes(idat))
    stride = 1 + width * channels
    if len(raw) != stride * height:
        raise ValueError("PNG scanline payload has wrong length")
    for y in range(height):
        if raw[y * stride] != 0:
            raise ValueError("decoder handles filter type 0 only")
    return width, height, channels, raw


@_valueerror_on_corruption
def decode_png(data: bytes) -> dict:
    """Parse a PNG: walk chunks, verify every CRC, inflate IDAT, strip
    filter bytes, and compute per-channel pixel means from the actual
    scanline payload. Raises ``ValueError`` on any corruption."""
    width, height, channels, raw = _png_raw(data)
    stride = 1 + width * channels
    sums = [0, 0, 0]
    for y in range(height):
        px = raw[y * stride + 1 : (y + 1) * stride]
        for c in range(channels):
            sums[c] += sum(px[c::channels])
    n = width * height
    return {
        "kind": "png",
        "width": width,
        "height": height,
        "channels": channels,
        "sample_rate": None,
        "n_frames": None,
        "features": [round(s / n, 4) for s in sums],
    }


@_valueerror_on_corruption
def resize_png(data: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize to ``out_w × out_h``, emitting a NEW
    spec-valid PNG (SURVEY.md §2.7 multimodal resize). Output pixel
    (x, y) samples source pixel (⌊x·W/out_w⌋, ⌊y·H/out_h⌋) — the
    floor-mapping convention every NN resampler uses, and a pure
    integer formula an external oracle can replicate exactly. Raises
    ``ValueError`` on any input corruption (same contract as the
    decoders)."""
    if out_w < 1 or out_h < 1:
        raise ValueError("resize target must be at least 1x1")
    width, height, channels, raw = _png_raw(data)
    if channels != 3:
        # the output IHDR below hardcodes color type 2 (8-bit RGB);
        # keep that invariant LOCAL instead of inherited from
        # _png_raw's current input gate, so widening decoder support
        # (grayscale/RGBA) can never silently emit a PNG whose IHDR
        # contradicts its scanline payload
        raise ValueError(f"resize_png only supports 8-bit RGB (got {channels} channels)")
    stride = 1 + width * channels
    out = bytearray()
    for y in range(out_h):
        sy = (y * height) // out_h
        line = raw[sy * stride + 1 : (sy + 1) * stride]
        out.append(0)  # filter type 0
        for x in range(out_w):
            sx = (x * width) // out_w
            out += line[sx * channels : (sx + 1) * channels]
    ihdr = struct.pack(">IIBBBBB", out_w, out_h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def synth_wav(sample_rate: int, n_samples: int, seed: int, channels: int = 1) -> bytes:
    """A spec-valid 16-bit PCM WAV with deterministic LCG samples."""
    state = seed & 0x7FFFFFFF
    frames = bytearray()
    for _ in range(n_samples * channels):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        frames += struct.pack("<h", (state % 65536) - 32768)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(frames))
        + bytes(frames)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_valueerror_on_corruption
def decode_wav(data: bytes) -> dict:
    """Parse a WAV: RIFF framing, fmt chunk, PCM samples; feature is the
    mean absolute sample amplitude. Raises ``ValueError`` on corruption."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    (riff_len,) = struct.unpack_from("<I", data, 4)
    if riff_len != len(data) - 8:
        raise ValueError("WAV RIFF length mismatch")
    pos = 12
    channels = sample_rate = None
    frames = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("decoder handles 16-bit PCM only")
        elif tag == b"data":
            frames = payload
        pos += 8 + length
    if channels is None or frames is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = struct.unpack(f"<{len(frames) // 2}h", frames)
    n_frames = len(samples) // channels
    sum_abs = sum(abs(s) for s in samples)
    mean_abs = sum_abs / max(len(samples), 1)
    return {
        "kind": "wav",
        "width": None,
        "height": None,
        "channels": channels,
        "sample_rate": sample_rate,
        "n_frames": n_frames,
        # exact integer companion of the mean feature: an external
        # oracle replaying the PCM stream closed-form compares sum_abs
        # without touching float rounding conventions
        "sum_abs": sum_abs,
        "features": [round(mean_abs, 4)],
    }


def synth_payload(doc_id: int) -> bytes:
    """Deterministic fixture payload: even doc_ids get a PNG, odd get a
    WAV — sizes vary with the id so batches are heterogeneous."""
    if doc_id % 2 == 0:
        return synth_png(8 + doc_id % 16, 8 + (doc_id // 2) % 12, seed=doc_id)
    return synth_wav(8000 + 100 * (doc_id % 5), 256 + doc_id % 128, seed=doc_id)


def decode_payload(data: bytes) -> dict:
    """Dispatch on magic bytes — the real-decoder entry the Spark
    operator calls per payload."""
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:4] == b"RIFF":
        return decode_wav(data)
    raise ValueError("unknown payload format")


def synth_png_stream(doc_id: int) -> bytes:
    """A video-like payload: N spec-valid PNG frames concatenated
    back-to-back (an intra-only stream; each frame decodes alone)."""
    n_frames = 3 + doc_id % 5
    w, h = 6 + doc_id % 8, 6 + (doc_id // 3) % 6
    return b"".join(
        synth_png(w, h, seed=doc_id * 100 + f) for f in range(n_frames)
    )


def iter_png_frames(data: bytes):
    """Walk a concatenated-PNG stream, yielding ``(byte_offset,
    frame_bytes)`` per frame by parsing chunk framing to each IEND —
    no signature scanning heuristics, the chunk lengths drive the walk.
    Raises ``ValueError`` on desync or truncation."""
    pos = 0
    while pos < len(data):
        if data[pos : pos + 8] != _PNG_SIG:
            raise ValueError(f"stream desync at offset {pos}")
        start, p = pos, pos + 8
        while True:
            try:
                (length,) = struct.unpack_from(">I", data, p)
            except struct.error as e:
                raise ValueError(f"truncated stream at offset {p}") from e
            tag = data[p + 4 : p + 8]
            p += 12 + length
            if tag == b"IEND":
                break
            if p >= len(data):
                raise ValueError(f"frame at {start} has no IEND before EOF")
        yield start, data[start:p]
        pos = p
