"""Dependency-free media codecs, pure numpy + stdlib: PPM/PGM images,
BMP (24-bit uncompressed), WAV (PCM16 mono/stereo).

These are real byte-level formats, so the multimodal operators parse
genuine headers and pixel/sample planes without any image/audio
library. Formats outside this set (JPEG/PNG/MP4/...) raise
:class:`UnsupportedMediaError` — the documented seam where PIL /
torchaudio / pyav would plug in on a production image.
"""

from __future__ import annotations

import struct

import numpy as np


class UnsupportedMediaError(NotImplementedError):
    """Raised for media formats the built-in numpy codecs can't parse."""


# -- PPM / PGM (netpbm binary) ------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def encode_pgm(pixels: np.ndarray) -> bytes:
    """(h, w) uint8 → binary PGM (P5)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    return b"P5\n%d %d\n255\n" % (w, h) + px.tobytes()


def _pnm_header(data: bytes) -> tuple[list[int], int]:
    """Parse the 3 header ints (w, h, maxval) after the magic, skipping
    whitespace and # comments; returns (ints, offset_of_pixel_data)."""
    vals: list[int] = []
    i = 2  # past magic
    n = len(data)
    while len(vals) < 3 and i < n:
        c = data[i : i + 1]
        if c == b"#":
            while i < n and data[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and data[j : j + 1].isdigit():
                j += 1
            vals.append(int(data[i:j]))
            i = j
        else:
            raise UnsupportedMediaError(f"bad PNM header byte {c!r}")
    if len(vals) < 3 or i >= n:
        raise UnsupportedMediaError("truncated PNM header")
    return vals, i + 1  # single whitespace after maxval


def decode_ppm(data: bytes) -> dict:
    (w, h, maxval), off = _pnm_header(data)
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PNM not supported")
    need = w * h * 3
    buf = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return {"format": "ppm", "width": w, "height": h,
            "pixels": buf.reshape(h, w, 3)}


def decode_pgm(data: bytes) -> dict:
    (w, h, maxval), off = _pnm_header(data)
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PNM not supported")
    buf = np.frombuffer(data, dtype=np.uint8, count=w * h, offset=off)
    return {"format": "pgm", "width": w, "height": h,
            "pixels": buf.reshape(h, w)}


# -- BMP (Windows, 24bpp uncompressed) ---------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (bottom-up, BGR,
    rows padded to 4 bytes)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    row_bytes = w * 3
    pad = (4 - row_bytes % 4) % 4
    # bottom-up row order, RGB→BGR
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += px[y, :, ::-1].tobytes()
        body += b"\x00" * pad
    data_off = 14 + 40
    size = data_off + len(body)
    file_hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, data_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + bytes(body)


def decode_bmp(data: bytes) -> dict:
    if data[:2] != b"BM" or len(data) < 54:
        raise UnsupportedMediaError("not a BMP")
    data_off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(f"only 24bpp uncompressed BMP (got {bpp}bpp)")
    top_down = h < 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + (4 - row_bytes % 4) % 4
    rows = []
    for y in range(h):
        off = data_off + y * stride
        row = np.frombuffer(data, dtype=np.uint8, count=row_bytes, offset=off)
        rows.append(row.reshape(w, 3)[:, ::-1])  # BGR→RGB
    px = np.stack(rows if top_down else rows[::-1])
    return {"format": "bmp", "width": w, "height": h, "pixels": px}


# -- WAV (RIFF PCM16) --------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """1-D int16 mono samples → RIFF/WAVE PCM16."""
    s = np.asarray(samples, dtype="<i2")
    body = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> dict:
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise UnsupportedMediaError("not a WAV")
    i, n = 12, len(data)
    sample_rate = channels = bits = None
    samples = None
    while i + 8 <= n:
        cid = data[i : i + 4]
        (clen,) = struct.unpack_from("<I", data, i + 4)
        body_off = i + 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", data, body_off
            )
            bits = struct.unpack_from("<H", data, body_off + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise UnsupportedMediaError("only PCM16 WAV supported")
        elif cid == b"data":
            count = clen // 2
            samples = np.frombuffer(data, dtype="<i2", count=count, offset=body_off)
        i = body_off + clen + (clen % 2)  # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise UnsupportedMediaError("WAV missing fmt/data chunk")
    if channels and channels > 1:
        samples = samples.reshape(-1, channels)
    return {
        "format": "wav",
        "sample_rate": int(sample_rate),
        "channels": int(channels or 1),
        "n_samples": int(len(samples)),
        "samples": samples,
    }


# -- sniffing ----------------------------------------------------------------


def sniff(data: bytes) -> str | None:
    if data is None or len(data) < 12:
        return None
    if data[:2] == b"P6":
        return "ppm"
    if data[:2] == b"P5":
        return "pgm"
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


_DECODERS = {"ppm": decode_ppm, "pgm": decode_pgm, "bmp": decode_bmp, "wav": decode_wav}


def decode_any(data: bytes) -> dict:
    """Sniff the format by magic bytes and decode; raises
    :class:`UnsupportedMediaError` for anything the numpy codecs can't
    handle (the real-codec seam)."""
    kind = sniff(data)
    if kind is None:
        raise UnsupportedMediaError(
            "unrecognized media format (built-in codecs: PPM/PGM/BMP/WAV); "
            "pass codec= to decode_media to plug in a real library"
        )
    return _DECODERS[kind](data)
