"""Vendored minimal PNG codec — pure stdlib (zlib + struct) + numpy.

Exists so the real image-decode path (`operators/multimodal.py:
decode_image_real`) is runnable and CI-tested in environments without
Pillow (this container): PNG is the one format every fixture here uses,
and the full spec for it is public (W3C PNG, RFC 2083). Scope is
deliberately narrow — 8-bit, non-interlaced, color types 0/2/3/4/6,
filters 0-4 — enough for any fixture and most real-world screenshots;
anything else raises and the caller falls back to Pillow.

This is NOT a Pillow replacement: no 16-bit, no interlace (Adam7), no
gamma/ICC handling, no ancillary-chunk semantics. The encoder writes
filter-0 scanlines only (valid, just not maximally compressed).

Parity note: PNG payloads are decoded HERE even when Pillow is
importable, so a PNG-only corpus produces bit-identical features with
and without Pillow installed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel at bit depth 8, by PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Raised for malformed PNG bytes or spec features outside this
    decoder's narrow scope (16-bit, interlaced, ...)."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(
    data: bytes, width: int, height: int, bpp: int
) -> np.ndarray:
    """Reverse per-scanline filtering → (height, width*bpp) uint8."""
    stride = width * bpp
    if len(data) < height * (stride + 1):
        raise PngFormatError("truncated IDAT stream")
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = data[pos]
        line = bytearray(data[pos + 1 : pos + 1 + stride])
        pos += stride + 1
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            line = bytearray(
                (np.frombuffer(bytes(line), dtype=np.uint8) + prev).astype(
                    np.uint8
                ).tobytes()
            )
        elif ftype == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                up_left = int(prev[x - bpp]) if x >= bpp else 0
                line[x] = (
                    line[x] + _paeth(left, int(prev[x]), up_left)
                ) & 0xFF
        else:
            raise PngFormatError(f"unknown filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return out


def decode_png(raw: bytes) -> tuple[int, int, np.ndarray]:
    """PNG bytes → ``(width, height, rgb)`` with ``rgb`` a
    (height, width, 3) uint8 array. Alpha (types 4/6) is dropped —
    feature extraction here reads luminance only."""
    if raw[:8] != _SIGNATURE:
        raise PngFormatError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(raw):
        (length,), ctype = struct.unpack(">I", raw[pos : pos + 4]), raw[
            pos + 4 : pos + 8
        ]
        body = raw[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            (width, height, depth, color_type, comp, filt, interlace) = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise PngFormatError(
                    f"bit depth {depth} unsupported (8 only)"
                )
            if color_type not in _CHANNELS:
                raise PngFormatError(f"color type {color_type} unknown")
            if comp != 0 or filt != 0:
                raise PngFormatError("nonstandard compression/filter")
            if interlace != 0:
                raise PngFormatError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise PngFormatError("missing IHDR or IDAT")
    bpp = _CHANNELS[color_type]
    plane = _unfilter(
        zlib.decompress(bytes(idat)), width, height, bpp
    ).reshape(height, width, bpp)
    if color_type == 0:
        rgb = np.repeat(plane, 3, axis=2)
    elif color_type == 2:
        rgb = plane
    elif color_type == 3:
        if palette is None:
            raise PngFormatError("palette image without PLTE")
        rgb = palette[plane[:, :, 0]]
    elif color_type == 4:
        rgb = np.repeat(plane[:, :, :1], 3, axis=2)
    else:  # 6: RGBA
        rgb = plane[:, :, :3]
    return width, height, np.ascontiguousarray(rgb)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(
        ">I", crc
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 → PNG bytes (filter-0
    scanlines; valid for any reader). The fixture-side twin of
    :func:`decode_png` — self-generated test images (e.g. the
    reference's circle fixture, ``ex-vis:50-65``) need no Pillow."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError("encode_png expects (h,w) gray or (h,w,3) RGB")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * channels
    raw = bytearray()
    flat = a.reshape(h, stride)
    for y in range(h):
        raw.append(0)  # filter type None
        raw.extend(flat[y].tobytes())
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )
