"""Vendored PNG codec tests: encoder/decoder round-trips, all five
scanline filters (forward-filtered in the test, decoder must invert),
palette images, and the documented scope rejections."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from genai_batch_processor_spark.functions import png


def test_roundtrip_gray_and_rgb():
    g = ((np.arange(30 * 40).reshape(30, 40) * 7) % 251).astype(np.uint8)
    w, h, rgb = png.decode_png(png.encode_png(g))
    assert (w, h) == (40, 30)
    for c in range(3):
        assert np.array_equal(rgb[:, :, c], g)
    rng = np.random.default_rng(11)
    col = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    w, h, rgb = png.decode_png(png.encode_png(col))
    assert (w, h) == (23, 17) and np.array_equal(rgb, col)


def _forward_filter(row, prev, bpp, ftype):
    """Spec-side forward filter (the encoder side the vendored encoder
    doesn't implement beyond type 0) — gives the decoder real type
    1-4 scanlines to invert."""
    out = bytearray()
    for x in range(len(row)):
        left = row[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            p = left + up - ul
            pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
            pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
        out.append((row[x] - pred) & 0xFF)
    return out


@pytest.mark.parametrize("color_type,bpp", [(0, 1), (2, 3), (6, 4)])
def test_decoder_inverts_every_filter_type(color_type, bpp):
    rng = np.random.default_rng(5 + color_type)
    h, w = 11, 13
    pixels = rng.integers(0, 256, size=(h, w * bpp), dtype=np.uint8)
    raw = bytearray()
    prev = bytes(w * bpp)
    for y in range(h):
        ftype = y % 5  # cycle through all five filter types
        raw.append(ftype)
        raw.extend(_forward_filter(pixels[y].tobytes(), prev, bpp, ftype))
        prev = pixels[y].tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    dw, dh, rgb = png.decode_png(data)
    assert (dw, dh) == (w, h)
    plane = pixels.reshape(h, w, bpp)
    if color_type == 0:
        assert np.array_equal(rgb[:, :, 0], plane[:, :, 0])
    else:
        assert np.array_equal(rgb, plane[:, :, :3])  # alpha dropped


def test_palette_image_decodes_through_plte():
    h, w = 4, 6
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    idx = (np.arange(h * w) % 3).astype(np.uint8).reshape(h, w)
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(idx[y].tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    dw, dh, rgb = png.decode_png(data)
    assert (dw, dh) == (w, h)
    assert np.array_equal(rgb, palette[idx])


def test_scope_rejections():
    with pytest.raises(png.PngFormatError, match="signature"):
        png.decode_png(b"JFIF not a png")
    ok = png.encode_png(np.zeros((2, 2), dtype=np.uint8))
    # flip bit depth to 16 in IHDR (offset: 8 sig + 8 hdr + 8 w/h)
    bad_depth = bytearray(ok)
    bad_depth[8 + 8 + 8] = 16
    with pytest.raises(png.PngFormatError, match="depth"):
        png.decode_png(bytes(bad_depth))
    interlaced = bytearray(ok)
    interlaced[8 + 8 + 12] = 1
    with pytest.raises(png.PngFormatError, match="interlaced"):
        png.decode_png(bytes(interlaced))
    with pytest.raises(ValueError, match="gray"):
        png.encode_png(np.zeros((2, 2, 4), dtype=np.uint8))
