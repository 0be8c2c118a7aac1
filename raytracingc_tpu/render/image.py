"""Image writeback: tonemap and BMP/PNG encoding.

The reference tonemaps linear radiance to bytes with a clamp and ×255 — no
gamma correction (``floatToUint``, ``moremath.c:25-30``: negative → 0,
``f >= 1`` → 255, else ``(uint8)(f * 255)`` which truncates) — and writes a
24-bit BMP via the vendored stb writer (``main.c:305``). Here the BMP encoder
is a small self-contained implementation of the standard BITMAPINFOHEADER
format (bottom-up BGR rows, 4-byte row alignment); PNG output goes through the
standard-library ``zlib`` with stored-or-deflate idat, no external deps.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def tonemap_to_bytes(linear: np.ndarray) -> np.ndarray:
    """Linear [H, W, 3] float → uint8, reference ``floatToUint`` semantics."""
    f = np.asarray(linear, np.float32)
    out = np.where(f >= 1.0, 255, np.trunc(np.maximum(f, 0.0) * 255.0)).astype(np.uint8)
    return out


def write_bmp(path: str, pixels: np.ndarray) -> None:
    """Write a 24-bit BMP. ``pixels`` is [H, W, 3] uint8 RGB, row 0 = top."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) & ~3
    image_size = row_bytes * h
    file_size = 54 + image_size
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM",
        file_size,
        0,
        0,
        54,  # pixel data offset
        40,  # BITMAPINFOHEADER size
        w,
        h,
        1,  # planes
        24,  # bpp
        0,  # BI_RGB
        image_size,
        2835,  # ~72 DPI
        2835,
        0,
        0,
    )
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    padded = np.zeros((h, row_bytes), np.uint8)
    padded[:, : w * 3] = bgr.reshape(h, w * 3)
    with open(path, "wb") as fh:
        fh.write(header)
        fh.write(padded.tobytes())


def read_bmp(path: str) -> np.ndarray:
    """Read a 24-bit uncompressed BMP back to [H, W, 3] uint8 RGB (top-down)."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:2] != b"BM":
        raise ValueError(f"{path}: not a BMP file")
    offset = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    if bpp != 24:
        raise ValueError(f"{path}: only 24-bit BMPs supported (got {bpp})")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, np.uint8, count=row_bytes * h, offset=offset)
    img = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    return img[::-1] if flip else img


def write_png(path: str, pixels: np.ndarray) -> None:
    """Write an RGB8 PNG using zlib only. ``pixels`` is [H, W, 3] uint8."""
    h, w, _ = pixels.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", ihdr))
        fh.write(chunk(b"IDAT", zlib.compress(raw, 6)))
        fh.write(chunk(b"IEND", b""))


def write_image(path: str, pixels: np.ndarray) -> None:
    """Dispatch on extension: .bmp (default, like the reference) or .png."""
    if path.lower().endswith(".png"):
        write_png(path, pixels)
    else:
        write_bmp(path, pixels)
