"""Pure-stdlib image codecs (raw / BMP / PNG-zlib) + fidelity metrics.

The sandbox has no PIL/opencv, so the fixture corpus only uses formats we can
encode AND decode bit-exactly with the standard library:

* ``raw``  — packed RGB bytes, row-major, no header.
* ``bmp``  — 24-bit uncompressed Windows BMP (BITMAPINFOHEADER), bottom-up
             rows with 4-byte row padding.
* ``png``  — 8-bit RGB PNG, filter type 0 on every scanline, single IDAT,
             zlib level 6.

These are the three ``fmt`` values of the corpus schema
``(image_id, bytes, w, h, fmt, caption, phash)``.  All are lossless, so the
per-row invariant is byte/pixel exactness; ``psnr`` exists for any future
lossy format (invariant would be PSNR >= 40 dB).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------- raw


def encode_raw(pixels: np.ndarray) -> bytes:
    """pixels: uint8 array of shape (h, w, 3) -> packed RGB bytes."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    return pixels.tobytes()


def decode_raw(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------- bmp


def encode_bmp(pixels: np.ndarray) -> bytes:
    """24-bit BMP: BGR pixel order, bottom-up rows, rows padded to 4 bytes."""
    h, w, _ = pixels.shape
    row_len = w * 3
    pad = (4 - row_len % 4) % 4
    stride = row_len + pad
    img_size = stride * h
    # BGR + vertical flip
    bgr = pixels[::-1, :, ::-1]
    body = bytearray()
    zeros = b"\x00" * pad
    for r in range(h):
        body += bgr[r].tobytes() + zeros
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    assert data[:2] == b"BM"
    offset = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    assert bpp == 24, f"only 24-bit BMP supported, got {bpp}"
    row_len = w * 3
    stride = (row_len + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * abs(h), offset=offset)
    rows = rows.reshape(abs(h), stride)[:, :row_len].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ---------------------------------------------------------------- png

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, colortype 2 (RGB)
    # filter byte 0 prepended to each scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG
    pos, w, h, idat = 8, 0, 0, b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            assert depth == 8 and ctype == 2, "only 8-bit RGB PNG supported"
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    out = np.empty((h, w * 3), dtype=np.uint8)
    prior = np.zeros(w * 3, dtype=np.uint8)
    for r in range(h):  # per-scanline unfilter (h is small; vector ops per row)
        ftype, line = raw[r, 0], raw[r, 1:]
        if ftype == 0:  # None
            out[r] = line
        elif ftype == 2:  # Up
            out[r] = line + prior
        else:  # our encoder only emits 0; tolerate Up for robustness
            raise ValueError(f"unsupported PNG filter {ftype}")
        prior = out[r]
    return out.reshape(h, w, 3)


# ---------------------------------------------------------------- dispatch

FORMATS = ("raw", "bmp", "png")


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(pixels)
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "png":
        return encode_png(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "png":
        return decode_png(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
