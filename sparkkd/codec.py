"""Pure-stdlib image codecs (raw / BMP / PNG-zlib / lossy q6) + fidelity.

The sandbox has no PIL/opencv, so the fixture corpus only uses formats we can
encode AND decode deterministically with the standard library:

* ``raw``  — packed RGB bytes, row-major, no header (lossless).
* ``bmp``  — 24-bit uncompressed Windows BMP (BITMAPINFOHEADER), bottom-up
             rows with 4-byte row padding (lossless).
* ``png``  — 8-bit RGB PNG, filter type 0 on every scanline, single IDAT,
             zlib level 6 (lossless).
* ``q6``   — 6-bit-per-channel quantized RGB, four samples packed into three
             bytes (LOSSY: bounded 3-LSB error, ~44 dB PSNR on the corpus).

These are the four ``fmt`` values of the corpus schema
``(image_id, bytes, w, h, fmt, caption, phash)``.  The per-row north-rule
invariant is byte/pixel exactness for the lossless three and PSNR >= 40 dB
for q6 (``psnr`` below).
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


# ---------------------------------------------------------------- q6 (lossy)


def encode_q6(pixels: np.ndarray) -> bytes:
    """6-bit-per-channel quantized RGB — the one LOSSY corpus format.

    Drops the two low bits of every channel and packs four 6-bit values
    into three bytes (payload is exactly 3/4 of raw).  Decoding replicates
    the top bits into the dropped positions (``v<<2 | v>>4``), the standard
    bit-replication reconstruction, so the per-channel error is bounded by
    3 LSB; PSNR is ~44 dB on byte-uniform content (worst constructible
    content — every value carrying the max residue — is 38.6 dB, so the
    40 dB north-rule floor is an invariant of the corpus generator's
    pseudo-uniform patterns, asserted per-row in tests, not of the format
    in the abstract).  Quantization is
    idempotent: re-encoding a decoded q6 image is byte-identical, which
    keeps the fidelity invariant checkable without the original."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    flat = (pixels.reshape(-1) >> 2).astype(np.uint8)  # 6-bit codes
    pad = (-flat.size) % 4
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.uint8)])
    v = flat.reshape(-1, 4)
    out = np.empty((v.shape[0], 3), np.uint8)
    out[:, 0] = (v[:, 0] << 2) | (v[:, 1] >> 4)
    out[:, 1] = ((v[:, 1] & 0xF) << 4) | (v[:, 2] >> 2)
    out[:, 2] = ((v[:, 2] & 0x3) << 6) | v[:, 3]
    return out.tobytes()


def decode_q6(data: bytes, w: int, h: int) -> np.ndarray:
    b = np.frombuffer(data, np.uint8).reshape(-1, 3)
    v = np.empty((b.shape[0], 4), np.uint8)
    v[:, 0] = b[:, 0] >> 2
    v[:, 1] = ((b[:, 0] & 0x3) << 4) | (b[:, 1] >> 4)
    v[:, 2] = ((b[:, 1] & 0xF) << 2) | (b[:, 2] >> 6)
    v[:, 3] = b[:, 2] & 0x3F
    codes = v.reshape(-1)[: h * w * 3]
    return ((codes << 2) | (codes >> 4)).reshape(h, w, 3)


# ---------------------------------------------------------------- dispatch

FORMATS = ("raw", "bmp", "png", "q6")
LOSSLESS = frozenset({"raw", "bmp", "png"})


def is_lossless(fmt: str) -> bool:
    return fmt in LOSSLESS


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return encode_raw(pixels)
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "q6":
        return encode_q6(pixels)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    if fmt == "raw":
        return decode_raw(data, w, h)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "png":
        return decode_png(data)
    if fmt == "q6":
        return decode_q6(data, w, h)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf when identical."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
