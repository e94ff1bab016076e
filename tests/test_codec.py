"""Codec round-trip + fidelity invariants (FIXTURES.md invariant 3)."""

import numpy as np
import pytest

from sparkkd import codec


@pytest.mark.parametrize("fmt", codec.FORMATS)
@pytest.mark.parametrize("w,h", [(16, 16), (24, 16), (16, 24), (32, 32), (5, 3)])
def test_roundtrip_exact(fmt, w, h):
    rng = np.random.default_rng(hash((fmt, w, h)) % 2**32)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    enc = codec.encode(px, fmt)
    dec = codec.decode(enc, fmt, w, h)
    assert dec.shape == (h, w, 3)
    assert (dec == px).all()
    assert codec.psnr(px, dec) == float("inf")


def test_psnr_lossy_threshold():
    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    noisy = np.clip(px.astype(np.int16) + rng.integers(-2, 3, px.shape), 0, 255)
    assert codec.psnr(px, noisy.astype(np.uint8)) >= 40.0


def test_bmp_header_is_standard():
    px = np.zeros((4, 3, 3), dtype=np.uint8)
    b = codec.encode_bmp(px)
    assert b[:2] == b"BM"
    # rows padded to 4 bytes: 3*3=9 -> stride 12
    assert len(b) == 14 + 40 + 12 * 4
