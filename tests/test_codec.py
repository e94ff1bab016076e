"""Codec round-trip + fidelity invariants (FIXTURES.md invariant 3)."""

import numpy as np
import pytest

from sparkkd import codec


@pytest.mark.parametrize("fmt", sorted(codec.LOSSLESS))
@pytest.mark.parametrize("w,h", [(16, 16), (24, 16), (16, 24), (32, 32), (5, 3)])
def test_roundtrip_exact(fmt, w, h):
    rng = np.random.default_rng(hash((fmt, w, h)) % 2**32)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    enc = codec.encode(px, fmt)
    dec = codec.decode(enc, fmt, w, h)
    assert dec.shape == (h, w, 3)
    assert (dec == px).all()
    assert codec.psnr(px, dec) == float("inf")


@pytest.mark.parametrize("w,h", [(16, 16), (24, 16), (16, 24), (32, 32), (5, 3), (1, 1)])
def test_q6_lossy_roundtrip(w, h):
    """q6 is the corpus's one lossy format: bounded error, >= 40 dB on
    byte-uniform content, idempotent quantization, 3/4-of-raw payload."""
    rng = np.random.default_rng(hash(("q6", w, h)) % 2**32)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    enc = codec.encode(px, "q6")
    assert len(enc) == -(-h * w * 3 // 4) * 3  # 4 samples -> 3 bytes
    dec = codec.decode(enc, "q6", w, h)
    assert dec.shape == (h, w, 3)
    err = np.abs(dec.astype(np.int16) - px.astype(np.int16))
    assert err.max() <= 3  # bit-replication reconstruction bound
    if h * w >= 9:  # PSNR floor needs enough pixels to average
        assert codec.psnr(px, dec) >= 40.0
    # idempotent: re-encoding the decode is byte-identical
    assert codec.encode(dec, "q6") == enc
    assert (codec.decode(enc, "q6", w, h) == dec).all()


def test_q6_exact_on_quantized_values():
    """Values whose low 2 bits already equal the replicated top bits
    survive q6 exactly (so a q6->q6 transcode is the identity)."""
    codes = np.arange(64, dtype=np.uint8)
    vals = ((codes << 2) | (codes >> 4)).astype(np.uint8)
    px = np.resize(vals, (8, 8, 3)).astype(np.uint8)
    assert (codec.decode(codec.encode(px, "q6"), "q6", 8, 8) == px).all()


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
