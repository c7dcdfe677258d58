"""operators/multimodal.py — zero-dep baseline JPEG codec (T.81).

The exactness anchor: at quality=100 every quant entry is 1, so
grayscale images made of flat 8x8 tiles round-trip BIT-EXACTLY —
which is what q_jpeg_roundtrip's closed-form oracle relies on.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bi_utils_spark.operators.multimodal import (
    _JPEG_ZZ,
    _decode_jpeg_raw,
    decode_image_pixels,
    decode_jpeg,
    decode_jpeg_pixels,
    encode_bmp,
    encode_jpeg,
    sniff_image_meta,
)
from bi_utils_spark.operators.phash import average_hash_64


def _mosaic_rows(w: int, h: int, seed: int) -> list[list[int]]:
    """Grayscale image of flat 8x8 tiles; w, h multiples of 8."""
    tiles_x = w // 8
    return [
        [(seed * 31 + ((y // 8) * tiles_x + x // 8) * 97) % 256 for x in range(w)]
        for y in range(h)
    ]


def _flat_pixels(recon: bytes, w: int, h: int) -> list[int]:
    return [recon[y * w + x] for y in range(h) for x in range(w)]


def test_gray_mosaic_roundtrip_exact():
    rows = _mosaic_rows(32, 24, seed=5)
    payload = encode_jpeg(32, 24, rows, quality=100)
    w, h, ch, recon = _decode_jpeg_raw(payload)
    assert (w, h, ch) == (32, 24, 1)
    assert _flat_pixels(recon, 32, 24) == [v for r in rows for v in r]


def test_restart_interval_roundtrip_exact():
    rows = _mosaic_rows(24, 16, seed=11)
    plain = encode_jpeg(24, 16, rows, quality=100)
    rst = encode_jpeg(24, 16, rows, quality=100, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xdd" not in plain  # DRI emitted
    assert _decode_jpeg_raw(rst)[3] == _decode_jpeg_raw(plain)[3]


@settings(max_examples=25, deadline=None)
@given(
    tx=st.integers(1, 4),
    ty=st.integers(1, 3),
    seed=st.integers(0, 10_000),
)
def test_property_flat_tile_mosaics_always_exact(tx, ty, seed):
    w, h = 8 * tx, 8 * ty
    rows = _mosaic_rows(w, h, seed)
    _, _, _, recon = _decode_jpeg_raw(encode_jpeg(w, h, rows, quality=100))
    assert _flat_pixels(recon, w, h) == [v for r in rows for v in r]


def test_arbitrary_gray_q100_error_at_most_one():
    # non-flat blocks, odd dims (edge-replicated padding): |err| <= 1
    rows = [[(x * 37 + y * 91 + x * y) % 256 for x in range(19)] for y in range(11)]
    _, _, _, recon = _decode_jpeg_raw(encode_jpeg(19, 11, rows, quality=100))
    errs = [abs(recon[y * 19 + x] - rows[y][x]) for y in range(11) for x in range(19)]
    assert max(errs) <= 1


def test_lossy_quality_bounded_error_and_smaller_file():
    rows = [[min(255, x * 8 + y * 2) for x in range(32)] for y in range(24)]
    hi = encode_jpeg(32, 24, rows, quality=100)
    lo = encode_jpeg(32, 24, rows, quality=75)
    assert len(lo) < len(hi)
    _, _, _, recon = _decode_jpeg_raw(lo)
    errs = [abs(recon[y * 32 + x] - rows[y][x]) for y in range(24) for x in range(32)]
    assert max(errs) <= 12  # smooth gradient at q75 stays close


def test_flat_color_444_and_420_roundtrip():
    rows = [[(200, 30, 90)] * 16 for _ in range(16)]
    for sub in ("4:4:4", "4:2:0"):
        w, h, ch, recon = _decode_jpeg_raw(
            encode_jpeg(16, 16, rows, quality=100, subsampling=sub)
        )
        assert (w, h, ch) == (16, 16, 3)
        errs = [
            abs(recon[3 * i + c] - (200, 30, 90)[c])
            for i in range(16 * 16)
            for c in range(3)
        ]
        assert max(errs) <= 1  # YCbCr round-trip rounding only


def test_color_420_odd_dims_bounded_error():
    rows = [
        [(min(255, x * 5), min(255, y * 7), 128) for x in range(21)]
        for y in range(19)
    ]
    w, h, ch, recon = _decode_jpeg_raw(
        encode_jpeg(21, 19, rows, quality=95, subsampling="4:2:0")
    )
    assert (w, h, ch) == (21, 19, 3)
    errs = [
        abs(recon[3 * (y * 21 + x) + c] - rows[y][x][c])
        for y in range(19)
        for x in range(21)
        for c in range(3)
    ]
    assert max(errs) <= 10  # chroma is box-averaged then replicated


def test_pixel_contract_matches_bmp_and_ahash_is_encoding_agnostic():
    # same pixels as gray RGB through the BMP encoder: identical luma,
    # identical perceptual hash — the decode_image_pixels contract.
    rows = _mosaic_rows(32, 24, seed=9)
    jpeg = encode_jpeg(32, 24, rows, quality=100)
    bmp = encode_bmp(32, 24, [[(v, v, v) for v in r] for r in rows])
    assert decode_image_pixels(jpeg) == decode_image_pixels(bmp)
    assert average_hash_64(jpeg) == average_hash_64(bmp)


def test_decode_jpeg_report_and_sniff_agree():
    rows = _mosaic_rows(16, 16, seed=3)
    payload = encode_jpeg(16, 16, rows, quality=100)
    d = decode_jpeg(payload)
    flat = [v for r in rows for v in r]
    assert d["width"] == 16 and d["height"] == 16 and d["n_px"] == 256
    assert d["mean_r"] == d["mean_g"] == d["mean_b"] == sum(flat) / 256
    meta = sniff_image_meta(payload)
    assert meta == {"format": "jpeg", "width": 16, "height": 16}


def test_sixteen_bit_dqt_entries_decode():
    # rewrite the encoder's 8-bit DQT segment as a Pq=1 (16-bit) one:
    # a real decoder must accept both precisions (T.81 B.2.4.1).
    rows = _mosaic_rows(16, 16, seed=21)
    payload = bytearray(encode_jpeg(16, 16, rows, quality=100))
    i = payload.find(b"\xff\xdb")
    assert i >= 0
    zz8 = payload[i + 5 : i + 5 + 64]
    seg16 = (
        b"\xff\xdb"
        + struct.pack(">HB", 2 + 1 + 128, 0x10)
        + struct.pack(">64H", *zz8)
    )
    patched = bytes(payload[:i]) + seg16 + bytes(payload[i + 69 :])
    assert _decode_jpeg_raw(patched)[3] == _decode_jpeg_raw(bytes(payload))[3]


def test_progressive_rejected_with_clear_error():
    rows = _mosaic_rows(16, 16, seed=1)
    payload = bytearray(encode_jpeg(16, 16, rows, quality=100))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError, match="progressive"):
        _decode_jpeg_raw(bytes(payload))


def test_malformed_streams_raise():
    rows = _mosaic_rows(16, 16, seed=2)
    payload = encode_jpeg(16, 16, rows, quality=100)
    with pytest.raises(ValueError, match="SOI"):
        _decode_jpeg_raw(b"\x00" + payload)
    with pytest.raises(ValueError):
        _decode_jpeg_raw(payload[:40])  # cut inside the headers
    with pytest.raises(ValueError, match="truncated JPEG entropy"):
        # keep the SOS header + one entropy byte, drop the rest
        _decode_jpeg_raw(payload[: payload.find(b"\xff\xda") + 11])
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"GIF89a" + b"\x00" * 20)


def test_zigzag_is_a_permutation():
    assert sorted(_JPEG_ZZ) == list(range(64))
    # spec spot checks: the first diagonal and the last entry
    assert _JPEG_ZZ[:6] == (0, 1, 8, 16, 9, 2)
    assert _JPEG_ZZ[63] == 63
