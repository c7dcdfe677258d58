"""operators/phash.py — perceptual hashing and banded near-dup."""

from __future__ import annotations

import pytest

from bi_utils_spark.operators.multimodal import encode_bmp
from bi_utils_spark.operators.phash import (
    average_hash_64,
    perceptual_hashes,
    phash_near_dup_pairs,
    synthesize_phash_test_images,
)


def _img(w, h, px):
    """px(x, y) -> (r, g, b)"""
    return encode_bmp(w, h, [[px(x, y) for x in range(w)] for y in range(h)])


def test_ahash_brightness_invariance_exact():
    base = _img(16, 16, lambda x, y: (10 * (x % 7), 5 * (y % 9), 30))
    shifted = _img(16, 16, lambda x, y: (10 * (x % 7) + 25, 5 * (y % 9) + 25, 55))
    assert average_hash_64(base) == average_hash_64(shifted)


def test_ahash_distinguishes_structure():
    left = _img(16, 16, lambda x, y: (255 if x < 8 else 0, 0, 0))
    top = _img(16, 16, lambda x, y: (255 if y < 8 else 0, 0, 0))
    hl, ht = average_hash_64(left), average_hash_64(top)
    assert hl != ht
    # left-bright: bits set exactly in grid columns 0-3 of every row
    assert hl == sum(
        1 << (63 - (gy * 8 + gx)) for gy in range(8) for gx in range(4)
    )


def test_ahash_uniform_image_is_zero():
    assert average_hash_64(_img(8, 8, lambda x, y: (7, 7, 7))) == 0


def test_ahash_rejects_non_bmp():
    with pytest.raises(ValueError):
        average_hash_64(b"not a bitmap")


def test_near_dup_pairs_and_banding(spark):
    rows = [
        ("a", 0x0F0F0F0F0F0F0F0F),
        ("b", 0x0F0F0F0F0F0F0F0E),  # hamming 1 from a
        ("c", 0x0F0F0F0F0F0F0F0C),  # hamming 2 from a, 1 from b
        ("d", -1),  # all-ones: far from all
    ]
    hashes = spark.createDataFrame(rows, "media_id string, phash long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_near_dup_pairs(hashes, max_hamming=3).collect()
    }
    assert got == {("a", "b"): 1, ("a", "c"): 2, ("b", "c"): 1}


def test_near_dup_bad_args(spark):
    hashes = spark.createDataFrame([("a", 1)], "media_id string, phash long")
    with pytest.raises(ValueError):
        phash_near_dup_pairs(hashes, max_hamming=4, bands=4)
    with pytest.raises(ValueError):
        phash_near_dup_pairs(hashes, bands=3)


def test_bucket_cap_drops_hot_bucket(spark):
    # 5 identical hashes -> every band-bucket has 5 rows; cap at 4
    # drops them all, an explicit recall-for-skew trade
    rows = [(str(i), 42) for i in range(5)]
    hashes = spark.createDataFrame(rows, "media_id string, phash long")
    assert (
        phash_near_dup_pairs(hashes, max_bucket_size=4).count() == 0
    )
    assert phash_near_dup_pairs(hashes).count() == 10


def test_synthesis_round_trip(spark):
    docs = spark.range(0, 120).selectExpr("id as doc_id")
    media = synthesize_phash_test_images(docs)
    hashes = perceptual_hashes(media).collect()
    assert len(hashes) == 120
    by_id = {int(r["media_id"]): r["phash"] for r in hashes}
    # ids 120 apart share (cls, tier); ids 50 apart share cls only —
    # both must collide perceptually (brightness invariance)
    assert by_id[0] == by_id[50] == by_id[100]
    assert by_id[3] == by_id[53]
    # distinct classes must not collide
    assert by_id[0] != by_id[1]


def test_ahash_png_equals_bmp_of_same_pixels():
    """VERDICT r4 #2 acceptance: the aHash of a PNG must be
    bit-identical to the aHash of the BMP encoding of the same
    pixels, for every PNG filter type — the hash is a function of
    pixels, not encoding."""
    from bi_utils_spark.operators.multimodal import encode_png

    px = lambda x, y: (10 * (x % 7), 5 * (y % 9), (x * y) % 200)  # noqa: E731
    rows = [[px(x, y) for x in range(16)] for y in range(16)]
    want = average_hash_64(encode_bmp(16, 16, rows))
    for ft in range(5):
        assert average_hash_64(encode_png(16, 16, rows, filter_type=ft)) == want


def test_mixed_format_corpus_hashes_uniformly(spark):
    # tier 1 encodes as PNG, tier 2 as GIF (BMP when >256 colors),
    # tier 0 as BMP: same class must still collide across the codec
    # boundary, and payload bytes must stay injective in (cls, tier)
    docs = spark.range(0, 150).selectExpr("id as doc_id")
    media = synthesize_phash_test_images(docs).collect()
    payloads = {(r["cls"], r["tier"]): bytes(r["payload"]) for r in media}
    pngs = [p for (c, t), p in payloads.items() if t == 1]
    bmps = [p for (c, t), p in payloads.items() if t == 0]
    gifs = [p for (c, t), p in payloads.items() if t == 2]
    assert pngs and all(p[:4] == b"\x89PNG"[:4] for p in pngs)
    assert bmps and all(p[:2] == b"BM" for p in bmps)
    assert gifs and any(p[:6] == b"GIF89a" for p in gifs)  # GIF coverage
    assert all(p[:6] == b"GIF89a" or p[:2] == b"BM" for p in gifs)
    assert len(set(payloads.values())) == len(payloads)  # injectivity
    hashes = {
        (r["cls"], r["tier"]): average_hash_64(bytes(r["payload"])) for r in media
    }
    for (c, t), hv in hashes.items():
        assert hv == hashes[(c, 0)], f"class {c} tier {t} broke across codecs"
