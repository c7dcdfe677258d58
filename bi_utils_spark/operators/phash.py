"""Perceptual-hash image near-duplicate detection (aHash + banded LSH).

The image-side counterpart of the text near-dup tier (operators/
dedup.py): multimodal corpora dedup on *perceptual* identity — the
same picture re-encoded, brightness-shifted or re-scaled should
collide even though the payload bytes differ. Standard pipeline:
64-bit perceptual hash per image, Hamming-distance candidate search
via banded LSH, exact verification.

Hash: 8×8 block-mean average-hash (aHash — the classic public
construction). The image is divided into an 8×8 grid (cell x spans
pixel columns [⌊i·w/8⌋, ⌊(i+1)·w/8⌋)), bit = 1 iff the cell's mean
luma exceeds the global mean. All comparisons are EXACT integer
cross-products (cell_sum · n_total > total_sum · n_cell) — no float
rounding, so the hash is bit-deterministic across platforms, and a
uniform brightness shift provably cannot flip any bit (both means
shift equally). Luma = r+g+b (unnormalized — scale-free under the
comparison).

Candidate search at scale: the 64-bit hash splits into ``bands``
segments; rows shuffle on (band, segment_value) and only same-bucket
pairs are generated — the simhash_near_dup discipline (dedup.py). By
pigeonhole, any pair within Hamming ≤ bands−1 shares at least one
exact band, so with the default 4 bands the candidate stage is
LOSSLESS for max_hamming ≤ 3; verification computes the exact
Hamming distance (bit_count of xor) JVM-side. No all-pairs join
anywhere; hot buckets (e.g. flat images hashing to 0) can be capped
with ``max_bucket_size`` — candidates lost to a cap reduce recall,
never correctness of reported pairs.

Decoding runs inside Arrow batches via mapInPandas; only (id, 64-bit
hash) leaves Python, so the shuffled state per image is 16 bytes no
matter the payload size.

No reference counterpart; north-star multimodal-pipeline surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bi_utils_spark.operators.multimodal import decode_image_pixels


def average_hash_64(payload: bytes) -> int:
    """64-bit aHash of a BMP or PNG payload (format-sniffed; the hash
    is a function of PIXELS, so the same picture hashes identically
    however encoded) — exact integer arithmetic only (see module
    docstring). Bit (8·gy + gx), MSB-first, covers grid cell
    (gx, gy); cells empty because the image is narrower than the grid
    contribute 0 bits. Raises ValueError on undecodable input."""
    w, h, luma = decode_image_pixels(payload)
    n = w * h
    if 8 <= w and 8 <= h and n <= 1 << 26:
        # (images over ~67 MP take the unbounded-int path below so the
        # cross-product compare cannot overflow int64)
        # vectorized grid sums (r12, guide §4.2): two reduceat passes
        # over the int64 pixel matrix replace the per-cell Python
        # generator sums — exact integer arithmetic, same cells
        import numpy as np

        A = np.asarray(luma, dtype=np.int64).reshape(h, w)
        xs = [gx * w // 8 for gx in range(8)]
        ys = [gy * h // 8 for gy in range(8)]
        cols = np.add.reduceat(A, xs, axis=1)  # h×8
        cells = np.add.reduceat(cols, ys, axis=0)  # 8×8 cell sums
        total = int(A.sum())
        n_cells = np.outer(
            np.diff(ys + [h]), np.diff(xs + [w])
        ).astype(np.int64)
        # cell/n_cell > total/n, cross-multiplied: exact in int
        mask = cells * n > total * n_cells
        bits = 0
        for gy in range(8):
            for gx in range(8):
                if mask[gy, gx]:
                    bits |= 1 << (63 - (gy * 8 + gx))
        return bits
    total = sum(luma)
    bits = 0
    for gy in range(8):
        y0, y1 = gy * h // 8, (gy + 1) * h // 8
        for gx in range(8):
            x0, x1 = gx * w // 8, (gx + 1) * w // 8
            n_cell = (y1 - y0) * (x1 - x0)
            if n_cell == 0:
                continue
            cell = sum(
                luma[y * w + x] for y in range(y0, y1) for x in range(x0, x1)
            )
            # cell/n_cell > total/n, cross-multiplied: exact in int
            if cell * n > total * n_cell:
                bits |= 1 << (63 - (gy * 8 + gx))
    return bits


def perceptual_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, phash) for every decodable image row; undecodable payloads
    are dropped (count them upstream via media_stats if needed). The
    hash is returned as a signed 64-bit long (bit 63 may set the sign
    — equality, banding and xor are unaffected)."""
    out_schema = f"{id_col} string, phash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-task memo keyed on payload bytes: the hash is a pure
        # function of the payload, and dedup corpora repeat payloads
        # by definition — every repeat skips the decode entirely
        # (r12, guide §4.5 heavyweight-work-once discipline). _MISS
        # marks undecodable payloads so they aren't re-tried either.
        memo: dict[bytes, int | None] = {}

        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                key = bytes(payload)
                if key in memo:
                    hv = memo[key]
                else:
                    try:
                        hv = average_hash_64(key)
                    except ValueError:
                        hv = None
                    memo[key] = hv
                if hv is None:
                    continue
                ids.append(str(mid))
                # wrap to signed 64-bit for the long column
                hashes.append(hv - (1 << 64) if hv >= 1 << 63 else hv)
            yield pd.DataFrame({id_col: ids, "phash": pd.array(hashes, dtype="int64")})

    return media.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def synthesize_phash_test_images(
    df: DataFrame,
    id_col: str = "doc_id",
    n_classes: int = 50,
    n_tiers: int = 3,
    shift: int = 9,
) -> DataFrame:
    """Deterministic near-dup image corpus built with the real
    encoders: every row becomes an image whose content depends ONLY
    on (class, tier) with class = id % n_classes and tier =
    (id // n_classes) % n_tiers. Same class ⇒ same picture up to a
    uniform brightness shift of tier·``shift`` — a PERCEPTUAL
    duplicate that aHash provably hashes identically (exact mean
    comparison, no clamping: base channels < 200 and tier·shift ≤ 18)
    while the payload bytes differ. Tier 1 encodes as PNG, tier 2 as
    GIF when the image fits a 256-color palette (lossless by
    construction; falls back to BMP for palette-overflow classes),
    tier 0 as BMP — so the corpus is MIXED-FORMAT across three codecs
    and the pipeline proves the hash is a function of pixels, not
    encoding (payloads stay injective in (class, tier): distinct
    formats can't produce equal bytes, and within a format distinct
    (class, tier) means distinct pixels). Pixels are md5-seeded per
    (class, x, y), so
    distinct classes are distinct pictures — near-dup truth is pure
    id arithmetic, which is what makes q_phash_near_dup's oracle
    closed-form.

    Dims: w = class % 13 + 8, h = class % 11 + 8 (≥ 8 so every aHash
    grid cell is non-empty)."""
    out_schema = "media_id string, cls int, tier int, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        cache: dict[tuple[int, int], bytes] = {}

        def payload_for(cls: int, tier: int) -> bytes:
            key = (cls, tier)
            if key not in cache:
                from bi_utils_spark.operators.multimodal import (
                    encode_bmp,
                    encode_gif,
                    encode_png,
                )

                w, h = cls % 13 + 8, cls % 11 + 8
                add = tier * shift
                rows = []
                for y in range(h):
                    row = []
                    for x in range(w):
                        d = hashlib.md5(f"{cls},{x},{y}".encode()).digest()
                        row.append(
                            (d[0] % 200 + add, d[1] % 200 + add, d[2] % 200 + add)
                        )
                    rows.append(row)
                if tier == 1:
                    enc = encode_png
                elif tier == 2 and len({px for r in rows for px in r}) <= 256:
                    enc = encode_gif
                else:
                    enc = encode_bmp
                cache[key] = enc(w, h, rows)
            return cache[key]

        for pdf in batches:
            ids, clss, tiers, payloads = [], [], [], []
            for raw in pdf[id_col]:
                i = int(raw)
                cls, tier = i % n_classes, (i // n_classes) % n_tiers
                ids.append(str(i))
                clss.append(cls)
                tiers.append(tier)
                payloads.append(payload_for(cls, tier))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "cls": pd.array(clss, dtype="int32"),
                    "tier": pd.array(tiers, dtype="int32"),
                    "payload": payloads,
                }
            )

    return df.select(id_col).mapInPandas(run, schema=out_schema)


def phash_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_size: int | None = None,
    hash_col: str = "phash",
) -> DataFrame:
    """(id_a, id_b, hamming) — unordered near-dup pairs with Hamming
    distance ≤ ``max_hamming``, found via banded LSH over the 64-bit
    hash. Lossless for ``max_hamming < bands`` (pigeonhole); larger
    thresholds trade recall and raise ValueError unless explicitly
    allowed by raising ``bands``.

    Works on ANY 64-bit signature column (``hash_col``) — perceptual
    image hashes here, embedding SimHash signatures in embsig.py.

    Shuffle key is (band, segment) — 16-bit segments with 4 bands, so
    bucket counts stay bounded for natural image corpora;
    ``max_bucket_size`` drops degenerate hot buckets (flat images)
    via an aggregate + broadcast anti-join, the dedup.py cap
    discipline."""
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs > {max_hamming} bands for a "
            f"lossless candidate stage (got bands={bands})"
        )
    if 64 % bands != 0:
        raise ValueError("bands must divide 64")
    seg_bits = 64 // bands
    mask = (1 << seg_bits) - 1
    segs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col(hash_col), b * seg_bits)
            .bitwiseAND(F.lit(mask))
            .alias("seg"),
        )
        for b in range(bands)
    ]
    exploded = hashes.select(
        F.col(id_col), F.col(hash_col), F.explode(F.array(*segs)).alias("bs")
    ).select(
        id_col, hash_col, F.col("bs.band").alias("band"), F.col("bs.seg").alias("seg")
    )
    if max_bucket_size is not None:
        big = (
            exploded.groupBy("band", "seg")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") > max_bucket_size)
            .select("band", "seg")
        )
        exploded = exploded.join(F.broadcast(big), ["band", "seg"], "left_anti")
    left = exploded.select(
        "band", "seg", F.col(id_col).alias("id_a"), F.col(hash_col).alias("__ha")
    )
    right = exploded.select(
        "band", "seg", F.col(id_col).alias("id_b"), F.col(hash_col).alias("__hb")
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        left.join(right, ["band", "seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(ham <= max_hamming)
        .select("id_a", "id_b", ham.alias("hamming"))
        .distinct()
    )
