"""Baseline JPEG codec tests (`functions/jpeg.py`): round-trip error
bounds, marker structure, restart intervals, edge dimensions, honest
NotImplementedError tiers, and the media-stage integration."""

import numpy as np
import pytest

from document_ai_ray.functions.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            (xx + yy) * 255 // max(w + h - 2, 1),
        ],
        axis=-1,
    ).astype(np.uint8)


def test_roundtrip_gradient_bounds():
    img = _gradient(40, 56)
    for q, sub, bound in [(95, False, 4), (95, True, 10), (85, False, 6), (50, True, 20)]:
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= bound, (q, sub, err.max())


def test_flat_color_exact():
    flat = np.full((16, 24, 3), 130, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, quality=90)), flat)


def test_quality_monotone_error():
    img = _gradient(48, 48)
    errs = []
    for q in (30, 60, 95):
        out = decode_jpeg(encode_jpeg(img, quality=q, subsample=False))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def test_grayscale_roundtrip():
    g = _gradient(33, 41)[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (33, 41, 3)
    # all three channels equal (gray replicated), close to the source
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 3


def test_odd_dimensions_padding():
    rng = np.random.RandomState(7)
    for shape in [(1, 1), (7, 13), (9, 9), (1, 20), (20, 1), (17, 31)]:
        img = rng.randint(0, 256, (*shape, 3), np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=95, subsample=False))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 25


def test_restart_interval_bitstream_equivalent():
    img = _gradient(50, 70)
    base = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    for ri in (1, 2, 7):
        b = encode_jpeg(img, quality=90, subsample=True, restart_interval=ri)
        assert b"\xff\xdd" in b  # DRI marker emitted
        assert np.array_equal(decode_jpeg(b), base)


def test_marker_structure():
    b = encode_jpeg(_gradient(16, 16), quality=80)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in b


def test_not_a_jpeg_and_unsupported_tiers():
    with pytest.raises(ValueError):
        decode_jpeg(b"PK\x03\x04 not a jpeg")
    # flip SOF0 -> SOF9 (arithmetic coding): honest NotImplementedError tier
    b = bytearray(encode_jpeg(_gradient(16, 16)))
    b[b.index(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(b))


def test_progressive_roundtrip_matches_baseline():
    # Progressive re-codes the SAME quantized coefficients, so decode
    # must be pixel-identical to the baseline decode.
    img = _gradient(40, 56)
    for q, sub in [(90, True), (90, False), (50, True)]:
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        b = encode_jpeg(img, quality=q, subsample=sub, progressive=True)
        assert b"\xff\xc2" in b and b"\xff\xc0" not in b[2:4]
        assert b.count(b"\xff\xda") >= 10  # full 10-scan color script
        assert np.array_equal(decode_jpeg(b), base), (q, sub)


def test_progressive_random_and_sparse():
    rng = np.random.RandomState(3)
    # dense noise exercises ZRL + refinement insertions; the sparse
    # dot image at low quality forces long EOBn runs across blocks
    noise = rng.randint(0, 256, (33, 47, 3), np.uint8)
    sparse = np.full((64, 64, 3), 128, np.uint8)
    sparse[5, 5] = (255, 0, 0)
    sparse[40, 60] = (0, 255, 0)
    for img, q in [(noise, 95), (noise, 40), (sparse, 30), (sparse, 90)]:
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
        assert np.array_equal(prog, base), q


def test_progressive_grayscale():
    g = _gradient(33, 41)[:, :, 0]
    base = decode_jpeg(encode_jpeg(g, quality=85))
    prog = decode_jpeg(encode_jpeg(g, quality=85, progressive=True))
    assert np.array_equal(prog, base)


def test_progressive_restart_intervals():
    img = _gradient(50, 70)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 3):
        b = encode_jpeg(img, quality=90, restart_interval=ri, progressive=True)
        assert b"\xff\xdd" in b
        assert np.array_equal(decode_jpeg(b), base), ri


def test_subsampled_chroma_smooth_regions():
    # 4:2:0 must stay accurate where chroma is locally smooth
    img = np.zeros((32, 32, 3), np.uint8)
    img[:16] = (200, 60, 60)
    img[16:] = (60, 60, 200)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    # interior rows (away from the color edge) nearly exact
    assert np.abs(out[:8].astype(int) - img[:8].astype(int)).max() <= 6
    assert np.abs(out[24:].astype(int) - img[24:].astype(int)).max() <= 6


def test_media_stage_integration():
    import pyarrow as pa
    import ray.data as rd

    from document_ai_ray.stages.multimodal import (
        MEDIA_SCHEMA,
        DecodeMedia,
        media_features,
        resize_media,
    )

    img = _gradient(24, 32)
    payload = encode_jpeg(img, quality=90)
    rows = [
        {
            "media_id": 1,
            "media_type": "image/jpeg",
            "payload": payload,
            "meta": {"width": 32, "height": 24, "sample_rate": 0},
        }
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))
    feats = media_features(ds).take_all()
    assert feats[0]["error"] is None
    # features match a direct decode
    direct = DecodeMedia()._decode(payload)
    assert np.allclose(feats[0]["features"], direct)
    # resize re-encodes as JPEG and still decodes to the new size
    resized = resize_media(ds, width=12, height=12).take_all()
    assert resized[0]["payload"][:2] == b"\xff\xd8"
    assert decode_jpeg(resized[0]["payload"]).shape == (12, 12, 3)
