"""Multimodal plumbing: resize + frame-sample stages (decode/features
covered in test_text_analysis)."""

import pyarrow as pa
import ray.data as rd

from document_ai_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    DecodeMedia,
    make_media_payload,
    resize_media,
    sample_frames,
)


def _media(n=6):
    rows = [
        {
            "media_id": i,
            "media_type": "image/synthetic",
            "payload": make_media_payload(i, 64 * (i + 1), 48),
            "meta": {"width": 64 * (i + 1), "height": 48, "sample_rate": 0},
        }
        for i in range(n)
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


def test_resize_rewrites_dimensions_and_payload_size():
    out = resize_media(_media(), width=32, height=32).take_all()
    assert len(out) == 6
    for r in out:
        assert r["meta"]["width"] == 32 and r["meta"]["height"] == 32
        # fake codec: body bytes track the new dimensions
        assert len(r["payload"]) == 16 + max(16, (32 * 32) // 64)
    # resized payloads still decode
    dec = DecodeMedia()._decode(out[0]["payload"])
    assert len(dec) == DecodeMedia.FEATURE_DIM


def test_resize_deterministic():
    a = resize_media(_media(), 32, 32).take_all()
    b = resize_media(_media(), 32, 32).take_all()
    assert {r["media_id"]: r["payload"] for r in a} == {
        r["media_id"]: r["payload"] for r in b
    }


def test_sample_frames_explodes_and_strides():
    out = sample_frames(_media(), every=2).to_pandas()
    assert set(out["media_id"]) == set(range(6))
    g = out[out["media_id"] == 5]
    assert list(g["frame_idx"]) == sorted(g["frame_idx"])
    assert all(i % 2 == 0 for i in g["frame_idx"])  # stride respected
    assert (g["frame"].str.len() > 0).all()
