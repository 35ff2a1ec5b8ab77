"""Multimodal pipeline queries (rows-only: binary payloads have no SQL
analogue).  The media table is synthesized deterministically in-task —
the pattern a real corpus would use with payloads in parquet binary
columns."""

from __future__ import annotations

import pyarrow as pa

from document_ai_ray.pipelines.registry import register

N_MEDIA = 200


def _media_dataset():
    import ray.data as rd

    from document_ai_ray.stages.multimodal import MEDIA_SCHEMA, make_media_payload

    def gen(batch: pa.Table) -> pa.Table:
        rows = []
        for i in batch.column("id").to_pylist():
            w = 32 * ((i % 8) + 1)
            rows.append(
                {
                    "media_id": i,
                    "media_type": "image/synthetic" if i % 3 else "audio/synthetic",
                    "payload": make_media_payload(i, w, 48, sample_rate=16000 if i % 3 == 0 else 0),
                    "meta": {"width": w, "height": 48, "sample_rate": 16000 if i % 3 == 0 else 0},
                }
            )
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    return rd.range(N_MEDIA, override_num_blocks=8).map_batches(gen, batch_format="pyarrow")


@register("media_decode_features")
def media_decode_features(sf_dir: str):
    """Decode + fixed-dim feature extraction over the synthetic media
    table (actor pool, byte-capped batches; sf_dir unused)."""
    from document_ai_ray.stages.multimodal import media_features

    return media_features(_media_dataset())


@register("media_resize_then_decode")
def media_resize_then_decode(sf_dir: str):
    """Resize -> decode chain (two actor-pool stages back to back)."""
    from document_ai_ray.stages.multimodal import media_features, resize_media

    return media_features(resize_media(_media_dataset(), width=32, height=32))
