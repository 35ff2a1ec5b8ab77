"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as `binary` columns with a
`media_type` string and a `meta` struct; decode / feature-extract /
resize / frame-sample are actor-pool `map_batches` stages.  The
image/audio codec libraries are NOT in this container, so the actual
decode is STUBBED: `DecodeMedia` either raises NotImplementedError
(strict mode) or runs a deterministic fake decoder that parses the
synthetic payload header — the Ray-side plumbing (schema, batching,
actor signature, per-row error semantics, output layout) is real and
tested.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),       # image/png-like | audio/pcm-like
        pa.field("payload", pa.binary()),
        pa.field("meta", pa.struct([pa.field("width", pa.int32()), pa.field("height", pa.int32()), pa.field("sample_rate", pa.int32())])),
    ]
)

FEATURE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),
        pa.field("n_bytes", pa.int64()),
        pa.field("features", pa.list_(pa.float32())),   # fixed-dim feature vector
        pa.field("error", pa.string()),
    ]
)

_MAGIC = b"SYNM"  # synthetic media payload: SYNM | u32 w | u32 h | u32 sr | data


def make_media_payload(media_id: int, width: int, height: int, sample_rate: int = 0) -> bytes:
    """Deterministic synthetic payload the fake decoder understands."""
    rng = np.random.RandomState(media_id & 0x7FFFFFFF)
    n = max(16, (width * height) // 64)
    return _MAGIC + struct.pack("<III", width, height, sample_rate) + rng.bytes(n)


class DecodeMedia:
    """Actor-pool stage: decode + fixed-dim feature extraction.

    strict=True raises NotImplementedError for real codecs (the honest
    behavior without image/audio libs); strict=False runs the
    deterministic fake decoder on synthetic payloads.  Batch size for
    media stages must be small (payloads dominate block size — cap
    batches by bytes, SURVEY.md §4 skew row)."""

    FEATURE_DIM = 16

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] != _MAGIC:
            if self.strict:
                raise NotImplementedError(
                    "real image/audio decoding requires codec libraries not present in this environment"
                )
            raise ValueError("unknown payload format")
        w, h, sr = struct.unpack("<III", payload[4:16])
        body = np.frombuffer(payload[16:], dtype=np.uint8).astype(np.float32)
        # deterministic "features": moments of byte histogram buckets
        chunks = np.array_split(body, self.FEATURE_DIM)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32) / 255.0

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("media_id").to_pylist()
        types = t.column("media_type").to_pylist()
        payloads = t.column("payload").to_pylist()
        feats, errs, sizes = [], [], []
        for p in payloads:
            sizes.append(len(p) if p else 0)
            try:
                feats.append(self._decode(p).tolist())
                errs.append(None)
            except NotImplementedError as exc:  # stubbed codec path
                feats.append([0.0] * self.FEATURE_DIM)
                errs.append(f"decode_stubbed:{exc}")
            except Exception as exc:
                feats.append([0.0] * self.FEATURE_DIM)
                errs.append(f"decode_error:{type(exc).__name__}")
        return pa.Table.from_arrays(
            [
                pa.array(ids, pa.int64()),
                pa.array(types, pa.string()),
                pa.array(sizes, pa.int64()),
                pa.array(feats, pa.list_(pa.float32())),
                pa.array(errs, pa.string()),
            ],
            names=[f.name for f in FEATURE_SCHEMA],
        )


def media_features(media_ds, concurrency: int = 4, batch_size: int = 16):
    """media table -> feature table.  Small batch_size on purpose:
    payload bytes x batch x concurrency must fit the worker heap."""
    return media_ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"strict": False},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )
