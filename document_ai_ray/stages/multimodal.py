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


class ResizeMedia:
    """Actor-pool stage: payload -> payload at new dimensions (the
    image-resize analogue of the reference's page-height normalization,
    /root/reference/detection/template_matching.py:169-188).  Real
    codecs are stubbed like DecodeMedia; the fake path rewrites the
    header and nearest-neighbor-samples the byte body so output size
    tracks the new dimensions deterministically."""

    def __init__(self, width: int, height: int, strict: bool = False):
        self.w, self.h, self.strict = width, height, strict

    def _resize(self, payload: bytes) -> bytes:
        if payload[:4] != _MAGIC:
            if self.strict:
                raise NotImplementedError("real image resize requires codec libraries")
            raise ValueError("unknown payload format")
        body = np.frombuffer(payload[16:], dtype=np.uint8)
        _, _, sr = struct.unpack("<III", payload[4:16])
        n_out = max(16, (self.w * self.h) // 64)
        idx = np.linspace(0, len(body) - 1, n_out).astype(np.int64)
        return _MAGIC + struct.pack("<III", self.w, self.h, sr) + body[idx].tobytes()

    def __call__(self, t: pa.Table) -> pa.Table:
        out_payloads, metas = [], []
        for p in t.column("payload").to_pylist():
            try:
                out_payloads.append(self._resize(p))
            except Exception:
                out_payloads.append(p)  # pass-through on failure (row survives)
        metas = [
            {"width": self.w, "height": self.h, "sample_rate": (m or {}).get("sample_rate", 0)}
            for m in t.column("meta").to_pylist()
        ]
        return pa.Table.from_arrays(
            [
                t.column("media_id"),
                t.column("media_type"),
                pa.array(out_payloads, pa.binary()),
                pa.array(metas, MEDIA_SCHEMA.field("meta").type),
            ],
            names=[f.name for f in MEDIA_SCHEMA],
        )


def resize_media(media_ds, width: int, height: int, concurrency: int = 4, batch_size: int = 16):
    return media_ds.map_batches(
        ResizeMedia,
        fn_constructor_kwargs={"width": width, "height": height},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def sample_frames(media_ds, every: int = 4, concurrency: int = 4, batch_size: int = 8):
    """Video-analogue frame sampling: explode each payload into every
    k-th fixed-size chunk as one 'frame' row (flat_map shape: one media
    row -> many frame rows).  Real container demuxing is stubbed the
    same way as decoding."""
    FRAME = 256

    def explode(t: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for i, p in zip(t.column("media_id").to_pylist(), t.column("payload").to_pylist()):
            if not p or p[:4] != _MAGIC:
                continue
            body = p[16:]
            n_frames = max(1, len(body) // FRAME)
            for k in range(0, n_frames, every):
                ids.append(i)
                idxs.append(k)
                frames.append(body[k * FRAME : (k + 1) * FRAME])
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(idxs, pa.int32()), pa.array(frames, pa.binary())],
            names=["media_id", "frame_idx", "frame"],
        )

    return media_ds.map_batches(
        explode, batch_format="pyarrow", batch_size=batch_size
    )
