"""WebDataset-style tar-shard sink + source.

The de-facto exchange format for large-scale training data loaders
(WebDataset / torchdata): documents packed into POSIX tar shards, one
group of same-basename members per sample ({key}.txt payload +
{key}.json metadata), shards sized for sequential streaming.  Stdlib
`tarfile` only — no external deps.

Distributed shape: one shard per task batch (the same per-task spool
pattern as sources/warc.py — nothing corpus-sized touches the driver;
the collected manifest is paths-only).  Reading goes through
`ray.data.read_binary_files` so discovery/parallelism belong to the
datasource; each tar parses in-task.

Determinism: fixed mtime/uid/gid and USTAR format, members emitted in
doc order, shard name = blake2s of the first key — byte-stable output
for identical input, which the resume layer's manifests rely on.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

import pyarrow as pa
import ray.data as rd

_META_COLS = ("lang", "source")


def _tar_bytes(rows: list[dict]) -> bytes:
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for r in rows:
            key = str(r["doc_id"])
            payload = (r.get("text") or "").encode("utf-8")
            meta = json.dumps(
                {k: r[k] for k in _META_COLS if k in r}, sort_keys=True
            ).encode("utf-8")
            for name, data in ((f"{key}.txt", payload), (f"{key}.json", meta)):
                info = tarfile.TarInfo(name=name)
                info.size = len(data)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def write_webdataset(ds: rd.Dataset, out_dir: str) -> rd.Dataset:
    """documents-schema Dataset -> tar shards under out_dir, one shard
    per task batch.  Returns the paths-only manifest Dataset (consume
    it to drive the write)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        if not rows:
            return pa.table({"path": pa.array([], pa.string())})
        name = hashlib.blake2s(
            str(rows[0]["doc_id"]).encode(), digest_size=8
        ).hexdigest()
        path = os.path.join(out_dir, f"shard-{name}.tar")
        data = _tar_bytes(rows)
        with open(path, "wb") as f:
            f.write(data)
        return pa.table({"path": pa.array([path], pa.string())})

    return ds.map_batches(write_shard, batch_format="pyarrow")


def read_webdataset(path: str | list[str]) -> rd.Dataset:
    """Tar shards -> (doc_id, text, <meta cols>) Dataset: same-basename
    members regroup into one row per sample (the WebDataset contract)."""
    files = rd.read_binary_files(path)

    def parse(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for blob in t.column("bytes").to_pylist():
            samples: dict[str, dict] = {}
            with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
                for m in tf:
                    if not m.isfile():
                        continue
                    key, _, ext = m.name.rpartition(".")
                    data = tf.extractfile(m).read()
                    d = samples.setdefault(key, {})
                    if ext == "txt":
                        d["text"] = data.decode("utf-8")
                    elif ext == "json":
                        d.update(json.loads(data.decode("utf-8")))
            for key, d in samples.items():
                rows.append({"doc_id": int(key), **d})
        schema = pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string())]
            + [(c, pa.string()) for c in _META_COLS]
        )
        return pa.Table.from_pylist(rows, schema=schema)

    return files.map_batches(parse, batch_format="pyarrow")
