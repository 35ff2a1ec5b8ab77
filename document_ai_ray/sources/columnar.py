"""ORC and Arrow-IPC (Feather v2) shard sinks/sources.

Completes the interchange matrix next to Parquet / CSV / JSONL / WARC /
WebDataset-tar (≙ the reference's CSV/JSON writers,
/root/reference/ai_documents/data_preparation.py analogues): one shard
file per task batch on the write side, `read_binary_files` + in-task
pyarrow decode on the read side — both directions shard-parallel, no
driver materialization.  ORC rides `pyarrow.orc`; IPC rides
`pyarrow.ipc` file format (zero-copy mmap-able on a real deployment).
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data as rd


def _shard_writer(out_dir: str, ext: str, encode) -> "callable":
    os.makedirs(out_dir, exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        first = str(t.column(0)[0].as_py())
        name = hashlib.blake2s(first.encode(), digest_size=8).hexdigest()
        path = os.path.join(out_dir, f"shard-{name}.{ext}")
        encode(t, path)
        return pa.table({"path": pa.array([path], pa.string())})

    return write_shard


def write_orc_shards(ds: rd.Dataset, out_dir: str) -> rd.Dataset:
    """Dataset -> ORC shards (one per task batch).  Returns the
    paths-only manifest Dataset; consume it to drive the write."""
    import pyarrow.orc as orc

    return ds.map_batches(
        _shard_writer(out_dir, "orc", lambda t, p: orc.write_table(t, p)),
        batch_format="pyarrow",
    )


def read_orc(path: str | list[str]) -> rd.Dataset:
    """ORC shards -> Dataset, decoded per task from raw bytes."""
    import pyarrow.orc as orc

    files = rd.read_binary_files(path)

    def parse(t: pa.Table) -> pa.Table:
        tabs = [
            orc.ORCFile(pa.BufferReader(b)).read()
            for b in t.column("bytes").to_pylist()
        ]
        return pa.concat_tables(tabs)

    return files.map_batches(parse, batch_format="pyarrow")


def write_ipc_shards(ds: rd.Dataset, out_dir: str) -> rd.Dataset:
    """Dataset -> Arrow IPC file shards (Feather v2, one per batch)."""

    def encode(t: pa.Table, path: str) -> None:
        with pa.OSFile(path, "wb") as f, pa.ipc.new_file(f, t.schema) as w:
            w.write_table(t)

    return ds.map_batches(
        _shard_writer(out_dir, "arrow", encode), batch_format="pyarrow"
    )


def read_ipc(path: str | list[str]) -> rd.Dataset:
    """Arrow IPC file shards -> Dataset, decoded per task from bytes."""
    files = rd.read_binary_files(path)

    def parse(t: pa.Table) -> pa.Table:
        tabs = [
            pa.ipc.open_file(pa.BufferReader(b)).read_all()
            for b in t.column("bytes").to_pylist()
        ]
        return pa.concat_tables(tabs)

    return files.map_batches(parse, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Compressed-container siblings: ZIP archives (one member per doc, the
# crawl-delivery format) and gzip JSONL shards (the log-pipeline
# staple).  Same shard-per-batch write, read_binary_files + in-task
# decode read.
# ---------------------------------------------------------------------------


def write_zip_shards(ds: rd.Dataset, out_dir: str) -> rd.Dataset:
    """documents-schema Dataset -> ZIP shards: {doc_id}.txt (text) +
    {doc_id}.json (meta) members, deflate-compressed, deterministic
    timestamps."""
    import json
    import zipfile

    def encode(t: pa.Table, path: str) -> None:
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            for r in t.to_pylist():
                key = str(r["doc_id"])
                meta = {k: v for k, v in r.items() if k not in ("doc_id", "text")}
                for name, data in (
                    (f"{key}.txt", (r.get("text") or "").encode("utf-8")),
                    (f"{key}.json", json.dumps(meta, sort_keys=True).encode("utf-8")),
                ):
                    zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
                    zi.compress_type = zipfile.ZIP_DEFLATED
                    zf.writestr(zi, data)

    return ds.map_batches(_shard_writer(out_dir, "zip", encode), batch_format="pyarrow")


def read_zip_shards(path: str | list[str]) -> rd.Dataset:
    """ZIP shards -> (doc_id, text, <meta>) rows, decoded per task."""
    import io
    import json
    import zipfile

    files = rd.read_binary_files(path)

    def parse(t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for blob in t.column("bytes").to_pylist():
            samples: dict[str, dict] = {}
            with zipfile.ZipFile(io.BytesIO(blob)) as zf:
                for name in zf.namelist():
                    key, _, ext = name.rpartition(".")
                    d = samples.setdefault(key, {})
                    data = zf.read(name)
                    if ext == "txt":
                        d["text"] = data.decode("utf-8")
                    else:
                        d.update(json.loads(data.decode("utf-8")))
            rows.extend({"doc_id": int(k), **d} for k, d in samples.items())
        return pa.Table.from_pylist(rows)

    return files.map_batches(parse, batch_format="pyarrow")


def write_jsonl_gz_shards(ds: rd.Dataset, out_dir: str) -> rd.Dataset:
    """Dataset -> gzip JSONL shards (mtime pinned for deterministic
    bytes)."""
    import gzip
    import json

    def encode(t: pa.Table, path: str) -> None:
        body = "".join(
            json.dumps(r, sort_keys=True, ensure_ascii=False) + "\n" for r in t.to_pylist()
        )
        with open(path, "wb") as f:
            f.write(gzip.compress(body.encode("utf-8"), mtime=0))

    return ds.map_batches(
        _shard_writer(out_dir, "json.gz", encode), batch_format="pyarrow"
    )


def read_jsonl_gz(path: str | list[str]) -> rd.Dataset:
    """Gzip JSONL shards -> Dataset (Arrow JSON reader, gzip stream)."""
    return rd.read_json(path, arrow_open_stream_args={"compression": "gzip"})
