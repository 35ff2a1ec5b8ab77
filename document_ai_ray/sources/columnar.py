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
