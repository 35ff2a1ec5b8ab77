"""ORC / Arrow-IPC shard sink-source roundtrips (sources/columnar.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from document_ai_ray.sources.columnar import (
    read_ipc,
    read_orc,
    write_ipc_shards,
    write_orc_shards,
)


def _sample_ds():
    n = 257  # non-round: exercises partial batches
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n), pa.int64()),
                "text": pa.array([f"t{i} with, commas\tand ünïcode" for i in range(n)]),
                "score": pa.array(np.linspace(-1, 1, n), pa.float64()),
            }
        )
    ).repartition(4)


def _check_roundtrip(back_df):
    back_df = back_df.sort_values("doc_id").reset_index(drop=True)
    assert len(back_df) == 257
    assert back_df["doc_id"].tolist() == list(range(257))
    assert back_df["text"][42] == "t42 with, commas\tand ünïcode"
    assert np.allclose(back_df["score"], np.linspace(-1, 1, 257), atol=0)


def test_orc_roundtrip(tmp_path):
    manifest = write_orc_shards(_sample_ds(), str(tmp_path)).take_all()
    paths = [r["path"] for r in manifest]
    assert len(paths) >= 2  # multiple shards, one per task batch
    assert all(p.endswith(".orc") for p in paths)
    _check_roundtrip(read_orc(paths).to_pandas())


def test_ipc_roundtrip(tmp_path):
    paths = [r["path"] for r in write_ipc_shards(_sample_ds(), str(tmp_path)).take_all()]
    assert all(p.endswith(".arrow") for p in paths)
    _check_roundtrip(read_ipc(paths).to_pandas())


def test_orc_empty_batch_no_shard(tmp_path):
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    paths = [r["path"] for r in write_orc_shards(empty, str(tmp_path)).take_all()]
    assert paths == []
