"""Checkpoint/resume via per-partition lineage manifests.

Re-expresses the reference's file-existence block cache
(/root/reference/analysis/entities.py:39, 62-82, 208-235 — "create the
cropped blocks only if the tmp dir doesn't already have them") as the
north-rule resume contract: output is partitioned by url-hash shard,
every completed shard commits a lineage manifest, and a restarted run
skips every shard whose manifest is complete — no reprocessing.

Granularity: a SHARD (url-hash slice of the input) is the unit of
commit, processed as one streaming Dataset job.  Within a shard the
pipeline stays fully streaming; across shards the driver loop gives the
run O(num_shards) checkpoints.  At 100 TB the input layout is bucketed
by the same url-hash so a shard's read is a path-prefix, not a full
scan + filter (here the testdata is one file, so shard selection is a
post-read filter — flagged inline).

Manifests are committed ATOMICALLY (tmp + rename) and carry row count,
byte count and the parquet file list, so a partial write (crash between
parquet flush and manifest) re-runs that shard from scratch —
write_parquet into the shard dir is idempotent-by-overwrite.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from document_ai_ray.functions.hashing import stable64

MANIFEST_DIR = "_manifest"


def shard_of(url: str, num_shards: int) -> int:
    return stable64(url) % num_shards


def _manifest_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"shard-{shard:05d}.json")


def completed_shards(out_dir: str, num_shards: int) -> set[int]:
    """Shards whose manifest is complete AND matches the shard layout
    (a manifest written under a different num_shards is stale)."""
    done = set()
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.startswith("shard-") or not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            if m.get("num_shards") == num_shards and m.get("complete"):
                done.add(int(m["shard"]))
        except (json.JSONDecodeError, KeyError, ValueError):
            continue  # partial/corrupt manifest -> shard re-runs
    return done


def write_manifest(out_dir: str, shard: int, num_shards: int, shard_dir: str) -> dict:
    """Commit the lineage manifest for a finished shard (atomic rename).
    Row/byte counts come from the parquet footers of the files actually
    on disk — the manifest certifies the OUTPUT, not the plan."""
    files = sorted(f for f in os.listdir(shard_dir) if f.endswith(".parquet"))
    rows = 0
    nbytes = 0
    for f in files:
        p = os.path.join(shard_dir, f)
        rows += pq.read_metadata(p).num_rows
        nbytes += os.path.getsize(p)
    manifest = {
        "shard": shard,
        "num_shards": num_shards,
        "rows": rows,
        "bytes": nbytes,
        "files": files,
        "complete": True,
        "completed_at": datetime.now(timezone.utc).isoformat(),
    }
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    tmp = _manifest_path(out_dir, shard) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(out_dir, shard))
    return manifest


def _pending_filter(num_shards: int, shards: set[int]):
    def fn(t: pa.Table) -> pa.Table:
        mask = pa.array(
            [stable64(u) % num_shards in shards for u in t.column("url").to_pylist()]
        )
        return t.filter(mask)

    return fn


def _clean_stale_layout(out_dir: str, num_shards: int) -> None:
    """Remove shard dirs and manifests left by a run with a DIFFERENT
    --shards value: their indices/contents do not line up with the
    current layout, and read_output would silently duplicate rows if
    out-of-range dirs survived."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if os.path.isdir(mdir):
        for name in os.listdir(mdir):
            if not (name.startswith("shard-") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(mdir, name)) as f:
                    m = json.load(f)
                stale = m.get("num_shards") != num_shards
            except (json.JSONDecodeError, ValueError):
                stale = True
            if stale:
                os.remove(os.path.join(mdir, name))
    for d in os.listdir(out_dir):
        # "__shard=" staging dirs are partial writes from a crashed run:
        # write_parquet APPENDS into an existing dir, so leaving them
        # would mix old+new files when the dir is promoted and the
        # manifest would certify duplicated rows.  "__compact=" dirs are
        # a crashed compaction's staging (its shard is already
        # de-manifested, so it rebuilds via the normal pending path).
        # Always remove both.
        if d.startswith("__shard=") or d.startswith("__compact="):
            shutil.rmtree(os.path.join(out_dir, d))
            continue
        if not d.startswith("shard="):
            continue
        try:
            idx = int(d.split("=", 1)[1])
        except ValueError:
            idx = -1
        if not (0 <= idx < num_shards):
            shutil.rmtree(os.path.join(out_dir, d))


def run_resumable(
    make_pages: Callable[[], rd.Dataset],
    pipeline: Callable[[rd.Dataset], rd.Dataset],
    out_dir: str,
    num_shards: int = 8,
    fail_after: int | None = None,
) -> list[int]:
    """Run `pipeline` over `make_pages()` and write every PENDING shard
    from ONE input scan (keyed partitioned write on the url-hash shard),
    then commit a lineage manifest per shard; returns the shards
    processed THIS run (completed shards from previous runs are
    skipped, and never re-read beyond the single pending-set filter).

    The pipeline must preserve the `url` column (the per-row partition
    key — true of every extraction pipeline here).  A crash mid-write
    leaves pending shard dirs without manifests; the next run rebuilds
    exactly those, so the kill/restart contract is unchanged while the
    old one-scan-PER-SHARD multiplier is gone.

    `fail_after=k` injects a crash INSIDE the commit window (test hook
    for the kill/restart contract): all pending shards are written by
    write_parquet, but only the first k are promoted + manifested before
    the run aborts — leaving the rest as raw `__shard=` staging dirs,
    exactly the state a real mid-commit crash leaves behind.
    """
    os.makedirs(out_dir, exist_ok=True)
    _clean_stale_layout(out_dir, num_shards)
    done = completed_shards(out_dir, num_shards)
    pending = [s for s in range(num_shards) if s not in done]
    inject_failure = fail_after is not None and fail_after < len(pending)
    if not pending:
        return []
    for s in pending:
        shard_dir = os.path.join(out_dir, f"shard={s:05d}")
        # a shard dir without a manifest is a partial write from a
        # crashed run -> rebuild it from scratch
        if os.path.isdir(shard_dir):
            shutil.rmtree(shard_dir)
    # NOTE(test-scale): pending-shard selection is a post-read filter
    # here; at 10^12 rows the input is bucketed by the same url-hash
    # and this becomes a path-prefix read (no full scan of done shards).
    pages = make_pages().map_batches(
        _pending_filter(num_shards, set(pending)), batch_format="pyarrow"
    )

    def add_shard(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__shard",
            pa.array([f"{stable64(u) % num_shards:05d}" for u in t.column("url").to_pylist()]),
        )

    result = pipeline(pages).map_batches(add_shard, batch_format="pyarrow")
    result.write_parquet(out_dir, partition_cols=["__shard"])
    commit = pending[:fail_after] if inject_failure else pending
    for s in commit:
        src = os.path.join(out_dir, f"__shard={s:05d}")
        shard_dir = os.path.join(out_dir, f"shard={s:05d}")
        if os.path.isdir(src):
            os.replace(src, shard_dir)
        else:
            os.makedirs(shard_dir, exist_ok=True)      # shard with zero rows
        write_manifest(out_dir, s, num_shards, shard_dir)
    if inject_failure:
        # un-promoted __shard= staging dirs are deliberately left behind:
        # the next run's _clean_stale_layout must remove them (see the
        # duplicate-rows crash-window test).
        raise RuntimeError(f"injected failure after {fail_after} shards")
    return commit


def read_output(out_dir: str) -> rd.Dataset:
    """Read a resumable run's output — ONLY files certified by a
    complete manifest (stale dirs from older layouts are never read).
    All complete manifests must agree on the shard layout."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    files: list[str] = []
    layouts: set[int] = set()
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("shard-") and name.endswith(".json")):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if not m.get("complete"):
            continue
        layouts.add(m["num_shards"])
        shard_dir = os.path.join(out_dir, f"shard={m['shard']:05d}")
        files.extend(os.path.join(shard_dir, fn) for fn in m["files"])
    if len(layouts) > 1:
        raise ValueError(f"mixed shard layouts in {out_dir}: {sorted(layouts)}")
    return rd.read_parquet(files)


def _plan_groups(sizes: list[int], target_bytes: int) -> list[list[int]]:
    """Greedy first-fit file grouping: consecutive files accumulate
    until the group reaches target_bytes."""
    groups: list[list[int]] = []
    cur: list[int] = []
    acc = 0
    for i, s in enumerate(sizes):
        cur.append(i)
        acc += s
        if acc >= target_bytes:
            groups.append(cur)
            cur, acc = [], 0
    if cur:
        groups.append(cur)
    return groups


def compact_shards(
    out_dir: str,
    target_bytes: int = 128 << 20,
    fail_inside: int | None = None,
) -> dict[int, tuple[int, int]]:
    """SMALL-FILE COMPACTION over a resumable run's output: rewrite each
    manifested shard's many small parquet files into ~target_bytes files
    (the maintenance pass a 100 TB partitioned lake needs — resumable
    writes at high task parallelism leave one file per write task, and
    footer/open overhead then dominates reads).

    Crash-safe by the SAME contract as the writer, in this order per
    shard: (1) compacted files are built in a `__compact=` staging dir
    (one Ray task per shard — shards compact in parallel, each task
    holds one group of files at a time); (2) the shard's MANIFEST is
    deleted — from here the shard reads as incomplete, so ANY crash
    degrades to "rebuild this shard" (run_resumable's normal pending
    path + _clean_stale_layout sweeping the staging dir), never to a
    manifest pointing at missing files; (3) the old dir is swapped out
    and (4) the manifest re-committed from the parquet footers actually
    on disk.  Shards already at one file are skipped.

    `fail_inside=k` crashes after step (2) of the k-th compacted shard
    (test hook for the crash-window contract).  Returns
    {shard: (files_before, files_after)} for the shards rewritten."""
    import ray

    mdir = os.path.join(out_dir, MANIFEST_DIR)
    shards = []
    for name in sorted(os.listdir(mdir)):
        if not (name.startswith("shard-") and name.endswith(".json")):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m.get("complete") and len(m["files"]) > 1:
            shards.append(m)
    if not shards:
        return {}

    @ray.remote
    def build(shard_dir: str, files: list[str], staging: str) -> list[str]:
        os.makedirs(staging, exist_ok=True)
        sizes = [os.path.getsize(os.path.join(shard_dir, f)) for f in files]
        out_files = []
        for gi, grp in enumerate(_plan_groups(sizes, target_bytes)):
            tbl = pa.concat_tables(
                [pq.read_table(os.path.join(shard_dir, files[i])) for i in grp]
            )
            name = f"compact-{gi:04d}.parquet"
            pq.write_table(tbl, os.path.join(staging, name))
            out_files.append(name)
        return out_files

    staged = {
        m["shard"]: build.remote(
            os.path.join(out_dir, f"shard={m['shard']:05d}"),
            m["files"],
            os.path.join(out_dir, f"__compact={m['shard']:05d}"),
        )
        for m in shards
    }
    stats: dict[int, tuple[int, int]] = {}
    for k, m in enumerate(shards, start=1):
        s = m["shard"]
        new_files = ray.get(staged[s])
        shard_dir = os.path.join(out_dir, f"shard={s:05d}")
        staging = os.path.join(out_dir, f"__compact={s:05d}")
        os.remove(_manifest_path(out_dir, s))          # (2) shard -> incomplete
        if fail_inside is not None and k == fail_inside:
            raise RuntimeError(f"injected failure inside compaction of shard {s}")
        shutil.rmtree(shard_dir)                        # (3) swap
        os.replace(staging, shard_dir)
        write_manifest(out_dir, s, m["num_shards"], shard_dir)  # (4) recommit
        stats[s] = (len(m["files"]), len(new_files))
    return stats
