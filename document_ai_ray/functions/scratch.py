"""Per-process scratch directories for roundtrip queries.

Roundtrip queries (WARC/CSV/JSONL/WebDataset/partitioned-parquet) write
a scratch layout under /tmp and read it back.  A FIXED path races when
two sessions run on the same box (driver run + pytest: one rmtree's the
layout the other is mid-read on), so every path carries a per-process
token — same lifetime as the old fixed path (fresh per query build,
reused within the process), no cross-process collisions.
"""

from __future__ import annotations

import os
import shutil
import tempfile


def scratch_dir(name: str, fresh: bool = True) -> str:
    """`/tmp/document_ai_ray_<name>_<pid>` — rmtree'd first when
    ``fresh`` (the per-run rewrite discipline of the roundtrips)."""
    path = os.path.join(tempfile.gettempdir(), f"document_ai_ray_{name}_{os.getpid()}")
    if fresh:
        shutil.rmtree(path, ignore_errors=True)
    return path
