"""Discovery tool for the r5 determinism sweep (verdict #6): run every
registry query at a tiny SF with the `ops._exchange_spy` hook set, and
print the set of queries that actually cross the manual hash exchange
(`bucket_map_groups` — the class whose per-bucket fn sees rows in
nondeterministic ORDER across runs).  The pinned list lives in
tests/test_exchange_stability.py; re-run this tool when new pipelines
are added and update the list.

Usage: python tools/find_exchange_users.py [sf_dir]
"""

from __future__ import annotations

import sys


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sys.path.insert(0, "/root/repo")
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False)
    from document_ai_ray.pipelines import ops, registry

    crossed: set[str] = set()
    current: list[str] = [""]
    ops._exchange_spy = lambda col, n: crossed.add(current[0])

    qs = registry.queries()
    failures = []
    for i, (name, fn) in enumerate(qs.items()):
        current[0] = name
        try:
            res = fn(sf_dir)
            import ray.data as rd

            if isinstance(res, rd.Dataset):
                res.to_pandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, repr(e)[:120]))
        if (i + 1) % 25 == 0:
            print(f"... {i + 1}/{len(qs)} ({len(crossed)} crossers)", flush=True)
    print(f"\n{len(crossed)} exchange users:")
    for n in sorted(crossed):
        print("   ", repr(n) + ",")
    if failures:
        print(f"\n{len(failures)} failures:")
        for n, e in failures:
            print("   ", n, e)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
