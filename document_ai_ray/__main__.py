"""CLI entry point (≙ the reference's click CLI, /root/reference/main.py:17-60).

    python -m document_ai_ray extract --input pages.parquet --out outdir \
        [--shards 8] [--resume] [--max-block-bytes N]
    python -m document_ai_ray metrics --results outdir --golden golden.parquet --out metrics.csv
    python -m document_ai_ray sweep --golden golden.parquet --iters 10 --out search.jsonl

The CLI owns the Ray session (guarded init); library code never does.
Output is partitioned parquet with per-shard lineage manifests, so a
re-run of the same command resumes instead of recomputing.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return ray


def cmd_extract(args: argparse.Namespace) -> int:
    ray = _ray_init()
    import ray.data as rd

    from document_ai_ray.pipelines.extract import extract_pipeline
    from document_ai_ray.stages.skew import split_blocks_by_bytes
    from document_ai_ray.state.resume import completed_shards, run_resumable

    def make_pages():
        if args.format == "warc":
            from document_ai_ray.sources.warc import read_warc

            ds = read_warc(args.input)
        else:
            ds = rd.read_parquet(args.input)
        if args.max_block_bytes:
            ds = split_blocks_by_bytes(ds, max_bytes=args.max_block_bytes)
        return ds

    if args.resume:
        done_before = completed_shards(args.out, args.shards)
        processed = run_resumable(make_pages, extract_pipeline, args.out, num_shards=args.shards)
        print(json.dumps({"out": args.out, "shards_done_before": sorted(done_before),
                          "shards_processed": processed}))
    else:
        extract_pipeline(make_pages()).write_parquet(args.out)
        print(json.dumps({"out": args.out, "mode": "single-shot"}))
    ray.shutdown()
    return 0


def cmd_metrics(args: argparse.Namespace) -> int:
    ray = _ray_init()
    import pyarrow.parquet as pq

    from document_ai_ray.pipelines.metrics import cause_confusion
    from document_ai_ray.sources.raw import write_metrics_csv
    from document_ai_ray.state.resume import read_output

    results = read_output(args.results)
    golden = pq.read_table(args.golden)
    df = cause_confusion(results, golden)
    write_metrics_csv(df, args.out)
    print(json.dumps({"out": args.out, "causes": len(df),
                      "fp": int(df.fp.sum()), "fn": int(df.fn.sum())}))
    ray.shutdown()
    return 0


def cmd_analyze(args: argparse.Namespace) -> int:
    """Analyze ONE document now — no Ray session (≙ reference
    app/api.py:27-75 request path)."""
    from document_ai_ray.api import analyze_document

    with open(args.input, "rb") as f:
        payload = f.read()
    row = analyze_document(payload, url=args.url or args.input, lang=args.lang)
    row.pop("warc_ts", None)                      # not JSON-serializable; CLI-only view
    print(json.dumps(row, ensure_ascii=False, default=str))
    return 0


def cmd_report(args: argparse.Namespace) -> int:
    ray = _ray_init()
    import pyarrow.parquet as pq

    from document_ai_ray.pipelines.metrics import cause_confusion
    from document_ai_ray.pipelines.report import render_confusion_report
    from document_ai_ray.state.resume import read_output

    df = cause_confusion(read_output(args.results), pq.read_table(args.golden))
    text = render_confusion_report(df)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    if args.svg:
        from document_ai_ray.pipelines.plots import svg_confusion_report

        with open(args.svg, "w") as f:
            f.write(svg_confusion_report(df))
    print(text)
    ray.shutdown()
    return 0


def cmd_sweep(args: argparse.Namespace) -> int:
    ray = _ray_init()
    import pyarrow.parquet as pq

    from document_ai_ray.pipelines.tuning import random_search

    golden = pq.read_table(args.golden)
    best = random_search(golden, n_iters=args.iters, n_rows=args.rows,
                         seed=args.seed, out_jsonl=args.out)
    print(json.dumps(best))
    ray.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="document_ai_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("extract", help="pages parquet -> validated extraction parquet")
    e.add_argument("--input", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--shards", type=int, default=8)
    e.add_argument("--resume", action="store_true",
                   help="shard-wise run with lineage manifests (re-run skips complete shards)")
    e.add_argument("--max-block-bytes", type=int, default=0,
                   help="re-block input so no block's payload exceeds this (skew mitigation)")
    e.add_argument("--format", choices=["parquet", "warc"], default="parquet",
                   help="input format (warc = Common-Crawl archives, plain or .gz)")
    e.set_defaults(fn=cmd_extract)

    m = sub.add_parser("metrics", help="per-cause confusion vs golden causes -> CSV")
    m.add_argument("--results", required=True, help="extract output dir (sharded)")
    m.add_argument("--golden", required=True, help="golden causes parquet (url, causes, validated)")
    m.add_argument("--out", required=True)
    m.set_defaults(fn=cmd_metrics)

    a = sub.add_parser("analyze", help="analyze ONE html/pdf file now (no Ray) -> JSON result")
    a.add_argument("--input", required=True, help="path to an html or pdf payload")
    a.add_argument("--url", default=None)
    a.add_argument("--lang", default=None)
    a.set_defaults(fn=cmd_analyze)

    r = sub.add_parser("report", help="per-cause precision/recall markdown report")
    r.add_argument("--results", required=True, help="extract output dir (sharded)")
    r.add_argument("--golden", required=True, help="golden causes parquet")
    r.add_argument("--out", default=None, help="write the report here as well")
    r.add_argument("--svg", default=None, help="also render the metrics as an SVG chart")
    r.set_defaults(fn=cmd_report)

    s = sub.add_parser("sweep", help="seeded random hyperparameter search vs golden fixtures")
    s.add_argument("--golden", required=True)
    s.add_argument("--iters", type=int, default=10)
    s.add_argument("--rows", type=int, default=200)
    s.add_argument("--seed", type=int, default=7)
    s.add_argument("--out", default=None, help="JSONL log path")
    s.set_defaults(fn=cmd_sweep)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
