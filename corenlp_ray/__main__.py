"""CLI driver — the ``ray job submit`` entry point.

  python -m corenlp_ray kg --sf-dir /root/testdata/sf0.01 --out /tmp/kg
  python -m corenlp_ray annotate --sf-dir ... --out /tmp/docs [--json]
  python -m corenlp_ray query --name dedup_exact --sf-dir ...

The KG job is resumable: rerunning with the same inputs skips completed
subject-hash buckets via the lineage manifest (state/manifest.py).

This script OWNS the Ray session (guarded init; the library never
inits). On a cluster, submit with:
  ray job submit --working-dir . -- python -m corenlp_ray kg ...
"""
from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="corenlp_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    kg = sub.add_parser("kg", help="resumable KG construction job")
    kg.add_argument("--sf-dir", required=True)
    kg.add_argument("--out", required=True)
    kg.add_argument("--num-buckets", type=int, default=16)
    kg.add_argument("--pages-per-doc", type=int, default=None)

    an = sub.add_parser("annotate", help="write annotated docs")
    an.add_argument("--sf-dir", required=True)
    an.add_argument("--out", required=True)
    an.add_argument("--json", action="store_true",
                    help="also write reference-shaped JSON docs")

    q = sub.add_parser("query", help="run one catalog query")
    q.add_argument("--name", required=True)
    q.add_argument("--sf-dir", required=True)
    q.add_argument("--limit", type=int, default=20)

    args = ap.parse_args(argv)
    _ensure_ray()

    if args.cmd == "kg":
        from corenlp_ray.state.manifest import kg_job

        result = kg_job(args.sf_dir, args.out,
                        num_buckets=args.num_buckets,
                        pages_per_doc=args.pages_per_doc)
        print(json.dumps({"job": "kg", "out": args.out, **result}))
    elif args.cmd == "annotate":
        from corenlp_ray.pipelines.kg import annotate_pages
        from corenlp_ray.sources.pages import read_pages

        docs = annotate_pages(read_pages(args.sf_dir))
        if args.json:
            from corenlp_ray.sources.outputters import write_json

            stats = write_json(docs, args.out).take_all()
            print(json.dumps({"job": "annotate-json",
                              "docs": sum(r["docs"] for r in stats)}))
        else:
            docs.write_parquet(args.out)
            print(json.dumps({"job": "annotate", "out": args.out}))
    elif args.cmd == "query":
        from corenlp_ray.pipelines.queries import QUERIES

        if args.name not in QUERIES:
            print(f"unknown query {args.name}; have: {sorted(QUERIES)}",
                  file=sys.stderr)
            return 2
        out = QUERIES[args.name](args.sf_dir)
        if hasattr(out, "take"):
            rows = out.take(args.limit)
        else:
            rows = out.to_pylist()[:args.limit]
        for r in rows:
            print(json.dumps(r, default=str))
    import ray

    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
