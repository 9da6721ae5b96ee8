"""Index-build job entry point — submit with:

    ray job submit --working-dir /root/repo -- \
        python scripts/build_job.py --input /path/to/webtext --out /path/to/index \
            [--resumable] [--shard-docs 262144] [--num-partitions 64]

Runs the full chain: webtext parquet → ingest (extract/clean/dedup/doc-ids/
enrich) → docs parquet → SPIMI index build (single-pass or resumable
segments).  Prints a JSON summary (throughput, lineage path) on stdout.

Owns its Ray session: connects to the cluster it was submitted to
(``ray.init(address="auto")``) or starts a local one; shuts down at exit.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="webtext parquet dir/file")
    ap.add_argument("--out", required=True, help="output root (docs/ + index layout)")
    ap.add_argument("--resumable", action="store_true",
                    help="segment-based build with per-shard checkpoints")
    ap.add_argument("--shard-docs", type=int, default=262144)
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--salt-range", type=int, default=262144)
    ap.add_argument("--batch-size", type=int, default=1024)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU cap (ignored on a cluster)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        try:
            ray.init(address="auto", ignore_reinit_error=True, logging_level="ERROR")
        except Exception:
            ray.init(
                address="local",
                num_cpus=args.num_cpus or None,
                include_dashboard=False,
                logging_level="ERROR",
            )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from stocksight_ray.index.build import build_index
    from stocksight_ray.index.segments import build_resumable
    from stocksight_ray.pipelines.ingest import ingest_webtext

    t0 = time.time()
    # ingest_webtext intersects the column list with the file schema (lang
    # is optional) — don't duplicate the read logic here
    docs = ingest_webtext(args.input).drop_columns(["tokens"]).materialize()
    n_docs = docs.count()
    docs_dir = os.path.join(args.out, "docs")
    import shutil

    shutil.rmtree(docs_dir, ignore_errors=True)  # write_parquet appends
    docs.write_parquet(docs_dir)
    t_ingest = time.time() - t0

    t1 = time.time()
    index_dir = os.path.join(args.out, "index_root")
    build = build_resumable if args.resumable else build_index
    kwargs = dict(
        text_col="text_clean",
        num_partitions=args.num_partitions,
        salt_range=args.salt_range,
        batch_size=args.batch_size,
    )
    if args.resumable:
        kwargs["shard_docs"] = args.shard_docs
    manifest = build(docs, index_dir, **kwargs)
    t_index = time.time() - t1

    print(json.dumps({
        "n_docs": n_docs,
        "ingest_sec": round(t_ingest, 3),
        "index_sec": round(t_index, 3),
        "docs_per_sec": round(n_docs / (time.time() - t0), 1),
        "index_dir": index_dir,
        "manifest": os.path.join(index_dir, "manifest.json"),
        "num_index_docs": manifest["num_docs"],
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
