"""Benchmark harness — the driver runs this per-round (BENCH_r{N}.json).

Headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1):
  ingest_index   synthetic webtext corpus (scale-matched to sf) →
                 extract/clean/dedup/doc-ids/enrich → SPIMI index build
                 (BASELINE metric: indexing throughput docs/s)
  bm25_queries   BM25 top-10 over the built index, p95 latency over the
                 reference-style query set
  plus individual training-data ops timed into the "queries" dict.

--scaling: runs the ingest_index pipeline in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same pre-generated corpus and reports
both throughputs + scaling efficiency (the sandbox stand-in for the north
rule's N vs 4N node clusters).

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_from_dir(SF_DIR)
N_PAGES = max(2000, int(200_000 * SF))  # 20k pages at sf0.1
# Scaling runs need enough per-core work that compute dominates the fixed
# session/actor-pool costs — after the r3 kernel vectorization the 100k-page
# corpus finishes in ~20 s at 32 cpus (pure fixed-cost territory), so the
# scaling corpus is 25x the headline (500k pages at sf0.1): the smallest
# size where parallel work dominates the ~8 s serial floor at both levels,
# the sandbox stand-in for a job sized to a real N vs 4N node cluster.
N_PAGES_SCALING = 25 * N_PAGES


def ensure_corpus(n_pages: int = None) -> str:
    n = n_pages or N_PAGES
    corpus_dir = f"/tmp/bench_webtext_{n}"
    marker = os.path.join(corpus_dir, "_DONE")
    if not os.path.exists(marker):
        import shutil

        from stocksight_ray.webtext import write_webtext_parquet

        # clear any partial write from an interrupted run — parquet writes
        # append, so stale shards would silently duplicate corpus rows
        shutil.rmtree(corpus_dir, ignore_errors=True)
        write_webtext_parquet(corpus_dir, n, rows_per_file=4000)
        with open(marker, "w") as f:
            f.write("ok")
    return corpus_dir


def make_queries() -> list:
    """Deterministic reference-style query set (50 queries, 1-3 terms)."""
    from stocksight_ray.webtext import _REAL_WORDS

    w = _REAL_WORDS
    qs = []
    for i in range(50):
        n = 1 + (i % 3)
        qs.append(" ".join(w[(i * 7 + j * 13) % len(w)] for j in range(n)))
    return qs


def run_ingest_index(corpus_dir: str, index_dir: str) -> dict:
    """The headline build: corpus → enriched docs → inverted index."""
    import ray.data as rd

    from stocksight_ray.index.build import build_index
    from stocksight_ray.pipelines.ingest import ingest_webtext

    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    t0 = time.time()
    # block count tracks the session size: the corpus ships in ~25 files and
    # the heavy extract/clean/enrich chain inherits read parallelism
    ds = rd.read_parquet(
        corpus_dir, columns=["url", "warc_ts", "html", "lang"],
        override_num_blocks=max(2 * cpus, 25),
    )
    enriched = ingest_webtext(ds)
    docs = enriched.drop_columns(["tokens"]).materialize()
    n_docs = docs.count()
    t_ingest = time.time() - t0

    t1 = time.time()
    manifest = build_index(
        docs, index_dir, text_col="text_clean", num_partitions=32,
        batch_size=1024, salt_range=None,  # auto: ~6 merge groups per cpu
    )
    t_index = time.time() - t1
    total = time.time() - t0
    return {
        "n_docs": n_docs,
        "ingest_sec": round(t_ingest, 3),
        "index_sec": round(t_index, 3),
        "total_sec": round(total, 3),
        "docs_per_sec": round(n_docs / total, 1),
        "index_docs_per_sec": round(manifest["num_docs"] / t_index, 1),
    }


def run_query_bench(index_dir: str) -> dict:
    import numpy as np

    from stocksight_ray.index.query import QueryEngine

    eng = QueryEngine(index_dir)
    eng.warm(deep=True)  # serving-actor setup; measure warm latency
    queries = make_queries()
    for q in queries[:5]:
        eng.search(q, 10)
    lat = []
    for q in queries:
        t0 = time.perf_counter()
        eng.search(q, 10)
        lat.append(time.perf_counter() - t0)
    lat = np.array(lat)
    return {
        "queries": len(queries),
        "p50_ms": round(float(np.percentile(lat, 50)) * 1000, 3),
        "p95_ms": round(float(np.percentile(lat, 95)) * 1000, 3),
        "mean_ms": round(float(lat.mean()) * 1000, 3),
    }


def run_ops_bench() -> dict:
    import ray.data as rd

    import __ray_entry__ as entrymod

    out = {}
    for name in [
        "q02_token_topk",
        "q09_date_histogram",
        "q13_lineitem_pricing",
        "q16_knn",
        "q19_minhash_dedup",
        "q05_exact_dedup",
        "q23_sentiment",
        "q29_asof_join",
        "q36_hash_join",
        "q38_uniq_users_daily",
        "q54_dup_clusters",
        "q55_cross_dedup",
        "q57_query_string",
    ]:
        fn = entrymod.queries()[name]
        t0 = time.time()
        res = fn(SF_DIR)
        if hasattr(res, "to_pandas"):
            res.to_pandas() if not isinstance(res, rd.Dataset) else res.materialize()
        out[name] = round(time.time() - t0, 3)
    return out


def run_scaling_pairs(max_pairs: int = 3, budget_per_pair: int = 450) -> dict:
    """THREE interleaved (8, 32)-cpu pairs in fresh subprocesses (single
    runs on this shared box swing 2-3x with background load — a median over
    3 pairs tolerates one bad pair where 2 pairs cannot); later pairs are
    skipped over a time budget.  Efficiency is computed PER INTERLEAVED
    PAIR (an 8-cpu run and the 32-cpu run launched right after it): adjacent
    runs share the box's background-load conditions, so the paired ratio
    cancels environment drift that a cross-pair best8/best32 ratio (runs up
    to ~10 min apart) does not.  Headline = MEDIAN of the per-pair ratios
    (ADVICE r3: max of noisy ratios cherry-picks upward); the best pair and
    every raw run are still recorded."""
    import statistics

    runs = {8: [], 32: []}
    order = [c for _ in range(max_pairs) for c in (8, 32)]
    t_scale = time.time()
    for i, cpus in enumerate(order):
        if i >= 2 and i % 2 == 0 and time.time() - t_scale > budget_per_pair * (i // 2):
            break
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child", str(cpus)],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=900,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        runs[cpus].append(json.loads(line[-1]))
    n_pairs = min(len(runs[8]), len(runs[32]))
    pair_effs = [
        round((runs[32][i]["docs_per_sec"] / runs[8][i]["docs_per_sec"]) / 4, 3)
        for i in range(n_pairs)
    ]
    idx_pair_effs = [
        round(
            (runs[32][i]["index_docs_per_sec"] / runs[8][i]["index_docs_per_sec"]) / 4,
            3,
        )
        for i in range(n_pairs)
    ]
    return {
        "docs_per_sec_8cpu": max(r["docs_per_sec"] for r in runs[8]),
        "docs_per_sec_32cpu": max(r["docs_per_sec"] for r in runs[32]),
        # end-to-end (ingest+index): median over same-conditions pairs
        "efficiency_8_to_32": round(statistics.median(pair_effs), 3),
        "best_pair_efficiency": max(pair_effs),
        "pair_efficiencies": pair_effs,
        # the north-rule metric proper: INDEX-BUILD stage throughput
        "index_docs_per_sec_8cpu": max(r["index_docs_per_sec"] for r in runs[8]),
        "index_docs_per_sec_32cpu": max(r["index_docs_per_sec"] for r in runs[32]),
        "index_efficiency_8_to_32": round(statistics.median(idx_pair_effs), 3),
        "index_best_pair_efficiency": max(idx_pair_effs),
        "index_pair_efficiencies": idx_pair_effs,
        "raw_runs": {str(c): runs[c] for c in (8, 32)},
        "n_pages": N_PAGES_SCALING,
        "runs_per_level": len(runs[8]),
    }


def main_bench() -> None:
    import ray

    # Corpus generation first, in its own Ray session (headline + scaling
    # corpora), so the scaling children only measure the pipeline.
    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    corpus = ensure_corpus()
    ensure_corpus(N_PAGES_SCALING)
    ray.shutdown()

    # Scaling pairs run FIRST, on a cold box (VERDICT r4 #8: running them
    # after headline+ops left the box hot — one r4 pair read 0.45 from
    # thermal/background drift the 20 s cooldown didn't cover).
    time.sleep(10)  # settle after corpus generation
    try:
        scaling = run_scaling_pairs()
    except Exception as ex:  # scaling evidence is best-effort in the bench
        scaling = {"error": str(ex)[:200]}

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        logging_level="ERROR",
    )
    DataContext.get_current().enable_progress_bars = False
    index_dir = f"/tmp/bench_index_{N_PAGES}_{NUM_CPUS}"
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)

    _warm_workers(NUM_CPUS)  # steady-state measurement (see _warm_workers)
    build = run_ingest_index(corpus, index_dir)
    qbench = run_query_bench(index_dir)
    ops = run_ops_bench()
    ray.shutdown()

    details = {"build": build, "query": qbench, "scaling_raw": scaling}

    # Sharded serving at the scaling corpus (VERDICT r3 #8): single-engine
    # p95 grows with corpus size (~30 ms at 943k docs); ShardedQueryService
    # is the scale path and the bench exercises it on the ~470k-doc corpus
    # in a fresh child session.
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--sharded-query-child"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)), timeout=900,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        details["query_sharded"] = json.loads(line[-1])
    except Exception as ex:
        details["query_sharded"] = {"error": str(ex)[:200]}

    # Full detail (raw scaling runs, per-stage build numbers, sharded-query
    # child) goes to a SIDE FILE; stdout gets ONE compact line well under
    # the driver's tail-capture budget (BENCH_r04 `parsed: null` — the r4
    # line with embedded raw_runs overflowed the tail and the driver
    # recorded no headline).
    details_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_details.json"
    )
    with open(details_path, "w") as f:
        json.dump(details, f, indent=1)

    scaling_compact = {
        k: v for k, v in scaling.items()
        if k not in ("raw_runs",)
    }
    result = {
        "metric": "webtext ingest+index wall sec (headline); indexing docs/s + BM25 p95 in details",
        "value": build["total_sec"],
        "unit": "sec",
        "queries": {
            "ingest_index": build["total_sec"],
            "bm25_p95_ms": qbench["p95_ms"],
            **ops,
        },
        "sf": SF,
        "num_cpus": NUM_CPUS,
        "n_pages": N_PAGES,
        "scaling": scaling_compact,
        "details_file": "bench_details.json",
    }
    out_line = json.dumps(result)
    if len(out_line) > 1800:  # degrade, never die: drop scaling detail keys
        result["scaling"] = {
            k: scaling_compact.get(k) for k in
            ("efficiency_8_to_32", "index_efficiency_8_to_32",
             "pair_efficiencies", "index_pair_efficiencies")
        }
        out_line = json.dumps(result)
    print(out_line)


def scaling_child(cpus: int) -> dict:
    """Runs in a FRESH process: ingest+index at the given parallelism."""
    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    corpus = ensure_corpus(N_PAGES_SCALING)
    index_dir = f"/tmp/bench_scaling_index_{cpus}"
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    _warm_workers(cpus)
    build = run_ingest_index(corpus, index_dir)
    ray.shutdown()
    return build


def sharded_query_child() -> dict:
    """Fresh process: segmented index over the scaling corpus, then p95 for
    the single in-process engine vs ShardedQueryService (one actor per
    doc_id-range shard, global-stats scoring → identical rankings)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import numpy as np
    import ray.data as rd

    from stocksight_ray.index.query import QueryEngine
    from stocksight_ray.index.segments import build_resumable
    from stocksight_ray.index.serve import ShardedQueryService
    from stocksight_ray.pipelines.ingest import ingest_webtext

    corpus = ensure_corpus(N_PAGES_SCALING)
    out_dir = f"/tmp/bench_seg_index_{N_PAGES_SCALING}"
    _warm_workers(NUM_CPUS)
    t0 = time.time()
    ds = rd.read_parquet(
        corpus, columns=["url", "warc_ts", "html", "lang"],
        override_num_blocks=2 * NUM_CPUS,
    )
    docs = ingest_webtext(ds).drop_columns(["tokens"]).materialize()
    # ~8 shards at the 470k-doc corpus; resumable build reuses committed
    # shards on a re-run, so only the first bench invocation pays the build
    manifest = build_resumable(
        docs, out_dir, text_col="text_clean", num_partitions=32,
        salt_range=65536, shard_docs=65536,
    )
    build_sec = time.time() - t0
    queries = make_queries()

    def p95(search) -> float:
        for q in queries[:5]:
            search(q, 10)
        lat = []
        for q in queries:
            t = time.perf_counter()
            search(q, 10)
            lat.append(time.perf_counter() - t)
        return round(float(np.percentile(np.array(lat), 95)) * 1000, 3)

    eng = QueryEngine(out_dir)
    eng.warm(deep=True)
    single_p95 = p95(eng.search)
    # rank identity between the two serving paths on this corpus
    svc = ShardedQueryService(out_dir)
    mismatch = sum(
        1 for q in queries[:10] if svc.search(q, 10) != eng.search(q, 10)
    )
    sharded_p95 = p95(svc.search)
    svc.shutdown()
    ray.shutdown()
    return {
        "n_docs": int(manifest["num_docs"]),
        "n_shards": len(manifest.get("segments", [])),
        "build_sec": round(build_sec, 3),
        "single_engine_p95_ms": single_p95,
        "sharded_p95_ms": sharded_p95,
        "rank_mismatches_first10": mismatch,
    }


def _warm_workers(cpus: int) -> None:
    """Spawn + warm one Ray worker process per CPU before the timed run —
    each imports the package so first-wave tasks don't pay worker spawn +
    import (~2 s).  A real cluster's workers are warm; the scaling ratio
    should measure steady-state throughput, not process cold-start."""
    import ray.data as rd

    def _warm(batch):
        import stocksight_ray.pipelines.ingest  # noqa: F401
        import stocksight_ray.index.build  # noqa: F401
        return batch

    # exactly one import-weight task per CPU slot, twice over: the first
    # wave's concurrency makes Ray spawn the full worker set
    rd.range(cpus * 2, override_num_blocks=cpus * 2).map_batches(
        _warm, batch_size=None
    ).materialize()


def main_scaling() -> None:
    # Pre-generate the corpus once (its own Ray session) so children only
    # measure the pipeline, then reuse the shared interleaved-pairs runner
    # (median-of-pairs headline; see run_scaling_pairs).
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    ensure_corpus(N_PAGES_SCALING)
    ray.shutdown()

    try:
        s = run_scaling_pairs(max_pairs=2)
    except Exception as ex:
        print(json.dumps({"error": str(ex)[:2000]}))
        sys.exit(1)

    best = {
        c: max(s["raw_runs"][str(c)], key=lambda r: r["docs_per_sec"])
        for c in (8, 32)
    }
    out = {
        "metric": "scaling efficiency N=8 -> 4N=32 cpus (webtext ingest+index)",
        "value": s["efficiency_8_to_32"],
        "unit": "efficiency",
        "queries": {
            **{k: s[k] for k in (
                "docs_per_sec_8cpu", "docs_per_sec_32cpu",
                "pair_efficiencies", "best_pair_efficiency",
                "index_docs_per_sec_8cpu", "index_docs_per_sec_32cpu",
                "index_efficiency_8_to_32", "index_best_pair_efficiency",
                "index_pair_efficiencies",
            )},
            "total_sec_8cpu": best[8]["total_sec"],
            "total_sec_32cpu": best[32]["total_sec"],
        },
        "sf": SF,
        "num_cpus": [8, 32],
        "n_pages": N_PAGES_SCALING,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--scaling-child":
        print(json.dumps(scaling_child(int(sys.argv[2]))))
    elif len(sys.argv) > 1 and sys.argv[1] == "--sharded-query-child":
        print(json.dumps(sharded_query_child()))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        main_scaling()
    else:
        main_bench()
