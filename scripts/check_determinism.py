"""Session-independence check for rows-only queries.

Runs each candidate query in a FRESH Ray session at the given num_cpus and
prints a content hash (rows and columns sorted first).  Two invocations at
different parallelism levels must agree before a query may get a
golden-parquet oracle — block boundaries change with session size, so any
block-dependent computation shows up here.

    python scripts/check_determinism.py <num_cpus> [query ...]
"""

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"

CANDIDATES = [
    "q18_bm25", "q19_minhash_dedup", "q23_sentiment", "q24_ivf_knn",
    "q25_image_features", "q26_webtext_ingest", "q27_news_headlines",
    "q28_sentiment_dashboard", "q31_url_extract", "q32_prices_pipeline",
    "q37_bm25_modes", "q40_hll_distinct", "q41_pack_sequences",
    "q44_link_score_fold", "q52_scrub_pii", "q39_quantile_sketch",
    "q56_delete_compact_search", "q57_query_string",
]


def df_hash(df) -> str:
    df = df.to_pandas() if hasattr(df, "to_pandas") else df
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols).reset_index(drop=True)
    return hashlib.sha1(
        df.to_csv(index=False, float_format="%.12g").encode()
    ).hexdigest()[:16]


def main() -> None:
    import ray

    cpus = int(sys.argv[1])
    names = sys.argv[2:] or CANDIDATES
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    import __ray_entry__ as entry

    qs = entry.queries()
    for name in names:
        try:
            print(f"HASH {name} {df_hash(qs[name](SF))}", flush=True)
        except Exception as ex:
            print(f"HASH {name} ERROR:{ex!r}"[:120], flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
