"""Regenerate the golden-parquet oracles under tests/golden/.

For deterministic, non-SQL-expressible per-row kernels (simhash, rolling
fingerprint, n-gram language id) the driver's DuckDB oracle cannot compute
the value — instead the oracle SELECTs a committed golden parquet produced
by THIS script over the sf0.01 tables.  The check then pins cross-round
determinism and the exact value profile; any kernel change must re-run this
script deliberately (the diff shows up in git).

    python scripts/make_goldens.py   # writes tests/golden/*_sf001.parquet
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden"
)

# Every query here was verified session-independent by
# scripts/check_determinism.py (identical content hash in fresh 4-cpu and
# 16-cpu sessions) before being pinned.  q39 qualified once its sketch
# switched to event_id-range chunks (block-boundary-independent).
GOLDEN_QUERIES = [
    "q20_simhash", "q21_fingerprint", "q22_lang_id",
    "q18_bm25", "q19_minhash_dedup", "q23_sentiment", "q24_ivf_knn",
    "q25_image_features", "q26_webtext_ingest", "q27_news_headlines",
    "q28_sentiment_dashboard", "q31_url_extract", "q32_prices_pipeline",
    "q37_bm25_modes", "q40_hll_distinct", "q41_pack_sequences",
    "q44_link_score_fold", "q52_scrub_pii", "q39_quantile_sketch",
    "q56_delete_compact_search", "q57_query_string",
]


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as entry

    os.makedirs(OUT_DIR, exist_ok=True)
    qs = entry.queries()
    for name in GOLDEN_QUERIES:
        res = qs[name](SF_DIR)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        df = df.sort_values(sorted(df.columns)).reset_index(drop=True)
        path = os.path.join(OUT_DIR, f"{name}_sf001.parquet")
        df.to_parquet(path, index=False)
        print(f"{name}: {len(df)} rows -> {path}")
    ray.shutdown()


if __name__ == "__main__":
    main()
