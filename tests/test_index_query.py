"""End-to-end index build + BM25 top-k: rank-identity vs the naive oracle,
WAND ≡ exhaustive, partition-count invariance (SURVEY.md §5.2, §5.6)."""

import math

import pytest

import ray.data as rd

from stocksight_ray.functions.analyzer import english_analyzer
from stocksight_ray.index.build import build_index
from stocksight_ray.index.query import QueryEngine
from stocksight_ray.pipelines.ingest import ingest_webtext

from .oracle import naive_bm25_topk

QUERIES = [
    "market stocks",
    "falling profits",
    "terrible losses fears",
    "connection",          # stemming-sensitive: matches connected/connecting
    "the and of",          # stopword-only → empty after analysis
    "xyzzyunseenterm",     # unseen term → no hits
    "stock",               # head term (high df)
    "earnings report analysts strong",
    "zq0x0 zq1x7",         # synthetic tail terms
    "Investor's growth",   # possessive + stem
]


@pytest.fixture(scope="module")
def built(ray_session, webtext_table, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx"))
    ds = ingest_webtext(rd.from_arrow(webtext_table), enrich_concurrency=2, batch_size=128)
    admitted = ds.filter(expr="admitted")
    docs = admitted.select_columns(["doc_id", "text_clean"])
    manifest = build_index(
        docs,
        out,
        text_col="text_clean",
        analyzer="english",
        num_partitions=8,
        tokenize_concurrency=2,
        batch_size=128,
    )
    # oracle corpus: same docs, same analyzer
    rows = admitted.select_columns(["doc_id", "text_clean"]).take_all()
    doc_tokens = {r["doc_id"]: english_analyzer(r["text_clean"]) for r in rows}
    return out, manifest, doc_tokens


def test_manifest_stats(built):
    out, manifest, doc_tokens = built
    assert manifest["num_docs"] == len(doc_tokens)
    total = sum(len(v) for v in doc_tokens.values())
    assert manifest["total_terms"] == total
    assert math.isclose(manifest["avgdl"], total / len(doc_tokens))


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identical_vs_oracle(built, query):
    out, _, doc_tokens = built
    eng = QueryEngine(out)
    want = naive_bm25_topk(doc_tokens, english_analyzer(query), k=10)
    got = eng.search(query, k=10, method="exhaustive")
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (d1, s1), (d2, s2) in zip(got, want):
        assert math.isclose(s1, s2, rel_tol=1e-6), (query, d1, s1, s2)


@pytest.mark.parametrize("query", QUERIES)
def test_wand_equals_exhaustive(built, query):
    out, _, _ = built
    eng = QueryEngine(out)
    ex = eng.search(query, k=10, method="exhaustive")
    wd = eng.search(query, k=10, method="wand")
    assert [d for d, _ in wd] == [d for d, _ in ex], query
    for (d1, s1), (d2, s2) in zip(wd, ex):
        assert math.isclose(s1, s2, rel_tol=1e-9), (query, d1)


def test_partition_count_invariance(ray_session, webtext_table, tmp_path):
    """Same corpus indexed under different block/partition structure must
    produce identical results (shuffle-invariance)."""
    ds = ingest_webtext(
        rd.from_arrow(webtext_table).repartition(7),
        enrich_concurrency=2,
        batch_size=64,
    )
    docs = ds.filter(expr="admitted").select_columns(["doc_id", "text_clean"])
    out2 = str(tmp_path / "idx2")
    build_index(
        docs,
        out2,
        text_col="text_clean",
        num_partitions=3,
        tokenize_concurrency=2,
        batch_size=97,
        salt_range=64,  # force many salt buckets → exercises run concat
    )
    eng2 = QueryEngine(out2)

    # reference engine from the module fixture is built with different
    # partitioning; rebuild here quickly for self-containment
    for query in QUERIES[:6]:
        ex = eng2.search(query, k=10, method="exhaustive")
        wd = eng2.search(query, k=10, method="wand")
        assert [d for d, _ in wd] == [d for d, _ in ex]


def test_doc_ids_deterministic_across_partitioning(ray_session, webtext_table):
    a = ingest_webtext(rd.from_arrow(webtext_table), enrich_concurrency=2, batch_size=128)
    b = ingest_webtext(
        rd.from_arrow(webtext_table).repartition(13), enrich_concurrency=2, batch_size=31
    )
    ta = sorted((r["url"], r["doc_id"]) for r in a.select_columns(["url", "doc_id"]).take_all())
    tb = sorted((r["url"], r["doc_id"]) for r in b.select_columns(["url", "doc_id"]).take_all())
    assert ta == tb


def test_extreme_head_term_skew(ray_session, tmp_path):
    """One term in EVERY doc + tiny salt_range: the head term's postings
    split across many salt buckets (no single merge task sees them all) and
    the salted merge must still produce docID-sorted, rank-identical
    results at different partition counts."""
    import pyarrow as pa
    import ray.data as rd

    from stocksight_ray.index.build import build_index
    from stocksight_ray.index.query import QueryEngine

    n = 1000
    texts = [
        f"ubiquitous term plus unique{i} filler words number {i}" for i in range(n)
    ]
    docs = pa.table(
        {"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts, pa.string())}
    )
    outs = []
    for parts, salt in ((2, 64), (8, 128)):
        out = str(tmp_path / f"skew_{parts}_{salt}")
        build_index(
            rd.from_arrow(docs).repartition(4), out, text_col="text",
            num_partitions=parts, salt_range=salt, batch_size=128,
        )
        outs.append(out)
    e1, e2 = QueryEngine(outs[0]), QueryEngine(outs[1])
    # df of the ubiquitous term must be N in both
    p1, p2 = e1.lookup("ubiquit"), e2.lookup("ubiquit")
    assert p1 is not None and p1.df == n and p2.df == n
    # salted merge produced >= n/salt_range blocks' worth of runs, sorted
    import numpy as np

    ids1, _ = p1.full()
    assert np.array_equal(ids1, np.arange(n))
    for q in ["ubiquitous term", "unique42 filler", "term number"]:
        assert e1.search(q, 10) == e2.search(q, 10)
