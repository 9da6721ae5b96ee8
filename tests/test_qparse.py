"""Query-string parser (index/qparse.py): AST shape, and execution
equivalence against the dedicated search/search_and/search_phrase/
search_filtered primitives on a small index."""

import os

import pyarrow as pa
import pytest

from stocksight_ray.index.qparse import (
    And, Filter, Not, Or, Phrase, Term, parse,
)


# ---------------------------------------------------------------------------
# parser unit tests (pure — no Ray, no index)
# ---------------------------------------------------------------------------

def test_parse_bare_terms_default_or():
    assert parse("a b c") == Or((Term("a"), Term("b"), Term("c")))
    assert parse("a OR b") == Or((Term("a"), Term("b")))


def test_parse_and_binds_tighter_than_or():
    assert parse("a AND b OR c") == Or((And((Term("a"), Term("b"))), Term("c")))
    assert parse("a OR b AND c") == Or((Term("a"), And((Term("b"), Term("c")))))


def test_parse_parens_override():
    assert parse("a AND (b OR c)") == And((Term("a"), Or((Term("b"), Term("c")))))


def test_parse_not_and_minus():
    assert parse("a AND NOT b") == And((Term("a"), Not(Term("b"))))
    assert parse("a AND -b") == And((Term("a"), Not(Term("b"))))
    # structural validity is checked at parse time (data-independent):
    # a top-level / double negation has no positive clause to stand on
    with pytest.raises(ValueError):
        parse("NOT NOT a")
    with pytest.raises(ValueError):
        parse("a AND NOT (NOT b NOT c)")


def test_parse_phrase_and_field():
    assert parse('"stock market"') == Phrase("stock market")
    assert parse("lang:en") == Filter("lang", "==", "en")
    assert parse('kind:"news item"') == Filter("kind", "==", "news item")
    assert parse("n_chars:>=500") == Filter("n_chars", ">=", 500)
    assert parse("score:<0.5") == Filter("score", "<", 0.5)
    assert parse('sentiment:negative AND "stock market"') == And(
        (Filter("sentiment", "==", "negative"), Phrase("stock market"))
    )


def test_parse_errors():
    for bad in ("", "AND", "a AND", "(a", "a)", "lang:"):
        with pytest.raises(ValueError):
            parse(bad)


# ---------------------------------------------------------------------------
# execution equivalence on a small index
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def qs_index(ray_session, tmp_path_factory):
    import pyarrow.parquet as pq
    import ray.data as rd

    from stocksight_ray.index.build import build_index

    rows = [
        ("the stock market rises on strong earnings reports today", "tweet", 10),
        ("market conditions weaken as investors fear recession", "news", 20),
        ("strong earnings lift the stock price to record highs", "tweet", 30),
        ("earnings reports disappoint while the market falls", "news", 40),
        ("stock earnings market market stock earnings repeated words", "tweet", 50),
        ("completely unrelated cooking recipe with pasta and sauce", "news", 60),
        ("the market rises the market rises the market rises", "tweet", 70),
        ("strong stock with rising earnings and growing market share", "news", 80),
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[0] for r in rows], pa.string()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = str(tmp_path_factory.mktemp("qs_index"))
    docs_path = os.path.join(out, "docs.parquet")
    pq.write_table(docs, docs_path)
    build_index(
        rd.from_arrow(docs), out, text_col="text",
        num_partitions=4, batch_size=4,
        extra_manifest={"docs_path": docs_path, "docs_text_col": "text"},
    )
    return out, rows


def _engine(out):
    from stocksight_ray.index.query import QueryEngine

    return QueryEngine(out)


def test_qs_or_equals_search(ray_session, qs_index):
    out, _ = qs_index
    eng = _engine(out)
    got = eng.search_query("stock earnings market", k=10)
    exp = eng.search("stock earnings market", k=10, method="exhaustive")
    assert got == exp  # float-identical, same tie order


def test_qs_and_equals_search_and(ray_session, qs_index):
    out, _ = qs_index
    eng = _engine(out)
    got = eng.search_query("stock AND earnings", k=10)
    exp = eng.search_and("stock earnings", k=10)
    assert got == exp
    assert eng.search_query("stock AND zzznotfound", k=5) == []


def test_qs_phrase_equals_search_phrase(ray_session, qs_index):
    out, _ = qs_index
    eng = _engine(out)
    got = eng.search_query('"strong earnings"', k=10)
    exp = eng.search_phrase("strong earnings", k=10)
    assert got == exp
    assert got  # fixture contains the phrase


def test_qs_filter_equals_search_filtered(ray_session, qs_index):
    out, _ = qs_index
    eng = _engine(out)
    got = eng.search_query("kind:tweet AND market", k=10)
    exp = eng.search_filtered("market", k=10, filters=[("kind", "==", "tweet")])
    assert got == exp
    # range filter
    got = eng.search_query("n:>=50 AND market", k=10)
    exp = eng.search_filtered("market", k=10, filters=[("n", ">=", 50)])
    assert got == exp


def test_qs_not_excludes(ray_session, qs_index):
    out, rows = qs_index
    eng = _engine(out)
    got = eng.search_query("market AND NOT stock", k=10)
    market_ids = {d for d, _ in eng.search("market", k=100, method="exhaustive")}
    stock_ids = {d for d, _ in eng.search("stock", k=100, method="exhaustive")}
    assert {d for d, _ in got} == market_ids - stock_ids
    # scores are the market-clause scores, untouched by the exclusion
    m_scores = dict(eng.search("market", k=100, method="exhaustive"))
    for d, s in got:
        assert s == pytest.approx(m_scores[d], rel=1e-12)


def test_qs_pure_filter_scores_zero(ray_session, qs_index):
    out, rows = qs_index
    eng = _engine(out)
    got = eng.search_query("kind:news", k=10)
    exp_ids = [i for i, r in enumerate(rows) if r[1] == "news"]
    assert got == [(i, 0.0) for i in exp_ids]


def test_qs_grouping_or_inside_and(ray_session, qs_index):
    out, _ = qs_index
    eng = _engine(out)
    got = eng.search_query("(recipe OR recession) AND kind:news", k=10)
    ids = {d for d, _ in got}
    exp = {d for d, _ in eng.search_filtered(
        "recipe recession", k=10, filters=[("kind", "==", "news")]
    )}
    assert ids == exp


def test_qs_pure_negative_raises(ray_session, qs_index):
    out, _ = qs_index
    eng = _engine(out)
    with pytest.raises(ValueError):
        eng.search_query("NOT stock", k=5)
    with pytest.raises(ValueError):
        eng.search_query("NOT a NOT b", k=5)


def test_qs_default_or_negation(ray_session, qs_index):
    """'market -recipe' (the standard Kibana negation) = should:[market],
    must_not:[recipe] — same result set as 'market AND NOT recipe' when
    there's a single positive."""
    out, _ = qs_index
    eng = _engine(out)
    got = eng.search_query("market -recipe", k=20)
    exp = eng.search_query("market AND NOT recipe", k=20)
    assert got == exp
    assert got
    assert eng.search_query("market NOT recipe", k=20) == exp


def test_qs_stopword_clause_drops(ray_session, qs_index):
    """A clause that analyzes to zero tokens (stopword) is removed from
    the boolean query, not evaluated as the empty set — search_and parity
    (its analyzer drops the stopword identically)."""
    out, _ = qs_index
    eng = _engine(out)
    assert eng.search_query("the AND market", k=10) == \
        eng.search_and("the market", k=10)
    assert eng.search_query("the market", k=10) == \
        eng.search(" market", k=10, method="exhaustive")
    # all clauses analyzed away → no hits, no error
    assert eng.search_query("the AND a", k=10) == []
    # analyzed-away negative excludes nothing
    assert eng.search_query("market AND NOT the", k=10) == \
        eng.search(" market", k=10, method="exhaustive")


def test_qs_field_value_wildcard_rejected():
    with pytest.raises(ValueError):
        parse("kind:a*")


def test_parse_prefix():
    from stocksight_ray.index.qparse import Prefix

    assert parse("mark*") == Prefix("mark")
    assert parse("MARK* AND stock") == And((Prefix("mark"), Term("stock")))
    for bad in ("*", "m*k", "**", "ma*k*"):
        with pytest.raises(ValueError):
            parse(bad)


def test_qs_prefix_equals_manual_expansion(ray_session, qs_index):
    out, _ = qs_index
    eng = _engine(out)
    exp_terms = eng.expand_prefix("re")
    assert exp_terms  # recession/recipe/record/report... stems
    assert all(t.startswith("re") for t in exp_terms)
    got = eng.search_query("re*", k=20)
    exp = eng.search(" ".join(exp_terms), k=20, method="exhaustive")
    assert got == exp
    # no-match prefix is empty, not an error
    assert eng.search_query("zzz*", k=5) == []
    # limit caps deterministically at the lexicographic head
    assert eng.expand_prefix("re", limit=1) == exp_terms[:1]


def test_matching_docs_scoped_aggs(ray_session, qs_index):
    """Kibana dashboard query context: panel aggs recompute over the
    search-bar match set."""
    import pandas as pd

    from stocksight_ray.pipelines.aggs import metric_aggs, terms_topk

    out, rows = qs_index
    eng = _engine(out)
    q = "market AND NOT recipe"
    match_ids = sorted(
        d for d, _ in eng.search_query(q, k=1 << 30)
    )
    ds = eng.matching_docs(q, columns=["doc_id", "kind", "n"])
    got_rows = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got_rows["doc_id"].tolist() == match_ids
    # the caller's projection is honored exactly (doc_id used internally
    # for the match filter is dropped when not requested)
    assert eng.matching_docs(q, columns=["kind"]).schema().names == ["kind"]

    # terms agg over the query scope == pandas oracle on the match set
    got = terms_topk(eng.matching_docs(q, columns=["kind"]), "kind", k=5)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    oracle = (
        pd.DataFrame({"kind": [rows[i][1] for i in match_ids]})
        .value_counts("kind").reset_index(name="cnt")
        .sort_values(["cnt", "kind"], ascending=[False, True])
        .reset_index(drop=True)
    )
    got = got.sort_values(["cnt", "kind"], ascending=[False, True]).reset_index(drop=True)
    assert got["kind"].tolist() == oracle["kind"].tolist()
    assert got["cnt"].tolist() == oracle["cnt"].tolist()

    # metric agg over the scope
    m = metric_aggs(eng.matching_docs(q, columns=["n"]), "n")
    exp_vals = [rows[i][2] for i in match_ids]
    assert int(m["cnt"].iloc[0]) == len(exp_vals)
    assert float(m["avg_n"].iloc[0]) == pytest.approx(
        sum(exp_vals) / len(exp_vals)
    )


def test_qs_sharded_equals_global(ray_session, tmp_path):
    """ShardedQueryService.search_query must equal QueryEngine.search_query
    exactly — per-shard evaluation with global stats restricted to disjoint
    id ranges, merged."""
    import json

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from stocksight_ray.index.query import QueryEngine
    from stocksight_ray.index.segments import build_resumable
    from stocksight_ray.index.serve import ShardedQueryService

    rng = np.random.RandomState(11)
    words = ["stock", "market", "earnings", "strong", "weak", "recipe",
             "pasta", "rises", "falls", "investor", "report", "record"]
    n = 500
    texts = [" ".join(rng.choice(words, size=rng.randint(5, 14)))
             for _ in range(n)]
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "kind": pa.array([("tweet" if i % 3 else "news") for i in range(n)],
                         pa.string()),
        "n": pa.array([i * 10 for i in range(n)], pa.int64()),
    })
    out = str(tmp_path / "shq")
    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, docs_path)
    build_resumable(
        rd.from_arrow(docs), out, text_col="text",
        num_partitions=4, salt_range=128, shard_docs=128, batch_size=64,
    )
    # docs_path is serving config the assembly step doesn't know about
    mpath = f"{out}/manifest.json"
    with open(mpath) as f:
        m = json.load(f)
    m.update({"docs_path": docs_path, "docs_text_col": "text"})
    with open(mpath, "w") as f:
        json.dump(m, f)

    eng = QueryEngine(out)
    svc = ShardedQueryService(out)
    try:
        for qs in [
            "stock market earnings",
            "stock AND market AND strong",
            '"strong earnings"',
            "kind:tweet AND market",
            "market AND NOT recipe",
            "(recipe OR pasta) AND kind:news",
            "n:>=2500 AND investor",
            "kind:news",
            "re* AND stock",
            "inve*",
            "market -recipe",
            "the AND market",
        ]:
            assert svc.search_query(qs, k=10) == eng.search_query(qs, k=10), qs
    finally:
        svc.shutdown()
