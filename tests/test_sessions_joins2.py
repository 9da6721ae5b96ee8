"""Sessionization, semi/anti join, and JSON-field extraction units
(driver-side SQL oracles cover these too: q45/q46/q47)."""

from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_sessionize_splits_on_gap(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.sessions import sessionize

    base = datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap of 2h between event 2 and 3)
        (1, base, 1),
        (1, base + timedelta(minutes=10), 2),
        (1, base + timedelta(hours=2, minutes=10), 3),
        # user 2: one session, exactly-30min gap does NOT split (> only)
        (2, base, 4),
        (2, base + timedelta(minutes=30), 5),
    ]
    t = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], pa.int64()),
    })
    out = (
        sessionize(rd.from_arrow(t).repartition(2), gap_sec=1800)
        .to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    assert out[out["user_id"] == 1]["session_id"].tolist() == [1, 2]
    assert out[out["user_id"] == 1]["n_events"].tolist() == [2, 1]
    u2 = out[out["user_id"] == 2]
    assert u2["session_id"].tolist() == [1] and u2["n_events"].tolist() == [2]
    s1 = out[(out["user_id"] == 1) & (out["session_id"] == 1)].iloc[0]
    assert s1["session_start"] == pd.Timestamp(base)
    assert s1["session_end"] == pd.Timestamp(base + timedelta(minutes=10))


def test_semi_and_anti_join(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.joins import semi_join

    left = pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "v": pa.array(["a", "b", "c", "d", "e"], pa.string()),
    })
    right = pa.table({"k": pa.array([2, 2, 4, 9], pa.int64())})
    semi = (
        semi_join(rd.from_arrow(left).repartition(2), rd.from_arrow(right),
                  on="k", left_cols=["k", "v"])
        .to_pandas().sort_values("k")
    )
    assert semi["k"].tolist() == [2, 4]
    assert list(semi.dtypes.astype(str)) == ["int64", "object"]
    anti = (
        semi_join(rd.from_arrow(left), rd.from_arrow(right),
                  on="k", left_cols=["k", "v"], anti=True)
        .to_pandas().sort_values("k")
    )
    assert anti["k"].tolist() == [1, 3, 5]


def test_semi_anti_join_null_keys(ray_session):
    """SQL EXISTS / NOT EXISTS semantics for null join keys: a null key never
    matches, so semi DROPS null-key left rows and anti KEEPS them — even when
    the right side also contains nulls."""
    import ray.data as rd

    from stocksight_ray.pipelines.joins import semi_join

    left = pa.table({
        "k": pa.array([1, None, 3, None], pa.int64()),
        "v": pa.array(["a", "b", "c", "d"], pa.string()),
    })
    right = pa.table({"k": pa.array([1, None], pa.int64())})
    semi = (
        semi_join(rd.from_arrow(left), rd.from_arrow(right),
                  on="k", left_cols=["k", "v"])
        .to_pandas().sort_values("v")
    )
    assert semi["v"].tolist() == ["a"]
    anti = (
        semi_join(rd.from_arrow(left), rd.from_arrow(right),
                  on="k", left_cols=["k", "v"], anti=True)
        .to_pandas().sort_values("v")
    )
    assert anti["v"].tolist() == ["b", "c", "d"]


def test_json_int_field_robust():
    from stocksight_ray.functions.jsonx import json_int_field

    t = pa.table({
        "props": pa.array(
            ['{"k": 7}', '{"k": "x"}', 'not json', None, '{"other": 1}',
             '{"k": 2.0}'],
            pa.string()),
    })
    out = json_int_field(t, "props", "k", "k")
    assert out["k"].to_pylist() == [7, None, None, None, None, 2]
    assert out["k"].type == pa.int64()


def test_decontaminate_flags_overlap(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.decontam import decontaminate

    bench_sentence = "the quick brown fox jumps over the lazy dog tonight"
    corpus = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "completely unrelated words about markets and trading today",
            "prefix words then " + bench_sentence + " and a suffix",
            "another clean document with nothing shared at all here",
        ], pa.string()),
    })
    bench = pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array([bench_sentence], pa.string()),
    })
    out = (
        decontaminate(rd.from_arrow(corpus), rd.from_arrow(bench), ngram=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [False, True, False]
    assert out.loc[1, "n_hits"] == 3  # 10-word overlap -> three 8-grams


def test_mix_sources_rates(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.sampling import mix_sources

    t = pa.table({
        "doc_id": pa.array(range(200), pa.int64()),
        "source": pa.array(["a" if i % 2 == 0 else "b" for i in range(200)], pa.string()),
    })
    out = mix_sources(
        rd.from_arrow(t).repartition(3), {"a": 100, "b": 10}
    ).to_pandas()
    a = out[out["source"] == "a"]
    b = out[out["source"] == "b"]
    assert len(a) == 100  # rate 100 keeps everything
    assert set(b["doc_id"] % 100 < 10) == {True}
    # deterministic: same call again gives identical rows
    out2 = mix_sources(rd.from_arrow(t), {"a": 100, "b": 10}).to_pandas()
    assert sorted(out["doc_id"]) == sorted(out2["doc_id"])


def test_resize_images_stage(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.multimodal import (
        fake_decode_image, resize_images, synth_binary_table,
    )

    t = synth_binary_table(20)
    out = (
        resize_images(rd.from_arrow(t), out_w=4, out_h=4, concurrency=2)
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert len(out) == 20
    assert all(len(p) == 4 * 4 * 3 for p in out["pixels"])
    # deterministic: block-mean of the stub-decoded 8x8x3 image
    img = fake_decode_image(t["payload"][0].as_py())
    exp = img.reshape(4, 2, 4, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert list(out.loc[0, "pixels"]) == exp.reshape(-1).tolist()


def test_dedup_ids_shuffle_path_and_dup_rows(ray_session):
    """Force the co-partitioned stamp path (broadcast_threshold=0) and
    check byte-identical duplicate rows collapse to ONE output row on both
    paths (the broadcast path must auto-detect them and reroute)."""
    from datetime import datetime

    import ray.data as rd

    from stocksight_ray.pipelines.ingest import dedup_and_assign_ids

    base = datetime(2023, 5, 1)
    rows = [
        ("https://a/", base, "text a"),
        ("https://a/", base, "text a"),       # byte-identical copy
        ("https://b/", base, "text b"),
        ("https://b/", datetime(2023, 5, 2), "text b newer"),
        ("https://c/", base, "text c"),
    ]
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })
    for nb in (1, 3):
        for thresh in (0, 10**6):  # forced-shuffle and broadcast-eligible
            out = (
                dedup_and_assign_ids(
                    rd.from_arrow(t).repartition(nb),
                    broadcast_threshold=thresh,
                )
                .to_pandas().sort_values("doc_id").reset_index(drop=True)
            )
            assert list(out["url"]) == ["https://a/", "https://b/", "https://c/"], (nb, thresh)
            assert list(out["doc_id"]) == [0, 1, 2], (nb, thresh)
            assert out.loc[1, "text"] == "text b newer", (nb, thresh)


# ---------------------------------------------------------------------------
# property tests (pure kernels, no Ray)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_scores = st.floats(min_value=-1, max_value=1, allow_nan=False)
_labels = st.sampled_from(["positive", "negative", "neutral"])


@settings(max_examples=200, deadline=None)
@given(
    pol=_scores, sub=st.floats(min_value=0, max_value=1, allow_nan=False),
    sen=_labels,
    links=st.lists(st.tuples(_scores, _scores, _labels), max_size=6),
)
def test_fold_link_scores_matches_reference_transcription(pol, sub, sen, links):
    """Property: fold_link_scores == a literal transcription of the
    reference loop (/root/reference/sentiment.py:201-222)."""
    from stocksight_ray.pipelines.linkfold import fold_link_scores

    # verbatim reference semantics
    r_pol, r_sub, r_sen = pol, sub, sen
    urls_pol = 0
    urls_sub = 0
    for lp, ls, lsen in links:
        urls_pol = (urls_pol + lp) / 2
        urls_sub = (urls_sub + ls) / 2
        if r_sen == "positive" or lsen == "positive":
            r_sen = "positive"
        elif r_sen == "negative" or lsen == "negative":
            r_sen = "negative"
        else:
            r_sen = "neutral"
    if links:
        if urls_pol > 0:
            r_pol = (r_pol + urls_pol) / 2
        if urls_sub > 0:
            r_sub = (r_sub + urls_sub) / 2

    got = fold_link_scores(pol, sub, sen, links)
    assert got == (r_pol, r_sub, r_sen)


@settings(max_examples=50, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=8
    )
)
def test_repetition_stats_property(texts):
    """Property: repetition stats equal a direct per-doc computation."""
    from stocksight_ray.functions.textstats import repetition_stats_batch

    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    out = repetition_stats_batch(t).to_pandas()
    for i, txt in enumerate(texts):
        # DuckDB string_split('', ' ') == [''] — the kernel matches that
        # (one empty token for the empty doc), so the model must too.
        words = txt.split(" ")
        assert out.loc[i, "n_words"] == len(words)
        assert out.loc[i, "n_distinct_words"] == len(set(words))
        from collections import Counter

        assert out.loc[i, "top_word_frac"] == Counter(words).most_common(1)[0][1] / len(words)
        assert out.loc[i, "max_word_len"] == max(len(w) for w in words)
        if len(words) > 1:
            bi = Counter(
                words[j] + " " + words[j + 1] for j in range(len(words) - 1)
            )
            assert out.loc[i, "top_bigram_frac"] == bi.most_common(1)[0][1] / (len(words) - 1)


def test_repetition_stats_empty_doc():
    """Empty text follows DuckDB string_split semantics: one empty token →
    n_words=1, distinct_ratio=1, max_word_len=0 (ADVICE r2)."""
    from stocksight_ray.functions.textstats import repetition_stats_batch

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([""], pa.string())})
    row = repetition_stats_batch(t).to_pandas().iloc[0]
    assert row["n_words"] == 1
    assert row["n_distinct_words"] == 1
    assert row["distinct_ratio"] == 1.0
    assert row["top_word_frac"] == 1.0
    assert row["top_bigram_frac"] == 0.0
    assert row["max_word_len"] == 0


def test_joins_hot_key_skew(ray_session):
    """Correctness under pathological key skew: one key owns half the rows.
    (Perf contract: the hot key lands in one bucket task; salt upstream if
    a single key's rows exceed task memory — documented in joins.py.)"""
    import ray.data as rd

    from stocksight_ray.pipelines.joins import hash_join, rolling_mean

    n = 20_000
    keys = np.where(np.arange(n) % 2 == 0, 7, np.arange(n) % 997).astype(np.int64)
    left = pa.table({
        "k": pa.array(keys),
        "v": pa.array(np.arange(n, dtype=np.float64)),
    })
    right = pa.table({
        "k": pa.array(np.arange(997, dtype=np.int64)),
        "w": pa.array(np.arange(997, dtype=np.float64) * 2),
    })
    got = (
        hash_join(rd.from_arrow(left).repartition(8), rd.from_arrow(right),
                  on="k", left_cols=["k", "v"], right_cols=["k", "w"])
        .to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    )
    exp = (
        left.to_pandas().merge(right.to_pandas(), on="k")
        .sort_values(["k", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "v", "w"]], exp[["k", "v", "w"]])

    rm = rolling_mean(
        rd.from_arrow(pa.table({
            "k": pa.array(keys),
            "ts": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(np.ones(n, dtype=np.float64)),
        })).repartition(8),
        key="k", order_cols=["ts"], value="v", window=3, id_cols=["ts"],
    ).to_pandas()
    assert len(rm) == n
    assert (rm["rmean"] == 1.0).all()


def test_write_docs_resumable(ray_session, tmp_path):
    import os

    import ray.data as rd

    from stocksight_ray.pipelines.ingest import write_docs_resumable

    docs = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(100)], pa.string()),
    })
    out = str(tmp_path / "out")
    s1 = write_docs_resumable(rd.from_arrow(docs), out, shard_docs=32)
    assert s1["shards_written"] == [0, 1, 2, 3]
    root = os.path.join(out, "docs_shards")

    # simulate a crash: lose shard 2's marker and data
    os.remove(os.path.join(root, "_SUCCESS.2"))
    import shutil

    shutil.rmtree(os.path.join(root, "shard=2"))

    s2 = write_docs_resumable(rd.from_arrow(docs), out, shard_docs=32)
    assert s2["shards_written"] == [2]
    assert s2["shards_skipped"] == [0, 1, 3]

    got = rd.read_parquet(root).to_pandas()
    assert sorted(got["doc_id"]) == list(range(100))


def test_hopping_window_counts(ray_session):
    from datetime import datetime, timedelta

    import ray.data as rd

    from stocksight_ray.pipelines.sessions import hopping_window_counts

    base = datetime(2024, 1, 1, 0, 59, 0)  # lands in windows 0:00 and 0:30
    t = pa.table({
        "ts": pa.array([base, base + timedelta(minutes=2)], pa.timestamp("us")),
        "event_type": pa.array(["a", "a"], pa.string()),
    })
    out = (
        hopping_window_counts(
            rd.from_arrow(t), width_sec=3600, slide_sec=1800, by="event_type"
        )
        .to_pandas().sort_values("window_start").reset_index(drop=True)
    )
    epoch = int(datetime(2024, 1, 1).timestamp())
    # 0:59 event: windows starting 0:00 and 0:30; 1:01 event: 0:30 and 1:00
    assert out["window_start"].tolist() == [epoch, epoch + 1800, epoch + 3600]
    assert out["cnt"].tolist() == [1, 2, 1]
