"""Shuffle-geometry sizing (geometry.py, VERDICT r2 #5/#6): the sizing rule
itself, and — the load-bearing property — that results are IDENTICAL under
different bucket counts / shard-group sizes, so auto-derivation can never
change answers, only shuffle shape."""

import pandas as pd
import pyarrow as pa
import pytest

from stocksight_ray.geometry import auto_buckets, auto_shard_group, cluster_cpus


def test_auto_buckets_floor_and_pow2():
    # floor respected and every result is a power of two
    b = auto_buckets()
    assert b >= 256 and (b & (b - 1)) == 0
    assert auto_buckets(floor=64) >= 64


def test_auto_buckets_scales_with_size():
    small = auto_buckets(1 << 20)           # 1 MiB — floor wins
    big = auto_buckets(1 << 40)             # 1 TiB — size wins
    assert small == auto_buckets()
    assert big >= (1 << 40) // (128 << 20)  # >= size / target_bucket_bytes
    assert big > small
    # cap: absurd sizes don't explode the task count
    assert auto_buckets(1 << 60) == auto_buckets(1 << 61)


def test_auto_shard_group_bounds():
    g = auto_shard_group()
    assert 1 <= g <= 16
    assert auto_shard_group(cap=4) <= 4
    assert cluster_cpus() >= 1


def test_string_bucket_kernel_speedup():
    """VERDICT r2 #3 done-criterion: the vectorized string bucketizer must
    beat the round-2 per-row ``zlib.crc32(str(k))`` loop by >= 5x.  Uses
    best-of-3 per kernel so background load can't flip the assertion."""
    import time
    import zlib

    import numpy as np

    from stocksight_ray.pipelines.joins import _string_bucket

    n = 200_000
    keys = pa.array([f"https://example-{i % 9973}.com/path/{i}" for i in range(n)])

    def timed(fn, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_vec = timed(lambda: _string_bucket(keys, 256))
    t_row = timed(
        lambda: np.fromiter(
            (zlib.crc32(str(k).encode()) % 256 for k in keys.to_pylist()),
            np.int32, n,
        ),
        reps=1,  # the slow loop needs no best-of
    )
    assert t_row / t_vec >= 5, f"vectorized only {t_row / t_vec:.1f}x faster"
    # and the kernel is deterministic across calls
    assert _string_bucket(keys, 256).equals(_string_bucket(keys, 256))


def _corpus():
    texts = (
        ["alpha beta gamma delta epsilon zeta %d" % (i % 7) for i in range(60)]
        + ["alpha beta gamma delta epsilon zeta 0"] * 5  # exact dups of i%7==0
    )
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_exact_dedup_bucket_invariant(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.dedup import exact_dedup

    ds = rd.from_arrow(_corpus())
    a = exact_dedup(ds, num_buckets=16).to_pandas().sort_values("doc_id")
    b = exact_dedup(ds, num_buckets=512).to_pandas().sort_values("doc_id")
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert len(a) == 7  # one keeper per distinct text


def test_minhash_dedup_bucket_invariant(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.dedup import minhash_lsh_dedup

    ds = rd.from_arrow(_corpus())
    res = {}
    for nb in (16, 512):
        d = minhash_lsh_dedup(ds, threshold=0.6, num_buckets=nb).to_pandas()
        res[nb] = d.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(res[16], res[512])


def test_dedup_assign_ids_bucket_invariant(ray_session, webtext_table):
    import ray.data as rd

    from stocksight_ray.pipelines.ingest import dedup_and_assign_ids

    tbl = webtext_table.select(["url", "warc_ts", "html"])
    ds = rd.from_arrow(tbl)
    out = {}
    for nb in (16, 512):
        # broadcast_threshold=0 forces the co-partitioned stamp, the only
        # path where the bucket count shapes the shuffle
        d = dedup_and_assign_ids(
            ds, broadcast_threshold=0, num_buckets=nb, schema=tbl.schema,
        ).to_pandas()
        out[nb] = d.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[16], out[512])


def test_join_family_bucket_invariant(ray_session):
    """VERDICT r3 #4: the join family now derives its bucket count from
    geometry.auto_buckets (floor 256) and coalesces the padded union before
    the groupby shuffle.  Results must be identical under forced bucket
    counts — bucket values only steer grouping."""
    import numpy as np
    import ray.data as rd

    from stocksight_ray.pipelines.joins import (
        asof_join, hash_join, rolling_mean, semi_join,
    )

    rng = np.random.default_rng(11)
    left = pa.table({
        "k": pa.array([f"u{i % 9}" for i in range(120)]),
        "lts": pa.array(
            rng.integers(0, 10**6, 120), pa.int64()
        ).cast(pa.timestamp("us")),
        "lv": pa.array(rng.integers(0, 100, 120), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([f"u{i % 7}" for i in range(60)]),
        "rts": pa.array(
            np.sort(rng.integers(0, 10**6, 60)), pa.int64()
        ).cast(pa.timestamp("us")),
        "price": pa.array(rng.random(60), pa.float64()),
    })
    outs = {}
    for nb in (16, 512):
        a = asof_join(
            rd.from_arrow(left), rd.from_arrow(right),
            by="k", left_ts="lts", right_ts="rts", right_value="price",
            num_buckets=nb,
        ).to_pandas().sort_values(["k", "lv", "price"]).reset_index(drop=True)
        h = hash_join(
            rd.from_arrow(left), rd.from_arrow(right.select(["k", "price"])),
            on="k", left_cols=["k", "lv"], right_cols=["k", "price"],
            num_buckets=nb,
        ).to_pandas().sort_values(["k", "lv", "price"]).reset_index(drop=True)
        s = semi_join(
            rd.from_arrow(left), rd.from_arrow(right.select(["k"])),
            on="k", left_cols=["k", "lv"], anti=True, num_buckets=nb,
        ).to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
        r = rolling_mean(
            rd.from_arrow(left), key="k", order_cols=["lts"], value="lv",
            window=3, id_cols=["k", "lts", "lv"], num_buckets=nb,
        ).to_pandas().sort_values(["k", "lts"]).reset_index(drop=True)
        outs[nb] = (a, h, s, r)
    for x, y in zip(outs[16], outs[512]):
        pd.testing.assert_frame_equal(x, y)


def test_grouped_shard_build_matches_ungrouped(ray_session, webtext_table, tmp_path):
    """build_resumable with shard_group k>1 must produce byte-equivalent
    query results and identical doc/term counts vs per-shard builds."""
    import json
    import os

    import ray.data as rd

    from stocksight_ray.index.query import QueryEngine
    from stocksight_ray.index.segments import build_resumable
    from stocksight_ray.pipelines.ingest import ingest_webtext

    docs = (
        ingest_webtext(
            rd.from_arrow(webtext_table), enrich_concurrency=2, batch_size=128
        )
        .drop_columns(["tokens"])
        .materialize()
    )
    solo = str(tmp_path / "solo")
    grouped = str(tmp_path / "grouped")
    m1 = build_resumable(
        docs, solo, text_col="text_clean",
        num_partitions=8, salt_range=128, shard_docs=128, batch_size=128,
        shard_group=1,
    )
    m2 = build_resumable(
        docs, grouped, text_col="text_clean",
        num_partitions=8, salt_range=128, shard_docs=128, batch_size=128,
        shard_group=3,
    )
    assert m1["num_docs"] == m2["num_docs"] > 0
    assert m1["avgdl"] == pytest.approx(m2["avgdl"])
    assert len(m1["segments"]) == len(m2["segments"]) >= 3
    for s1, s2 in zip(m1["segments"], m2["segments"]):
        assert (s1["n_docs"], s1["total_terms"]) == (s2["n_docs"], s2["total_terms"])
    e1, e2 = QueryEngine(solo), QueryEngine(grouped)
    for q in ("stock market earnings", "investor fears", "quarterly report"):
        assert e1.search(q, k=10) == e2.search(q, k=10)
    # per-shard markers + lineage exist in the grouped layout too
    for i in range(len(m2["segments"])):
        seg = os.path.join(grouped, "segments", f"shard-{i:05d}")
        assert os.path.exists(os.path.join(seg, "_SUCCESS"))
        lin = json.load(open(os.path.join(seg, "lineage.json")))
        assert lin["group_shards"]  # built via the grouped pass


def test_grouped_build_resume_skips_committed(ray_session, webtext_table, tmp_path):
    """Kill/resume with grouping: a partial grouped run commits whole
    groups; resume skips them and the final index matches a fresh build."""
    import ray.data as rd

    from stocksight_ray.index.query import QueryEngine
    from stocksight_ray.index.segments import build_resumable
    from stocksight_ray.pipelines.ingest import ingest_webtext

    docs = (
        ingest_webtext(
            rd.from_arrow(webtext_table), enrich_concurrency=2, batch_size=128
        )
        .drop_columns(["tokens"])
        .materialize()
    )
    out = str(tmp_path / "resume")
    fresh = str(tmp_path / "fresh")
    partial = build_resumable(
        docs, out, text_col="text_clean",
        num_partitions=8, salt_range=128, shard_docs=128, batch_size=128,
        shard_group=2, max_shards=2,
    )
    assert partial.get("partial") is True
    m = build_resumable(
        docs, out, text_col="text_clean",
        num_partitions=8, salt_range=128, shard_docs=128, batch_size=128,
        shard_group=2,
    )
    build_resumable(
        docs, fresh, text_col="text_clean",
        num_partitions=8, salt_range=128, shard_docs=128, batch_size=128,
        shard_group=2,
    )
    assert m["num_docs"] > 0
    e1, e2 = QueryEngine(out), QueryEngine(fresh)
    for q in ("stock market earnings", "buy sell hold"):
        assert e1.search(q, k=10) == e2.search(q, k=10)
