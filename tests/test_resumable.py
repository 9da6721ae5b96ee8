"""Resumable segment build: equivalence with the single-pass builder,
kill/resume behavior, lineage records (SURVEY.md §5.5)."""

import json
import os
import shutil

import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session, webtext_table):
    import ray.data as rd

    from stocksight_ray.pipelines.ingest import ingest_webtext

    ds = ingest_webtext(rd.from_arrow(webtext_table), enrich_concurrency=2, batch_size=128)
    return ds.drop_columns(["tokens"]).materialize()


QUERIES = [
    "stock market earnings", "investor fears", "quarterly report",
    "running traditional", "buy sell hold", "technology energy",
]


def _results(index_dir):
    from stocksight_ray.index.query import QueryEngine

    eng = QueryEngine(index_dir)
    return {q: eng.search(q, k=10) for q in QUERIES}


def test_sharded_build_matches_single_pass(ray_session, docs_ds, tmp_path):
    from stocksight_ray.index.build import build_index
    from stocksight_ray.index.segments import build_resumable

    single = str(tmp_path / "single")
    sharded = str(tmp_path / "sharded")
    build_index(
        docs_ds, single, text_col="text_clean",
        num_partitions=8, salt_range=256, batch_size=128,
    )
    manifest = build_resumable(
        docs_ds, sharded, text_col="text_clean",
        num_partitions=8, salt_range=256, shard_docs=256, batch_size=128,
    )
    assert manifest["num_docs"] > 0
    with open(os.path.join(single, "manifest.json")) as f:
        m1 = json.load(f)
    assert manifest["num_docs"] == m1["num_docs"]
    assert manifest["avgdl"] == pytest.approx(m1["avgdl"])
    assert len(manifest["segments"]) >= 2  # corpus spans multiple shards
    assert _results(single) == _results(sharded)


def test_kill_resume(ray_session, docs_ds, tmp_path):
    from stocksight_ray.index.segments import build_resumable

    out = str(tmp_path / "resume")
    fresh = str(tmp_path / "fresh")

    partial = build_resumable(
        docs_ds, out, text_col="text_clean",
        num_partitions=8, salt_range=256, shard_docs=256, batch_size=128,
        max_shards=1,
    )
    assert partial.get("partial") is True
    # shard 0 committed, later shards absent — the "crash" point
    assert os.path.exists(os.path.join(out, "segments", "shard-00000", "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "manifest.json"))
    lineage0 = json.load(
        open(os.path.join(out, "segments", "shard-00000", "lineage.json"))
    )

    # resume: shard 0 must be SKIPPED (lineage identical object), rest built
    manifest = build_resumable(
        docs_ds, out, text_col="text_clean",
        num_partitions=8, salt_range=256, shard_docs=256, batch_size=128,
    )
    assert manifest["segments"][0] == lineage0  # untouched checkpoint
    assert all("docs_per_sec" in s and "wall_sec" in s for s in manifest["segments"])

    build_resumable(
        docs_ds, fresh, text_col="text_clean",
        num_partitions=8, salt_range=256, shard_docs=256, batch_size=128,
    )
    assert _results(out) == _results(fresh)


def test_resume_idempotent(ray_session, docs_ds, tmp_path):
    """Running the build twice changes nothing (dedup/property test)."""
    from stocksight_ray.index.segments import build_resumable

    out = str(tmp_path / "idem")
    m1 = build_resumable(
        docs_ds, out, text_col="text_clean",
        num_partitions=4, salt_range=256, shard_docs=256, batch_size=128,
    )
    r1 = _results(out)
    m2 = build_resumable(
        docs_ds, out, text_col="text_clean",
        num_partitions=4, salt_range=256, shard_docs=256, batch_size=128,
    )
    assert m2["segments"] == m1["segments"]
    assert _results(out) == r1


def test_incremental_append(ray_session, tmp_path):
    """W1 incremental ingest: new docs with doc_ids beyond the current max
    arrive as new shards; re-running build_resumable folds them in without
    touching committed shards, and the result equals a fresh full build."""
    import ray.data as rd
    import pyarrow as pa

    from stocksight_ray.index.segments import build_resumable

    def mk_docs(lo, hi, seed_word):
        texts = [
            f"{seed_word} market stock document number {i} with earnings data"
            for i in range(lo, hi)
        ]
        return pa.table({
            "doc_id": pa.array(range(lo, hi), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    batch1 = mk_docs(0, 300, "alpha")
    batch2 = mk_docs(300, 500, "beta")
    out = str(tmp_path / "incr")
    fresh = str(tmp_path / "freshfull")

    m1 = build_resumable(
        rd.from_arrow(batch1), out, text_col="text",
        num_partitions=4, salt_range=128, shard_docs=128, batch_size=64,
    )
    n_shards_1 = len(m1["segments"])
    lineage1 = m1["segments"]

    both = pa.concat_tables([batch1, batch2])
    m2 = build_resumable(
        rd.from_arrow(both), out, text_col="text",
        num_partitions=4, salt_range=128, shard_docs=128, batch_size=64,
    )
    assert len(m2["segments"]) > n_shards_1
    # committed shards untouched (identical lineage records)
    assert m2["segments"][:n_shards_1 - 1] == lineage1[:n_shards_1 - 1]
    assert m2["num_docs"] == 500

    build_resumable(
        rd.from_arrow(both), fresh, text_col="text",
        num_partitions=4, salt_range=128, shard_docs=128, batch_size=64,
    )
    assert _results(out) == _results(fresh)


def test_stale_shard_detected_on_renumbering(ray_session, tmp_path):
    """Same per-shard COUNTS but shifted (doc_id -> text) assignment — the
    content fingerprint must force a rebuild (count-only checks would keep
    the stale segment and silently corrupt queries)."""
    import pyarrow as pa
    import ray.data as rd

    from stocksight_ray.index.segments import build_resumable

    def mk(texts):
        return pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })

    base = [f"market doc number {i} earnings data" for i in range(256)]
    out = str(tmp_path / "stale")
    build_resumable(rd.from_arrow(mk(base)), out, text_col="text",
                    num_partitions=4, salt_range=128, shard_docs=128, batch_size=64)

    # renumber: insert a new doc at the front — every id keeps shard counts
    # (2 full shards of 128) but the (id -> text) mapping shifts
    shifted = ["zzz brand new first doc"] + base[:-1]
    m = build_resumable(rd.from_arrow(mk(shifted)), out, text_col="text",
                        num_partitions=4, salt_range=128, shard_docs=128, batch_size=64)
    fresh = str(tmp_path / "stale_fresh")
    build_resumable(rd.from_arrow(mk(shifted)), fresh, text_col="text",
                    num_partitions=4, salt_range=128, shard_docs=128, batch_size=64)
    assert _results(out) == _results(fresh)


def test_sub_salt_sharding(ray_session, docs_ds, tmp_path):
    """shard_docs smaller than salt_range (a salt bucket split across
    shards): runs still concatenate in docid order and results match the
    single-pass build."""
    from stocksight_ray.index.build import build_index
    from stocksight_ray.index.segments import build_resumable

    single = str(tmp_path / "subsalt_single")
    sharded = str(tmp_path / "subsalt_sharded")
    build_index(docs_ds, single, text_col="text_clean",
                num_partitions=4, salt_range=512, batch_size=128)
    build_resumable(docs_ds, sharded, text_col="text_clean",
                    num_partitions=4, salt_range=512, shard_docs=128, batch_size=128)
    assert _results(single) == _results(sharded)
