"""Upsert / reindex-by-id (index/upsert.py): upsert over the committed
index must be equivalent to a fresh build over the updated corpus (the
same proof shape as test_deletes' compact-equivalence), touching only the
shards whose ranges hold updated ids, and reviving tombstoned ids."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

QUERIES = [
    "alpha beta", "gamma delta", "replaced text", "brand new document",
    "epsilon zeta", "shared corpus words",
]


def _mk_docs(n=600, seed=3):
    rng = np.random.RandomState(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "shared",
             "corpus", "words", "table", "scan", "merge", "sort", "window"]
    texts = [
        " ".join(rng.choice(words, size=rng.randint(6, 18)))
        for _ in range(n)
    ]
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _results(index_dir):
    from stocksight_ray.index.query import QueryEngine

    eng = QueryEngine(index_dir)
    return {q: eng.search(q, k=10) for q in QUERIES}


@pytest.fixture(scope="module")
def base_docs():
    return _mk_docs()


def _overlay(docs: pa.Table, updates: pa.Table) -> pa.Table:
    upd = {i: t for i, t in zip(updates["doc_id"].to_pylist(),
                                updates["text"].to_pylist())}
    ids = [i for i in docs["doc_id"].to_pylist() if i not in upd]
    texts = [t for i, t in zip(docs["doc_id"].to_pylist(),
                               docs["text"].to_pylist()) if i not in upd]
    ids += sorted(upd)
    texts += [upd[i] for i in sorted(upd)]
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def test_upsert_equals_fresh_build_sharded(ray_session, base_docs, tmp_path):
    import ray.data as rd

    from stocksight_ray.index.segments import build_resumable
    from stocksight_ray.index.upsert import upsert_docs

    out = str(tmp_path / "ups")
    fresh = str(tmp_path / "fresh")
    build_resumable(
        rd.from_arrow(base_docs), out, text_col="text",
        num_partitions=4, salt_range=128, shard_docs=128, batch_size=64,
    )

    updates = pa.table({
        "doc_id": pa.array([5, 130, 131, 700, 701], pa.int64()),  # 700/701 new
        "text": pa.array([
            "replaced text for doc five",
            "replaced text alpha beta",
            "replaced text gamma",
            "brand new document one",
            "brand new document two",
        ], pa.string()),
    })

    # snapshot an untouched shard's lineage — shard 3 holds ids [384, 512)
    untouched_lineage = os.path.join(
        out, "segments", "shard-00003", "lineage.json"
    )
    with open(untouched_lineage) as f:
        before = f.read()

    merged = _overlay(base_docs, updates)
    manifest = upsert_docs(
        out, updates, rd.from_arrow(base_docs), batch_size=64
    )
    build_resumable(
        rd.from_arrow(merged), fresh, text_col="text",
        num_partitions=4, salt_range=128, shard_docs=128, batch_size=64,
    )

    assert manifest["num_docs"] == merged.num_rows
    assert _results(out) == _results(fresh)

    # the untouched shard was REUSED, not rebuilt (identical lineage bytes)
    with open(untouched_lineage) as f:
        assert f.read() == before
    # the touched shards (0: id 5, 1: ids 130/131, 5: ids 700/701) rebuilt
    with open(os.path.join(out, "segments", "shard-00000", "lineage.json")) as f:
        assert json.load(f)["n_docs"] == 128


def test_upsert_revives_tombstoned_doc(ray_session, base_docs, tmp_path):
    import ray.data as rd

    from stocksight_ray.index.deletes import delete_docs, load_deletes
    from stocksight_ray.index.query import QueryEngine
    from stocksight_ray.index.segments import build_resumable
    from stocksight_ray.index.upsert import upsert_docs

    out = str(tmp_path / "rev")
    build_resumable(
        rd.from_arrow(base_docs), out, text_col="text",
        num_partitions=4, salt_range=128, shard_docs=128, batch_size=64,
    )
    delete_docs(out, [7, 8, 200])
    assert load_deletes(out).tolist() == [7, 8, 200]

    updates = pa.table({
        "doc_id": pa.array([8], pa.int64()),
        "text": pa.array(["replaced text revived doc"], pa.string()),
    })
    upsert_docs(out, updates, rd.from_arrow(base_docs), batch_size=64)

    # 8 is revived; 7 and 200 stay tombstoned (even though 7's shard was
    # rebuilt and physically resurrected it, serving masks it)
    assert load_deletes(out).tolist() == [7, 200]
    eng = QueryEngine(out)
    hits = {d for d, _ in eng.search("replaced text revived", k=10)}
    assert 8 in hits
    for q in QUERIES:
        for d, _ in eng.search(q, k=1 << 30):
            assert d not in (7, 200)


def test_upsert_single_pass_layout(ray_session, base_docs, tmp_path):
    import ray.data as rd

    from stocksight_ray.index.build import build_index
    from stocksight_ray.index.upsert import upsert_docs

    out = str(tmp_path / "sp")
    fresh = str(tmp_path / "sp_fresh")
    docs_path = str(tmp_path / "docs.parquet")
    import pyarrow.parquet as pq

    pq.write_table(base_docs, docs_path)
    build_index(
        rd.from_arrow(base_docs), out, text_col="text",
        num_partitions=4, salt_range=128, batch_size=64,
        extra_manifest={"docs_path": docs_path, "docs_text_col": "text"},
    )
    updates = pa.table({
        "doc_id": pa.array([0, 999], pa.int64()),
        "text": pa.array(["replaced text zero", "brand new nine nine nine"],
                         pa.string()),
    })
    merged = _overlay(base_docs, updates)
    manifest = upsert_docs(out, updates, rd.from_arrow(base_docs), batch_size=64)
    build_index(
        rd.from_arrow(merged), fresh, text_col="text",
        num_partitions=4, salt_range=128, batch_size=64,
    )
    assert manifest["num_docs"] == merged.num_rows
    assert _results(out) == _results(fresh)
    # serving config preserved across the rebuild
    assert manifest["docs_path"] == docs_path


def test_upsert_rejects_duplicate_update_ids(ray_session, base_docs, tmp_path):
    import ray.data as rd

    from stocksight_ray.index.segments import build_resumable
    from stocksight_ray.index.upsert import upsert_docs

    out = str(tmp_path / "dup")
    build_resumable(
        rd.from_arrow(base_docs), out, text_col="text",
        num_partitions=4, salt_range=128, shard_docs=128, batch_size=64,
    )
    updates = pa.table({
        "doc_id": pa.array([1, 1], pa.int64()),
        "text": pa.array(["a", "b"], pa.string()),
    })
    with pytest.raises(ValueError):
        upsert_docs(out, updates, rd.from_arrow(base_docs))
