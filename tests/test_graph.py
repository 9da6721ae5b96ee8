"""connected_components / dup_clusters / cross_dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from stocksight_ray.pipelines.graph import (
    _cc_local,
    connected_components,
    dup_clusters,
)
from stocksight_ray.pipelines.dedup import cross_dedup


def _brute_components(a, b):
    """Reference union-find (pure python, path halving)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a, b):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {n: find(n) for n in parent}


def test_cc_local_hand_graph():
    a = np.array([1, 2, 3, 10, 11, 5, 1], dtype=np.int64)
    b = np.array([2, 3, 4, 11, 12, 5, 2], dtype=np.int64)  # self-loop + dup edge
    nodes, comp = _cc_local(a, b)
    got = dict(zip(nodes.tolist(), comp.tolist()))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 10: 10, 11: 10, 12: 10}


def test_cc_local_matches_union_find_random():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 400, 600).astype(np.int64)
    b = rng.integers(0, 400, 600).astype(np.int64)
    nodes, comp = _cc_local(a, b)
    ref = _brute_components(a, b)
    assert dict(zip(nodes.tolist(), comp.tolist())) == ref


def test_cc_local_empty():
    nodes, comp = _cc_local(
        np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    )
    assert len(nodes) == 0 and len(comp) == 0


def test_distributed_matches_local_long_chain(ray_session):
    """A 60-long path exercises pointer jumping: plain min-propagation
    would need 60 rounds; the jump converges in O(log n) (well under
    max_iters, which raises on non-convergence)."""
    import ray.data as rd

    a = np.array([1, 2, 3, 10, 11, 5, 1], dtype=np.int64)
    b = np.array([2, 3, 4, 11, 12, 5, 2], dtype=np.int64)
    ca = np.arange(60, dtype=np.int64) + 100
    eds = rd.from_arrow(pa.table({
        "a": pa.array(np.concatenate([a, ca])),
        "b": pa.array(np.concatenate([b, ca + 1])),
    }))
    loc = (
        connected_components(eds)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        connected_components(eds, driver_max_edges=0, num_buckets=16)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    assert loc.equals(dist)
    assert loc["component"].nunique() == 4
    chain = loc[loc["node"] >= 100]
    assert (chain["component"] == 100).all()


def test_dup_clusters_transitive_chain(ray_session):
    """A~B and B~C at >= 0.5 Jaccard but A~C below it: the cluster must
    still be {A, B, C} with min-id label (the transitive-closure contract
    a per-pair keeper cannot provide)."""
    import ray.data as rd

    base = [f"w{i}" for i in range(40)]
    doc_a = " ".join(base)
    doc_b = " ".join(base[8:] + [f"x{i}" for i in range(8)])
    doc_c = " ".join(base[16:] + [f"x{i}" for i in range(16)])
    other = " ".join(f"z{i}" for i in range(40))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([3, 7, 11, 20], pa.int64()),
        "text": pa.array([doc_a, doc_b, doc_c, other]),
    }))
    out = (
        dup_clusters(ds, threshold=0.5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [3, 7, 11]
    assert (out["cluster_id"] == 3).all()
    assert (out["cluster_size"] == 3).all()

    # sanity: the A~C direct pair really is sub-threshold (else the test
    # would pass without transitivity)
    from stocksight_ray.pipelines.dedup import jaccard, shingles

    assert jaccard(shingles(doc_a), shingles(doc_c)) < 0.5
    assert jaccard(shingles(doc_a), shingles(doc_b)) >= 0.5
    assert jaccard(shingles(doc_b), shingles(doc_c)) >= 0.5


def test_dup_clusters_matches_brute_force(ray_session):
    """Synthetic corpus with planted near-dups: clusters equal the
    brute-force all-pairs exact-Jaccard graph's components."""
    import ray.data as rd

    from stocksight_ray.pipelines.dedup import jaccard, shingles

    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, 25).tolist()) for _ in range(40)
    ]
    # plant two chains: 40<-0's tail, 41<-40's tail; 42 ~ 10
    texts.append(" ".join(texts[0].split()[5:] + ["a1", "a2", "a3", "a4", "a5"]))
    texts.append(" ".join(texts[40].split()[5:] + ["b1", "b2", "b3", "b4", "b5"]))
    texts.append(texts[10])
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts),
    }))
    out = (
        dup_clusters(ds, threshold=0.5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    sets = [shingles(t) for t in texts]
    ea, eb = [], []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            if jaccard(sets[i], sets[j]) >= 0.5:
                ea.append(i)
                eb.append(j)
    comp = _brute_components(np.array(ea), np.array(eb))
    ref = (
        pd.DataFrame({"doc_id": list(comp), "cluster_id": list(comp.values())})
        .sort_values("doc_id").reset_index(drop=True)
    )
    sizes = ref.groupby("cluster_id")["doc_id"].transform("size")
    ref["cluster_size"] = sizes.astype(np.int64)
    assert out.astype("int64").equals(ref.astype("int64"))


def test_cross_dedup_matches_brute_force(ray_session):
    import ray.data as rd

    from stocksight_ray.pipelines.dedup import jaccard, shingles

    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(30)]
    ref_texts = [" ".join(rng.choice(vocab, 25).tolist()) for _ in range(20)]
    cand_texts = [" ".join(rng.choice(vocab, 25).tolist()) for _ in range(20)]
    cand_texts[4] = ref_texts[2]  # exact cross-dup
    cand_texts[9] = " ".join(ref_texts[7].split()[3:] + ["q1", "q2", "q3"])
    cand = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array(cand_texts),
    }))
    ref = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(100, 120), pa.int64()),
        "text": pa.array(ref_texts),
    }))
    out = (
        cross_dedup(cand, ref, threshold=0.5)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    rsets = [shingles(t) for t in ref_texts]
    expect = [
        not any(jaccard(shingles(c), r) >= 0.5 for r in rsets)
        for c in cand_texts
    ]
    assert out["doc_id"].tolist() == list(range(20))
    assert out["keep"].tolist() == expect
    assert not out.loc[4, "keep"] and not out.loc[9, "keep"]


def test_cc_non_convergence_raises(ray_session):
    import ray.data as rd

    eds = rd.from_arrow(pa.table({
        "a": pa.array(np.arange(20, dtype=np.int64)),
        "b": pa.array(np.arange(20, dtype=np.int64) + 1),
    }))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            eds, driver_max_edges=0, num_buckets=16, max_iters=1
        )
