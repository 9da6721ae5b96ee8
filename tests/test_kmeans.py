"""Distributed spherical k-means (kmeans_fit / kmeans_assign)."""

import numpy as np
import pyarrow as pa

from stocksight_ray.pipelines.similarity import (
    _normalize,
    kmeans_assign,
    kmeans_fit,
    train_centroids,
)

SF = "/root/testdata/sf0.001/embeddings.parquet"


def test_kmeans_fit_matches_single_process_lloyd(ray_session):
    """The distributed map-side partial-sum iteration must reproduce plain
    Lloyd's over the collected corpus (same init, same update rule)."""
    import ray.data as rd

    ds = rd.read_parquet(SF)
    cent = kmeans_fit(ds, k=8, iters=5)

    pdf = ds.to_pandas().sort_values("vec_id")
    x = _normalize(np.asarray(list(pdf["embedding"]), dtype=np.float64))
    c = train_centroids(ds, nlist=8)
    for _ in range(5):
        assign = (x @ c.T).argmax(axis=1)
        new = c.copy()
        for ci in range(8):
            m = assign == ci
            if m.any():
                v = x[m].mean(axis=0)
                n = np.linalg.norm(v)
                new[ci] = v / n if n else c[ci]
        c = new
    assert np.allclose(cent, c, atol=1e-9)


def test_kmeans_assign_is_nearest_centroid(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(SF)
    cent = kmeans_fit(ds, k=8, iters=3)
    asg = kmeans_assign(ds, cent).to_pandas().sort_values("vec_id")
    pdf = ds.to_pandas().sort_values("vec_id")
    x = _normalize(np.asarray(list(pdf["embedding"]), dtype=np.float64))
    ref = (x @ cent.T).argmax(axis=1)
    assert (asg["cluster"].to_numpy() == ref).all()
    assert list(asg.columns) == ["vec_id", "cluster"]


def test_kmeans_fit_deterministic(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(SF)
    a = kmeans_fit(ds, k=6, iters=4)
    b = kmeans_fit(ds, k=6, iters=4)
    assert np.array_equal(a, b)


def test_kmeans_empty_cluster_reseed(ray_session):
    """k > distinct vectors forces empty clusters every iteration; the
    deterministic reseed must keep centroids finite and unit-norm."""
    import ray.data as rd

    tbl = pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([[1.0, 0.0, 0.0]] * 6, pa.list_(pa.float32())),
    })
    cent = kmeans_fit(rd.from_arrow(tbl), k=3, iters=2)
    assert cent.shape == (3, 3)
    assert np.isfinite(cent).all()
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0)
