"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k is the correctness baseline: the query matrix is
broadcast ONCE via ``ray.put`` and every ``map_batches`` task computes a
numpy matmul against its batch, emitting only its local top-k — the
reduce side then merges k×num_blocks candidate rows (tiny).  This is the
standard scalable pattern: no shuffle of the corpus, O(k·blocks) driver
traffic.

The scale path is an IVF-style variant: a deterministic k-means-lite
(seeded, fixed iterations) builds ``nlist`` centroids from a sample; the
corpus is bucketed by nearest centroid (hash-shuffle once, reusable), and
queries probe only ``nprobe`` nearest buckets.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    """Arrow list<float> column → (n, dim) float64 matrix, Arrow-native.

    Hot path of every per-batch matmul here (brute_force_topk,
    ivf_partition, kmeans_fit): flatten the list child buffer and reshape —
    one vectorized astype, never a Python object per float.  Fixed-size
    lists reshape directly; variable lists are verified rectangular via the
    offsets buffer first.  Non-rectangular / null-bearing input falls back
    to the slow to_pylist path (correctness over speed off the hot path)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        return np.asarray(col, dtype=np.float64)
    t = col.type
    try:
        if pa.types.is_fixed_size_list(t) and col.null_count == 0:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(col), t.list_size).astype(
                np.float64, copy=False
            )
        if (pa.types.is_list(t) or pa.types.is_large_list(t)) \
                and col.null_count == 0:
            widths = np.diff(col.offsets.to_numpy())
            if widths.size and (widths == widths[0]).all():
                flat = col.flatten().to_numpy(zero_copy_only=False)
                return flat.reshape(len(col), int(widths[0])).astype(
                    np.float64, copy=False
                )
    except Exception:  # pragma: no cover - defensive, falls through
        pass
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact cosine top-k for each query row → table
    (query_idx:int64, rank:int64, id, score:float64), ties by id asc.

    The query matrix is broadcast via ray.put once; each task reads it
    zero-copy from the object store (never re-shipped per batch).
    """
    import ray

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn_ref = ray.put(_normalize(q))

    def local_topk(batch: pa.Table) -> pa.Table:
        qn = ray.get(qn_ref)  # object-store read, zero-copy numpy
        m = _normalize(_as_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = qn @ m.T  # (nq, nb)
        nq, nb = sims.shape
        kk = min(k, nb)
        out_q, out_id, out_s = [], [], []
        for qi in range(nq):
            # select ALL candidates >= the kth-largest score (keeps score
            # ties intact — argpartition alone would drop an arbitrary
            # subset of tied ids at the k boundary, breaking the
            # (score desc, id asc) contract), then order deterministically
            row = sims[qi]
            thresh = np.partition(row, nb - kk)[nb - kk]
            cand = np.flatnonzero(row >= thresh)
            order = np.lexsort((ids[cand], -row[cand]))[:kk]
            sel = cand[order]
            out_q.extend([qi] * kk)
            out_id.extend(ids[sel].tolist())
            out_s.extend(row[sel].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )

    cands = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    # final merge: k×blocks candidate rows — tiny, driver-side by design
    rows = []
    for qi, g in cands.groupby("query_idx"):
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="stable").head(k)
        for rank, (_, r) in enumerate(g.iterrows()):
            rows.append((int(qi), rank, int(r[id_col]), float(r["score"])))
    rows.sort()
    return pa.table(
        {
            "query_idx": pa.array([r[0] for r in rows], pa.int64()),
            "rank": pa.array([r[1] for r in rows], pa.int64()),
            id_col: pa.array([r[2] for r in rows], pa.int64()),
            "score": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the 100-TB path
# ---------------------------------------------------------------------------

def train_centroids(ds, nlist: int = 16, vec_col: str = "embedding",
                    sample_n: int = 4096, iters: int = 10, seed: int = 5,
                    id_col: str = "vec_id") -> np.ndarray:
    """Deterministic k-means-lite on a corpus sample (seeded init, fixed
    iteration count, no empty-cluster randomness — empties re-seeded from the
    farthest points, deterministically).

    The sample is a deterministic HASH sample over ``id_col`` (crc32 mod),
    not first-N: on a sorted or clustered corpus ``limit(n)`` would see one
    region only and bias every centroid into it."""
    from .sampling import hash_sample

    n = ds.count()
    den = max(1, n // sample_n)
    # NO limit() after the filter: limit takes the first rows in dataset
    # order, which depends on block boundaries (and thus session
    # parallelism) — the hash-filtered SET (~sample_n rows in expectation)
    # is deterministic regardless of partitioning.  Sort by id so the
    # kmeans input order is fixed too.
    sample = (
        hash_sample(ds.select_columns([id_col, vec_col]), id_col, 1, den)
        .to_pandas()
        .sort_values(id_col)
    )
    x = _normalize(np.asarray(list(sample[vec_col]), dtype=np.float64))
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(cent.shape[0]):
            mask = assign == c
            if mask.any():
                v = x[mask].mean(axis=0)
                n = np.linalg.norm(v)
                cent[c] = v / n if n else cent[c]
            else:
                far = sims.max(axis=1).argmin()
                cent[c] = x[far]
    return cent


def ivf_partition(ds, centroids: np.ndarray, vec_col: str = "embedding"):
    """Stamp each row with its nearest-centroid bucket (one pass; the bucket
    column is then a reusable partitioning key — at scale, write partitioned
    parquet by ``bucket`` once and route queries to bucket files)."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def stamp(batch: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        m = _normalize(_as_matrix(batch[vec_col]))
        assign = (m @ cent.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("bucket", pa.array(assign))

    return ds.map_batches(stamp, batch_format="pyarrow")


def ivf_write(ds_bucketed, path: str) -> None:
    """Persist the bucketed corpus partitioned BY BUCKET (one directory per
    centroid) — the on-disk layout that makes ``ivf_topk_from_disk`` prune
    unprobed buckets at the READ (directory level), which is the actual
    scale win of IVF."""
    ds_bucketed.write_parquet(path, partition_cols=["bucket"])


def ivf_topk_from_disk(
    path: str,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate top-k reading ONLY the probed buckets' files."""
    import ray.data as rd

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn = _normalize(q)
    cent = np.asarray(centroids, dtype=np.float64)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    buckets = sorted({int(b) for row in probe for b in row})
    import glob
    import os

    files = []
    for b in buckets:
        files.extend(sorted(glob.glob(os.path.join(path, f"bucket={b}", "*.parquet"))))
    sub = rd.read_parquet(files, columns=[id_col, vec_col])
    return brute_force_topk(sub, q, k=k, vec_col=vec_col, id_col=id_col)


def ivf_topk(
    ds_bucketed,
    centroids: np.ndarray,
    queries: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate top-k: scan only rows whose bucket is among each query's
    ``nprobe`` nearest centroids.  Single filtered brute-force pass over the
    union of probed buckets (the filter prunes at the read when the corpus is
    stored partitioned-by-bucket)."""
    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    qn = _normalize(q)
    cent = np.asarray(centroids, dtype=np.float64)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probed_buckets = sorted({int(b) for row in probe for b in row})
    sub = ds_bucketed.filter(expr=f"bucket in {probed_buckets}")
    # Scans the UNION of all queries' probed buckets — a superset of
    # per-query IVF probing, so recall is ≥ standard IVF at the cost of a
    # modestly larger scan when queries disagree on buckets.  At scale the
    # corpus is stored partitioned-by-bucket, so this filter prunes at the
    # read (file-level) rather than post-scan.
    return brute_force_topk(sub, q, k=k, vec_col=vec_col, id_col=id_col)


def ann_recall(exact: pa.Table, approx: pa.Table,
               id_col: str = "vec_id") -> float:
    """recall@k of an approximate top-k table vs the exact brute-force
    one (both in the (query_idx, rank, id, score) layout produced by
    ``brute_force_topk`` / ``ivf_topk``): mean over queries of
    |approx ∩ exact| / |exact|.  The standard IVF quality dial — sweep
    ``nprobe`` until recall clears the target, then freeze it."""
    import pandas as pd

    e = exact.to_pandas() if not isinstance(exact, pd.DataFrame) else exact
    a = approx.to_pandas() if not isinstance(approx, pd.DataFrame) else approx
    recalls = []
    for qi, ge in e.groupby("query_idx"):
        want = set(ge[id_col])
        got = set(a[a["query_idx"] == qi][id_col])
        recalls.append(len(want & got) / len(want) if want else 1.0)
    return float(np.mean(recalls)) if recalls else 1.0


def kmeans_fit(ds, k: int = 16, vec_col: str = "embedding",
               id_col: str = "vec_id", *, iters: int = 5, seed: int = 5,
               init: Optional[np.ndarray] = None) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) over the FULL corpus.

    ``train_centroids`` fits on a driver-side hash sample — right for IVF
    bootstrap, but the centroids only see ~sample_n rows.  This refines
    over every row while keeping the driver state O(k x dim):

    * centroids broadcast once per iteration via ``ray.put``;
    * ONE ``map_batches`` pass per iteration emits per-block PARTIAL sums
      (k x dim float64 + k counts — a few KiB per block, the map-side
      combine pattern used everywhere in this repo before a reduce);
    * the driver folds O(num_blocks) partial rows — never a corpus
      collect, never a shuffle;
    * empty clusters re-seed deterministically from the first block's
      first rows (stable across partitionings because re-seed uses the
      globally smallest ``id_col`` rows, fetched via a tiny sorted take).

    Cosine/spherical geometry (inputs and centroids L2-normalized) to
    match ``ivf_partition``/``ivf_topk``.  Deterministic: seeded init from
    ``train_centroids`` when ``init`` is None, fixed iteration count, and
    float64 partial sums folded in block order (block order is made
    irrelevant by summing per cluster — float addition is reordered
    between runs only across BLOCK boundaries, so partials are sorted by
    block id before folding)."""
    import ray

    cent = (
        np.asarray(init, dtype=np.float64)
        if init is not None
        else train_centroids(ds, nlist=k, vec_col=vec_col, seed=seed,
                             id_col=id_col)
    )
    proj = ds.select_columns([id_col, vec_col]).materialize()

    for _ in range(iters):
        cref = ray.put(cent)
        kk, dim = cent.shape

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            m = _normalize(_as_matrix(batch[vec_col]))
            assign = (m @ c.T).argmax(axis=1)
            sums = np.zeros((kk, dim), dtype=np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            # one row per cluster, tagged by the block's smallest id so the
            # driver fold is order-stable
            bid = int(batch[id_col][0].as_py()) if batch.num_rows else -1
            return pa.table({
                "cluster": pa.array(np.arange(kk, dtype=np.int32)),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "cnt": pa.array(counts),
                "bid": pa.array(np.full(kk, bid, dtype=np.int64)),
            })

        pdf = (
            proj.map_batches(partials, batch_format="pyarrow")
            .to_pandas()
            .sort_values(["bid", "cluster"], kind="stable")
        )
        sums = np.zeros((kk, dim), dtype=np.float64)
        counts = np.zeros(kk, dtype=np.int64)
        for cl, vs, cn in zip(pdf["cluster"], pdf["vsum"], pdf["cnt"]):
            sums[cl] += np.asarray(vs, dtype=np.float64)
            counts[cl] += cn
        new = cent.copy()
        nonempty = counts > 0
        v = sums[nonempty] / counts[nonempty, None]
        norms = np.linalg.norm(v, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        new[nonempty] = v / norms
        if (~nonempty).any():
            # deterministic re-seed: the globally smallest-id rows
            reseed = (
                proj.sort(id_col).limit(int((~nonempty).sum())).to_pandas()
            )
            rv = _normalize(
                np.asarray(list(reseed[vec_col]), dtype=np.float64)
            )
            new[~nonempty] = rv[: int((~nonempty).sum())]
        cent = new
    return cent


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id"):
    """(id_col, cluster) assignment Dataset — nearest centroid by cosine,
    one broadcast map pass (``ivf_partition`` with a slim projection)."""
    out = ivf_partition(
        ds.select_columns([id_col, vec_col]), centroids, vec_col=vec_col
    )

    def slim(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "cluster": batch["bucket"].cast(pa.int32()),
        })

    return out.map_batches(slim, batch_format="pyarrow")
